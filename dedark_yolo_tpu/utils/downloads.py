"""Download / archive helpers (reference ultralytics/utils/downloads.py).

Works with http(s) and file:// URLs through urllib with retries; the GitHub
release-asset path (attempt_download_asset, reference downloads.py:217-258)
degrades gracefully in egress-less environments: a locally present file always
wins, and network failure raises a clear, actionable error instead of hanging.
No curl/requests dependency — stdlib only.
"""

from __future__ import annotations

import contextlib
import json
import shutil
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

from . import LOGGER


def is_url(url, check: bool = False) -> bool:
    """True if the string parses as a URL; check=True also opens it
    (reference downloads.py:33-43)."""
    with contextlib.suppress(Exception):
        url = str(url)
        r = urllib.parse.urlparse(url)
        ok = all([r.scheme, r.netloc or r.scheme == "file"])
        if ok and check:
            with urllib.request.urlopen(url) as resp:
                return resp.getcode() == 200 if hasattr(resp, "getcode") else True
        return ok
    return False


def unzip_file(file, path=None, exclude=(".DS_Store", "__MACOSX"),
               exist_ok: bool = False) -> Path:
    """Unzip *file* into *path* (reference downloads.py:46-89): archives whose
    members do not share a single top-level directory are extracted into a
    directory named after the zip, so datasets always land in one folder."""
    from zipfile import ZipFile, is_zipfile

    file = Path(file)
    if not (file.exists() and is_zipfile(file)):
        raise FileNotFoundError(f"'{file}' does not exist or is not a zipfile")
    path = Path(path or file.parent)
    with ZipFile(file) as z:
        names = [n for n in z.namelist()
                 if all(x not in n for x in exclude)]
        tops = {n.split("/")[0] for n in names}
        if len(tops) > 1 or (len(names) > 1 and not names[0].endswith("/")):
            dest = path / file.stem     # wrap loose members
        else:
            dest = path
        # the directory the caller actually receives: the wrapper dir when
        # members are wrapped, else the archive's single top-level dir — the
        # skip-if-exists check must test THIS path, not path/<topdir>, or
        # wrapped archives never skip and an unrelated path/<topdir> could be
        # returned without extracting (reference derives extract_path from the
        # reassigned path the same way, downloads.py:46-89)
        final = dest if dest != path else path / next(iter(tops))
        if final.exists() and any(final.iterdir()) and not exist_ok:
            LOGGER.info(f"skipping unzip: {final} exists (exist_ok=False)")
            return final
        for n in names:
            z.extract(n, dest)
    return final


def check_disk_space(url_or_bytes=2e9, sf: float = 1.5, hard: bool = True) -> bool:
    """Ensure sf x the payload fits on disk (reference downloads.py:92-121)."""
    need = float(url_or_bytes) if not isinstance(url_or_bytes, str) else 2e9
    if isinstance(url_or_bytes, str):
        with contextlib.suppress(Exception):
            req = urllib.request.Request(url_or_bytes, method="HEAD")
            with urllib.request.urlopen(req, timeout=10) as r:
                need = int(r.headers.get("Content-Length", 0))
    free = shutil.disk_usage(Path.cwd()).free
    if need * sf < free:
        return True
    msg = (f"insufficient disk space: need {need * sf / 1e9:.1f} GB, "
           f"free {free / 1e9:.1f} GB")
    if hard:
        raise MemoryError(msg)
    LOGGER.warning(msg)
    return False


def safe_download(url, file=None, dir=None, unzip: bool = True,
                  delete: bool = False, retry: int = 3,
                  min_bytes: float = 1.0, progress: bool = False) -> Path:
    """Download *url* to *dir/file* with retries, then optionally unzip
    (reference downloads.py:124-206). file:// URLs are copied locally, which
    also makes the full path unit-testable offline."""
    parsed = urllib.parse.urlparse(str(url))
    name = file or Path(urllib.parse.unquote(parsed.path)).name
    f = (Path(dir) if dir else Path.cwd()) / name
    if f.exists() and f.stat().st_size > min_bytes:
        return _post_download(f, unzip, delete)
    f.parent.mkdir(parents=True, exist_ok=True)
    err = None
    for attempt in range(retry + 1):
        try:
            if parsed.scheme == "file":
                shutil.copyfile(urllib.parse.unquote(parsed.path), f)
            else:
                with urllib.request.urlopen(str(url), timeout=30) as r, \
                        open(f, "wb") as out:
                    shutil.copyfileobj(r, out)
            if f.stat().st_size > min_bytes:
                return _post_download(f, unzip, delete)
            f.unlink(missing_ok=True)
            err = RuntimeError(f"downloaded file smaller than {min_bytes} B")
        except Exception as e:   # noqa: BLE001 — every urllib error retries
            f.unlink(missing_ok=True)
            err = e
            if attempt < retry:
                LOGGER.warning(f"download attempt {attempt + 1} failed: {e}")
    raise ConnectionError(f"failed to download {url} after {retry + 1} "
                          f"attempts: {err}") from err


def _post_download(f: Path, unzip: bool, delete: bool) -> Path:
    from zipfile import is_zipfile
    if unzip and is_zipfile(f):
        out = unzip_file(f)
        if delete:
            f.unlink(missing_ok=True)
        return out
    return f


def download(url, dir=None, unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3):
    """Concurrent multi-URL wrapper (reference downloads.py:261-278)."""
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=threads) as pool:
            return list(pool.map(
                lambda u: safe_download(u, dir=dir, unzip=unzip,
                                        delete=delete, retry=retry), urls))
    return [safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry)
            for u in urls]


def get_github_assets(repo: str = "ultralytics/assets",
                      version: str = "latest"):
    """(tag, [asset names]) from the GitHub API (reference downloads.py:209-214).
    Requires egress; raises ConnectionError otherwise."""
    if version != "latest":
        version = f"tags/{version}"
    api = f"https://api.github.com/repos/{repo}/releases/{version}"
    try:
        with urllib.request.urlopen(api, timeout=10) as r:
            data = json.loads(r.read().decode())
        return data["tag_name"], [a["name"] for a in data.get("assets", [])]
    except (urllib.error.URLError, OSError) as e:
        raise ConnectionError(
            f"cannot reach GitHub API for {repo} (no egress?): {e}") from e


def attempt_download_asset(file, repo: str = "ultralytics/assets",
                           release: str = "v0.0.0") -> str:
    """Return *file* if present locally, else fetch it from a GitHub release
    (reference downloads.py:217-258). In an egress-less environment a missing
    file raises ConnectionError with the URL the caller would need."""
    file = Path(str(file).strip().strip("'\""))
    if file.exists():
        return str(file)
    from .settings import get_settings
    weights = Path(get_settings().get("weights_dir", ".")) / file.name
    if weights.exists():
        return str(weights)
    url = f"https://github.com/{repo}/releases/download/{release}/{file.name}"
    try:
        safe_download(url, file=file.name, dir=file.parent or Path.cwd(),
                      unzip=False)
        return str(file)
    except ConnectionError as e:
        raise ConnectionError(
            f"'{file}' not found locally and cannot be downloaded "
            f"({url}); place the file manually") from e
