"""Multi-object tracking (`model.track()` surface).

The reference wires `.track()` through `ultralytics.trackers.register_tracker`
(engine/model.py:229-250) but the trackers package itself is missing from the
fork — the API exists and cannot run. Here it runs: detection batches on the
TPU through the normal predictor stream, and the tracker consumes the streamed
Results in frame order on the host, stamping track IDs into a 7th box column.

`make_tracker(name)` loads a tracker yaml (bytetrack.yaml / botsort.yaml, same
choice set as reference default.yaml:119) from cfg/trackers/ or from an
absolute path, validates `tracker_type`, and returns a ready tracker.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace

import numpy as np

from .byte_tracker import BYTETracker
from .bot_sort import BOTSORT

TRACKER_TYPES = {"bytetrack": BYTETracker, "botsort": BOTSORT}
_CFG_DIR = Path(__file__).resolve().parents[1] / "cfg" / "trackers"


def load_tracker_cfg(name):
    """Resolve 'bytetrack.yaml' / 'botsort' / an absolute yaml path to a
    SimpleNamespace of tracker args."""
    import yaml
    p = Path(str(name))
    if not p.suffix:
        p = p.with_suffix(".yaml")
    if not p.is_file():
        cand = _CFG_DIR / p.name
        if not cand.is_file():
            raise FileNotFoundError(
                f"tracker config '{name}' not found (looked in {_CFG_DIR}); "
                f"choices: {sorted(f.name for f in _CFG_DIR.glob('*.yaml'))}")
        p = cand
    cfg = yaml.safe_load(p.read_text())
    if cfg.get("tracker_type") not in TRACKER_TYPES:
        raise ValueError(
            f"tracker_type must be one of {sorted(TRACKER_TYPES)}, got "
            f"{cfg.get('tracker_type')!r} in {p}")
    return SimpleNamespace(**cfg)


def make_tracker(name, frame_rate=30):
    cfg = load_tracker_cfg(name)
    return TRACKER_TYPES[cfg.tracker_type](cfg, frame_rate=frame_rate)


def track_results(results_iter, tracker, persist_between_sources=False):
    """Wrap a streaming Results iterator with tracking (the counterpart of the
    reference's on_predict_postprocess_end callback).

    Each Results' boxes become (m, 7) [x1,y1,x2,y2,track_id,conf,cls]; masks/
    keypoints are re-indexed to the matched detections. The tracker resets
    when the source path changes (a new video/sequence) unless
    persist_between_sources.
    """
    last_path = None
    for res in results_iter:
        if (last_path is not None and res.path != last_path
                and not persist_between_sources):
            tracker.reset()
        last_path = res.path
        b = res.boxes
        # explicit column selection: re-tracking already-tracked output drops
        # the id column rather than misreading it as a coordinate
        dets = b.data[:, [0, 1, 2, 3, 5, 6]] if b.is_track else b.data
        tracks = tracker.update(dets, img=res.orig_img[..., ::-1])
        res.update_tracks(tracks)
        yield res
