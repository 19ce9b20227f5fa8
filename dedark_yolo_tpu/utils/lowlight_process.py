"""Offline low-light synthesis tool ('lowlight_maker').

Counterpart of reference ultralytics/utils/lowlight_process.py:10-96
(apply_lowlight_and_save): group images by resolution, batch them, gamma-crush
with img ** lowlight_param on device, save under the original filenames.

TPU design: one jitted pow per resolution group; batches stream through the
device instead of the reference's per-group torch loop.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from ..data.dataset import IMG_FORMATS
from ..ops.degrade import lowlight_degrade
from . import LOGGER


def apply_lowlight_and_save(src_dir, dst_dir, lowlight_param=7.5, batch_size=16):
    """Degrade every image in src_dir and write to dst_dir (same filenames)."""
    import cv2
    import jax
    import jax.numpy as jnp

    src_dir, dst_dir = Path(src_dir), Path(dst_dir)
    dst_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(f for f in src_dir.rglob("*") if f.suffix.lower() in IMG_FORMATS)
    if not files:
        raise FileNotFoundError(f"no images in {src_dir}")

    # group by resolution so batches have a fixed shape per group
    groups = defaultdict(list)
    for f in files:
        img = cv2.imread(str(f))
        if img is None:
            LOGGER.info(f"skipping unreadable image {f}")
            continue
        groups[img.shape].append((f, img))

    degrade = jax.jit(lambda x: lowlight_degrade(x, lowlight_param))
    n = 0
    for shape, items in groups.items():
        for i in range(0, len(items), batch_size):
            chunk = items[i:i + batch_size]
            arr = np.stack([im for _, im in chunk]).astype(np.float32) / 255.0
            out = np.asarray(degrade(jnp.asarray(arr)))
            out = (np.clip(out, 0, 1) * 255).astype(np.uint8)
            for (f, _), im in zip(chunk, out):
                rel = f.relative_to(src_dir)
                dst = dst_dir / rel
                dst.parent.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(dst), im)
                n += 1
    LOGGER.info(f"wrote {n} degraded images (param={lowlight_param}) to {dst_dir}")
    return n
