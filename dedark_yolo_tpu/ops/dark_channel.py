"""Dark-channel-prior computation, fully vectorized on device.

The reference computes these per image on the host with OpenCV/NumPy inside the
training hot loop (ultralytics/models/yolo/detect/train.py:42-111), forcing a
device->host->device round trip every batch. Here the whole thing is batched JAX:
a channel-min, a top-k over flattened pixels, and a gather — it fuses into the
train step and never leaves HBM.

Semantics:
  - dark_channel: per-pixel min over RGB (reference DarkChannel, train.py:42-45 —
    note the reference applies NO spatial erosion window, just cv2.min over channels).
  - atmospheric_light: mean image color over the brightest 0.1% of dark-channel
    pixels (reference AtmLight, train.py:47-62). The reference loop sums indices
    1..numpx-1 and divides by numpx (an off-by-one); we compute the true mean over
    all numpx pixels and document the deviation — with numpx >= 400 at 640px the
    difference is <0.25%.
  - IcA: dark channel of img / A (reference DarkIcA, train.py:64-68).

Inputs are float images in [0, 1], NHWC. The reference runs this math on uint8
0..255 images and then feeds the resulting 0..255-scale A directly next to 0..1
images; because those computed priors are never actually consumed in the reference
model path (SURVEY.md §3.5 quirk — defaults A=0.8/IcA=0.5 are used instead), we
define the computed path in normalized [0,1] units, which is what the DeDark filter
formula expects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dark_channel(img):
    """Per-pixel channel-min. img: (..., H, W, 3) -> (..., H, W)."""
    return jnp.min(img, axis=-1)


def atmospheric_light(img, dark, top_fraction=0.001):
    """Atmospheric light A: mean color over the brightest `top_fraction` of dark pixels.

    img: (B, H, W, 3) in [0,1]; dark: (B, H, W). Returns (B, 3).
    """
    b, h, w, _ = img.shape
    numpx = max(int(h * w * top_fraction), 1)
    dark_flat = dark.reshape(b, h * w)
    img_flat = img.reshape(b, h * w, 3)
    _, idx = jax.lax.top_k(dark_flat, numpx)  # (B, numpx)
    top_pixels = jnp.take_along_axis(img_flat, idx[..., None], axis=1)  # (B, numpx, 3)
    return jnp.mean(top_pixels, axis=1)


def dark_channel_priors(img, top_fraction=0.001, eps=1e-6):
    """Compute (A, IcA) for a batch. img: (B, H, W, 3) in [0,1].

    Returns:
        A:   (B, 3) atmospheric light.
        IcA: (B, H, W, 1) dark channel of img / A.
    """
    dark = dark_channel(img)
    A = atmospheric_light(img, dark, top_fraction)
    ica = dark_channel(img / (A[:, None, None, :] + eps))
    return A, ica[..., None]
