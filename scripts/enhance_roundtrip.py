"""BASELINE config 2: lowlight degrade -> lowlight_recovery round trip.

Sweeps lowlight_param 3..10, degrades a clean image, runs the enhancement stack
(default or computed dark-channel priors), and reports PSNR of degraded vs
enhanced against the clean original. With randomly-initialized filter-parameter
weights this measures the machinery (the filters still brighten via the DeDark
default prior). NOTE on trained weights (--ckpt): the reference's recovery
loss is mse(degraded, clean) computed in preprocess (detect/train.py:108) —
a CONSTANT w.r.t. the model parameters — so the enhancement module is trained
only by the detection gradient. Trained weights therefore optimize
detection-friendly enhancement (see docs/REALIMAGE.md: 13.9x mAP on dark
data), not pixel-space PSNR, which stays roughly flat.

Usage: python scripts/enhance_roundtrip.py [image_path] [--pallas] [--computed]
       [--ckpt runs/.../best.npz]   # use TRAINED enhance weights (EMA)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse < 1e-12 else 10 * np.log10(1.0 / mse)


def main(argv):
    import cv2
    from dedark_yolo_tpu.nn.enhance import LowlightRecovery
    from dedark_yolo_tpu.ops.degrade import lowlight_degrade
    from dedark_yolo_tpu.ops.dark_channel import dark_channel_priors

    img_path = next((a for a in argv if not a.startswith("--")), None)
    use_pallas = "--pallas" in argv
    computed = "--computed" in argv
    ckpt = (argv[argv.index("--ckpt") + 1] if "--ckpt" in argv else None)

    if img_path and Path(img_path).is_file():
        img = cv2.imread(img_path)
        img = cv2.resize(img, (640, 640))[..., ::-1]
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(60, 220, (640, 640, 3), dtype=np.uint8)
    clean = jnp.asarray(img[None].astype(np.float32) / 255.0)

    mod = LowlightRecovery(impl="pallas" if use_pallas else "xla")
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), clean)
    if ckpt:
        # graft the trained graph's layer-0 (mods_0) EMA weights into the
        # standalone module (checkpoint keys: ema/mods_0/<module path>/<leaf>)
        from dedark_yolo_tpu.utils.checkpoint import load_checkpoint
        _, flat = load_checkpoint(ckpt)
        prefix = "ema/mods_0/"
        params = {}
        for k, v in flat.items():
            if not k.startswith(prefix):
                continue
            parts = k[len(prefix):].split("/")
            d = params
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = v
        assert params, f"no {prefix}* keys in {ckpt} (layer 0 not lowlight?)"
        variables = {"params": params}
        print(f"using trained enhance weights from {ckpt}")

    @jax.jit
    def enhance(v, x, A, ica):
        return mod.apply(v, x, dedark_A=A, IcA=ica)

    print(f"{'param':>6} {'PSNR(degraded)':>15} {'PSNR(enhanced)':>15} {'gain':>7}")
    for p in range(3, 11):
        dark = lowlight_degrade(clean, float(p))
        if computed:
            A, ica = dark_channel_priors(dark)
        else:
            A, ica = None, None
        out = jnp.clip(enhance(variables, dark, A, ica), 0, 1)
        pd, pe = psnr(dark, clean), psnr(out, clean)
        print(f"{p:>6} {pd:>15.2f} {pe:>15.2f} {pe - pd:>+7.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
