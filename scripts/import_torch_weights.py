"""Convert a reference (Ultralytics/Dedark-YOLO) state_dict npz into our
checkpoint format.

Step 1 (on a machine with torch + the reference package):
    import torch, numpy as np
    m = torch.load('best.pt', map_location='cpu')['model'].float()
    np.savez('best_sd.npz', **{k: v.numpy() for k, v in m.state_dict().items()
                               if 'num_batches_tracked' not in k})

Step 2 (here):
    python scripts/import_torch_weights.py best_sd.npz yolov8l.yaml out.npz [nc]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def main(sd_path, yaml_path, out_path, nc=None):
    from dedark_yolo_tpu.cfg import model_yaml_load
    from dedark_yolo_tpu.nn.graph import DetectionModel
    from dedark_yolo_tpu.utils.torch_import import convert_state_dict
    from dedark_yolo_tpu.utils.checkpoint import save_checkpoint

    sd = dict(np.load(sd_path))
    d = model_yaml_load(yaml_path)
    model = DetectionModel(d, nc=int(nc) if nc else None)
    example = jax.eval_shape(model.module.init, jax.random.PRNGKey(0),
                             jax.ShapeDtypeStruct((1, 640, 640, 3), np.float32))
    variables = convert_state_dict(sd, model, example)
    save_checkpoint(out_path, params=variables["params"],
                    batch_stats=variables["batch_stats"],
                    ema_params=variables["params"], model_yaml=model.yaml,
                    train_args={"imgsz": 640})
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
