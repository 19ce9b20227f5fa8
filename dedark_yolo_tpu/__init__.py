"""dedark-yolo-tpu: a TPU-native (JAX/XLA/Pallas/pjit) low-light object-detection
framework with the capability set of cvYouTian/Dedark-YOLO.

Everything hot compiles to a single XLA graph per mode: enhance -> backbone ->
head -> decode -> NMS for inference; degrade -> dark-channel -> enhance -> detect
-> loss for the train step. Data parallelism is a jax.sharding Mesh over the
batch axis, not a process-level DDP wrapper.
"""

__version__ = "0.1.0"

def __getattr__(name):
    # Lazy import so `import dedark_yolo_tpu.ops` doesn't pull the whole engine.
    if name == "YOLO":
        from .engine.model import YOLO
        return YOLO
    raise AttributeError(name)


__all__ = ["YOLO", "__version__"]
