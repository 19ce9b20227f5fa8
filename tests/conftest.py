"""Test configuration: force an 8-virtual-device CPU platform BEFORE any test
imports jax, so multi-chip sharding paths are exercised without TPU hardware.

Note: the environment may pin JAX_PLATFORMS to a TPU plugin via sitecustomize,
so we must override through jax.config, not just the env var."""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
