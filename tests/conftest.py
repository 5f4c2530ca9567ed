"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, hence at
conftest import time.
"""

import os

# force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU
# plugin; tests validate logic + multi-device sharding on a virtual mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: repeated test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/opendcvc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
