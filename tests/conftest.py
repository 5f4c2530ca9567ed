"""Test config: run JAX on a virtual 8-device CPU mesh.

The ambient environment may pre-import jax with a TPU plugin platform
(sitecustomize) before this conftest runs, in which case env-var writes
alone are ineffective: JAX_PLATFORMS is materialized into jax.config at
import time.  So in addition to the env vars (which cover clean
interpreters) we call jax.config.update, which works as long as no
backend has been initialized yet.  XLA_FLAGS is read lazily at backend
creation, so setting it here is always effective.
"""

import os

# OPENDCVC_TPU_TEST_PLATFORM=tpu runs the suite on the real device
# instead of the virtual CPU mesh — the entry point for qualifying the
# Pallas kernels (tests/test_pallas_rans.py) and device-EC paths on
# hardware:  OPENDCVC_TPU_TEST_PLATFORM=tpu pytest tests/test_pallas_rans.py
_PLATFORM = os.environ.get("OPENDCVC_TPU_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# Pin the determinism flag BEFORE this conftest initializes a backend
# (jax.devices() below).  opendcvc_tpu pins it too, but tests import the
# package after the backend exists, where the pin can no longer take
# effect; setting it here keeps the enc/dec bit-exactness contract live
# for on-hardware gate runs (OPENDCVC_TPU_TEST_PLATFORM=tpu) and
# silences the package's late-import warning.
if "xla_allow_excess_precision" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_allow_excess_precision=false").strip()

# persistent compilation cache: repeated test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/opendcvc_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (must come after the env staging above)

# the env vars above only bind if jax was imported BY this conftest; a
# sitecustomize that pre-imports jax (device plugin environments)
# captures the config before they exist, silently disabling the cache —
# config.update is authoritative either way
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", float(
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", int(
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]))

if _PLATFORM == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    assert jax.devices()[0].platform == "cpu", (
        "tests require the virtual CPU mesh; a device backend was "
        "initialized before conftest could force JAX_PLATFORMS=cpu")
    assert len(jax.devices()) >= 8, (
        "xla_force_host_platform_device_count=8 did not take effect")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-second end-to-end roundtrips; deselect with "
        "-m 'not slow' for a fast gate (the full suite stays the "
        "default)")
