"""opendcvc_tpu — a TPU-native neural video/image codec framework.

A from-scratch JAX/XLA/Pallas re-design of the OpenDCVC capability set
(DCVC family of neural codecs: DCVC-RT, DCVC-FM, DCVC-DC, DCVC-HEM,
DCVC-TCM, DCVC, EVC).  The device-side compute path is pure JAX (NHWC
layouts, MXU-friendly convs, fused elementwise via XLA + Pallas kernels);
the host-side entropy-coding runtime is native C++ (rANS) bound through
ctypes.

Layer map (mirrors the reference's layering, re-expressed TPU-first):
  L0  entropy  — native rANS runtime (opendcvc_tpu.native / entropy.rans)
  L1  ops      — fused device ops: pure-jnp reference path + Pallas kernels
  L2  layers   — NN building blocks + entropy models
  L3  models   — codec models (DMC video / DMCI image, family codecs)
  L4  utils    — bitstream syntax, IO, color transforms, metrics
  L5  eval     — RD-evaluation harness / CLI
  L6  training — RD training loop (data-parallel shard_map over a Mesh)
"""

__version__ = "0.1.0"

import os as _os

# Determinism contract: encoder and decoder evaluate shared stages in
# DIFFERENT compiled programs (the fused per-frame megastages), and the
# temporal prediction chain requires their numerics to be bit-identical.
# By default XLA:TPU keeps fusion intermediates at excess (f32)
# precision and only rounds bf16 values at fusion boundaries, so the
# same source expression can round differently in different programs.
# Forcing excess precision off pins every op's rounding, making results
# program-shape-independent (verified on TPU: fused-vs-split and
# enc-vs-dec feature chains match exactly).  The TPU analogue of the
# reference's torch.use_deterministic_algorithms(True)
# (reference src/utils/common.py:17-29).
_flags = _os.environ.get("XLA_FLAGS", "")
_excess_precision_pinned = True
if "xla_allow_excess_precision" not in _flags:
    _os.environ["XLA_FLAGS"] = \
        (_flags + " --xla_allow_excess_precision=false").strip()
    # XLA_FLAGS is read at backend creation: if a JAX backend already
    # exists (user code ran a jax op before importing opendcvc_tpu),
    # the pin above is silently ignored and the enc/dec bit-exact
    # temporal-chain contract can drift without a diagnostic.  Record
    # and warn loudly (models.common.assert_determinism_flags raises
    # on the device-EC setup path).
    try:
        import jax._src.xla_bridge as _xb
        if getattr(_xb, "_backends", None):
            _excess_precision_pinned = False
            import warnings as _w
            _w.warn(
                "opendcvc_tpu imported AFTER a JAX backend was "
                "initialized: --xla_allow_excess_precision=false could "
                "not take effect, so encoder/decoder bit-exactness is "
                "not guaranteed. Import opendcvc_tpu before running "
                "any jax operation.", RuntimeWarning, stacklevel=2)
    except ImportError:  # pragma: no cover - jax internals moved
        pass

# Persistent XLA compilation cache for EVERY entry point (bench, tools,
# eval CLIs — not just tests/graft): the 1080p megastages take 20-40 s
# each to compile and are recompiled identically run after run without
# this.  jax.config.update is authoritative even when a sitecustomize
# pre-imported jax (env vars alone would bind too late there).
# Opt out with OPENDCVC_TPU_NO_COMPILE_CACHE=1.
if _os.environ.get("OPENDCVC_TPU_NO_COMPILE_CACHE") not in ("1", "true"):
    try:
        import jax as _jax
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/opendcvc_tpu_jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                           0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
del _os, _flags
