"""Shared compression-model machinery.

TPU re-design of the reference CompressionModel base (reference:
src/models/common_model.py).  The reference's CUDA-stream scheduling
becomes explicit jit *stage functions*; crucially, every subgraph that both
the encoder and the decoder must evaluate identically (hyper decode, prior
fusion, spatial-prior passes) is expressed as ONE jitted function reused on
both sides, so the floats feeding index construction are bit-identical and
the checkerboard coding loop can never desync.

Prior-separation semantics (common_model.py:63-85):
  video: params -> (quant_step, scales, means) channel-thirds,
         quant_step clamped >= 0.5, q_enc = 1/q_dec.
  image: channels [0:2] -> sigmoid*1.5+0.5 -> (q_enc, q_dec) spatial maps,
         channels [2:] -> (scales, means).
"""

import os

import jax
import jax.numpy as jnp

QP_NUM = 64


def get_qp_num():
    return QP_NUM


_INIT_MEMO = {}


def run_init(build, key, memo_key=None):
    """Run a parameter-init closure, jitted only on accelerators.

    On a tunneled/remote device the ~300 eager random ops of a full
    init cost ~18 ms dispatch EACH, so init must be one compiled
    program.  On CPU it is the opposite: the single giant init program
    takes ~50-60 s to COMPILE (and the persistent cache does not retain
    it), while the eager ops run in ~20 s — and the CPU test suite pays
    that compile in every module's codec fixture.

    memo_key (hashable, should encode model class + seed + dtype +
    width config) additionally memoizes the built pytree within the
    process: repeated same-seed inits (per-worker harness codecs, one
    fixture per test module) return instantly.  The memo hands out a
    fresh dict STRUCTURE each time (leaves shared — jax arrays are
    immutable) so callers that reassign entries cannot contaminate
    later inits."""
    if memo_key is not None and memo_key in _INIT_MEMO:
        return jax.tree_util.tree_map(lambda a: a, _INIT_MEMO[memo_key])
    if jax.default_backend() == "cpu":
        out = build(key)
    else:
        out = jax.jit(build)(key)
    if memo_key is not None:
        _INIT_MEMO[memo_key] = out
        return jax.tree_util.tree_map(lambda a: a, out)
    return out


def assert_determinism_flags():
    """Device-EC setup gate: the bit-exact enc/dec temporal-chain
    contract requires --xla_allow_excess_precision=false to have been
    in XLA_FLAGS *before* backend initialization (opendcvc_tpu pins it
    at import, but only if imported before any jax op ran).  CPU is
    exempt: its backend computes at declared precision already."""
    if jax.devices()[0].platform == "cpu":
        return
    import opendcvc_tpu
    if not getattr(opendcvc_tpu, "_excess_precision_pinned", True) or \
            "--xla_allow_excess_precision=false" not in \
            os.environ.get("XLA_FLAGS", ""):
        raise RuntimeError(
            "device-side entropy coding requires "
            "--xla_allow_excess_precision=false in XLA_FLAGS before "
            "JAX backend init; import opendcvc_tpu before running any "
            "jax operation (or set the flag in the environment)")


def get_padding_size(height, width, p=64):
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return new_w - width, new_h - height  # (padding_right, padding_bottom)


def get_downsampled_shape(height, width, p):
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return new_h // p, new_w // p


def pad_for_y(y):
    """Replicate-pad y (NHWC) to a multiple of 4 for the hyper path."""
    from ..ops.fused import replicate_pad
    _, h, w, _ = y.shape
    pr, pb = get_padding_size(h, w, 4)
    return replicate_pad(y, pb, pr)


def separate_prior_image(params):
    """Image codec prior split: q maps + scales/means."""
    q = jax.nn.sigmoid(params[..., :2]) * 1.5 + 0.5
    q_enc = q[..., 0:1]
    q_dec = q[..., 1:2]
    rest = params[..., 2:]
    c = rest.shape[-1] // 2
    scales = rest[..., :c]
    means = rest[..., c:]
    return q_enc, q_dec, scales, means


def separate_prior_video_encoding(params, y):
    """Video codec prior split at the encoder: y is pre-multiplied by
    1/quant (common_model.py:75-79)."""
    c = params.shape[-1] // 3
    q_dec = jnp.maximum(params[..., :c], 0.5)
    y = y * (1.0 / q_dec)
    scales = params[..., c:2 * c]
    means = params[..., 2 * c:]
    return y, q_dec, scales, means


def separate_prior_video_decoding(params):
    c = params.shape[-1] // 3
    q_dec = jnp.maximum(params[..., :c], 0.5)
    scales = params[..., c:2 * c]
    means = params[..., 2 * c:]
    return q_dec, scales, means
