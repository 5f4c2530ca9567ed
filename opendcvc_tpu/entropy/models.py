"""Entropy models: QP-banked factorized prior + conditional Gaussian.

TPU re-design of the reference entropy models (reference:
src/models/entropy_models.py:84-341):

  * BitEstimator — a 4-layer learned CDF ("Bitparm" MLP) with a QP-indexed
    parameter bank.  The JAX forward is used for differentiable rate
    estimation in training and inside jitted eval graphs; `update()`
    samples the CDF on the host in float64 numpy (deterministic across
    machines — encoder and decoder must derive identical tables) and
    registers quantized CDFs with the coder.

  * GaussianEncoder — 128-level log-spaced scale table in [0.11, 16];
    zero-mean Normal CDFs quantized per scale level; device-side index
    building (ops.build_index_enc/dec) with optional force-zero skip mode.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special as sp_special

from .cdf import pmf_to_cdf
from ..ops import fused as F


# ---------------------------------------------------------------------------
# BitEstimator (factorized prior), functional params + host-side update
# ---------------------------------------------------------------------------

def bitparm_init(key, qp_num, channel, final=False):
    keys = jax.random.split(key, 3)
    p = {
        "h": 0.01 * jax.random.normal(keys[0], (qp_num, channel)),
        "b": 0.01 * jax.random.normal(keys[1], (qp_num, channel)),
    }
    if not final:
        p["a"] = 0.01 * jax.random.normal(keys[2], (qp_num, channel))
    return p


def bit_estimator_init(key, qp_num, channel):
    keys = jax.random.split(key, 4)
    return {
        "f1": bitparm_init(keys[0], qp_num, channel),
        "f2": bitparm_init(keys[1], qp_num, channel),
        "f3": bitparm_init(keys[2], qp_num, channel),
        "f4": bitparm_init(keys[3], qp_num, channel, final=True),
    }


def _bitparm_apply(p, x, qp):
    """x: (..., C); qp: scalar int index into the bank."""
    h = jax.nn.softplus(p["h"][qp])
    b = p["b"][qp]
    x = x * h + b
    if "a" in p:
        x = x + jnp.tanh(x) * jnp.tanh(p["a"][qp])
    return x


def bit_estimator_logits(params, x, qp):
    x = _bitparm_apply(params["f1"], x, qp)
    x = _bitparm_apply(params["f2"], x, qp)
    x = _bitparm_apply(params["f3"], x, qp)
    x = _bitparm_apply(params["f4"], x, qp)
    return x


def bit_estimator_cdf(params, x, qp):
    return jax.nn.sigmoid(bit_estimator_logits(params, x, qp))


def bit_estimator_bits(params, z, qp):
    """Differentiable bit estimate for training: -log2(cdf(z+.5)-cdf(z-.5)).

    Computed in float32 even under the bf16 AMP policy — the CDF
    difference cancels catastrophically at bf16's ~3 significant
    digits."""
    z = z.astype(jnp.float32)
    upper = bit_estimator_cdf(params, z + 0.5, qp)
    lower = bit_estimator_cdf(params, z - 0.5, qp)
    probs = jnp.clip(upper - lower, 1e-9, None)
    return -jnp.log2(probs)


def _np_bitparm(p, x, qp_axis=True):
    """Host float64 Bitparm forward; p entries are (Q, C), x is (Q, C, L)."""
    h = np.log1p(np.exp(p["h"]))  # softplus
    x = x * h[:, :, None] + p["b"][:, :, None]
    if "a" in p:
        x = x + np.tanh(x) * np.tanh(p["a"][:, :, None])
    return x


def _np_cdf(params_np, x):
    for name in ("f1", "f2", "f3", "f4"):
        x = _np_bitparm(params_np[name], x)
    return 1.0 / (1.0 + np.exp(-x))


def fetch_tree(tree):
    """Single-transfer device->host fetch of a pytree.

    Remote-attached devices pay ~30 ms latency PER ARRAY on synchronous
    fetches; concatenating the raveled leaves on-device and fetching
    ONE buffer turns a many-leaf fetch from O(leaves) round-trips into
    one.  Leaves are staged through f32 (exact for f32/bf16/int<=24bit
    params)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or not any(hasattr(l, "device") for l in leaves):
        return tree
    flat = jax.jit(lambda ls: jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in ls]))(leaves)
    host = np.asarray(flat)
    out, off = [], 0
    for l in leaves:
        n = int(np.prod(np.shape(l))) if np.shape(l) else 1
        out.append(host[off:off + n].reshape(np.shape(l)))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)


class BitEstimator:
    """Host-side helper owning the CDF tables + coder bindings for z.

    support: half-width of the symbol-support scan — 8 for the RT models
    (reference entropy_models.py:161) and 50 for the older family
    generation (EVC entropy_models.py:140); symbols beyond int8 range are
    escape-coded either way.
    """

    def __init__(self, qp_num, channel, support=8):
        self.qp_num = qp_num
        self.channel = channel
        self.support = support
        self.entropy_coder = None
        self.cdf_group_index = None

    def update(self, params, entropy_coder):
        """Sample the learned CDF and register quantized tables.

        Mirrors reference entropy_models.py:152-205: scan the support,
        evaluate pmf at half-integer offsets, quantize.
        """
        self.entropy_coder = entropy_coder
        p = jax.tree_util.tree_map(
            lambda a: np.asarray(a, dtype=np.float64),
            fetch_tree(dict(params)))
        Q, C = self.qp_num, self.channel
        S = self.support

        def cdf_at(v):
            x = np.full((Q, C, 1), float(v), dtype=np.float64)
            return _np_cdf(p, x)[:, :, 0]

        minima = np.full((Q, C), S, dtype=np.int64)
        for i in range(S, 1, -1):
            probs = cdf_at(-i)
            minima = np.where(probs < 1e-4, i, minima)
        maxima = np.full((Q, C), S, dtype=np.int64)
        for i in range(S, 1, -1):
            probs = cdf_at(i)
            maxima = np.where(probs > 0.9999, i, maxima)

        offset = -minima
        pmf_start = -minima.astype(np.float64)
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())

        samples = np.arange(max_length, dtype=np.float64)[None, None, :] \
            + pmf_start[:, :, None]
        lower = _np_cdf(p, samples - 0.5)
        upper = _np_cdf(p, samples + 0.5)
        pmf = upper - lower

        cdf_at_max = _np_cdf(p, maxima.astype(np.float64)[:, :, None])[:, :, 0]
        tail_mass = lower[:, :, 0] + (1.0 - cdf_at_max)

        pmf = pmf.reshape(-1, max_length)
        tail_mass = tail_mass.reshape(-1, 1)
        pmf_length = pmf_length.reshape(-1)
        offset = offset.reshape(-1)
        quantized_cdf = pmf_to_cdf(pmf, tail_mass, pmf_length, max_length)
        cdf_length = pmf_length + 2
        self.cdf_info = (quantized_cdf, cdf_length.astype(np.int32),
                         offset.astype(np.int32))
        self.cdf_group_index = entropy_coder.add_cdf(
            *self.cdf_info, build_lut=False)

    def encode_z(self, z_int8_flat, qp):
        """z: NHWC-flattened int8 numpy array."""
        self.entropy_coder.encode_z(z_int8_flat, self.cdf_group_index,
                                    qp * self.channel, self.channel)

    def decode_z(self, size, qp):
        total = self.channel * size[0] * size[1]
        self.entropy_coder.decode_z(total, self.cdf_group_index,
                                    qp * self.channel, self.channel)

    def get_z(self, size, dtype=np.float32):
        """Returns (1, H, W, C) numpy array of the decoded z."""
        val = self.entropy_coder.get_decoded_tensor()
        return val.reshape(1, size[0], size[1], self.channel).astype(dtype)


# ---------------------------------------------------------------------------
# GaussianEncoder
# ---------------------------------------------------------------------------

def _normal_cdf(x):
    return 0.5 * (1.0 + sp_special.erf(x / math.sqrt(2.0)))


def _laplace_cdf(x):
    """CDF of Laplace(0, b=1) evaluated at x (x pre-divided by scale).
    Both where-branches are evaluated, so clamp the exponents."""
    return np.where(x < 0, 0.5 * np.exp(np.minimum(x, 0.0)),
                    1.0 - 0.5 * np.exp(np.minimum(-x, 0.0)))


class GaussianEncoder:
    """Conditional coder over a log-spaced scale table.

    Defaults are the RT generation (gaussian, [0.11, 16], 128 levels,
    reference entropy_models.py:227-341); the family generation uses 256
    levels up to 64 and optionally a Laplace distribution (EVC
    entropy_models.py:204-218); `support` bounds the per-scale pmf width.
    """

    SCALE_MIN = 0.11
    SCALE_MAX = 16.0
    SCALE_LEVELS = 128

    def __init__(self, distribution="gaussian", scale_min=None,
                 scale_max=None, scale_levels=None, support=8):
        self.distribution = distribution
        self.SCALE_MIN = scale_min if scale_min is not None else \
            (0.01 if distribution == "laplace" else 0.11)
        self.SCALE_MAX = scale_max if scale_max is not None else \
            type(self).SCALE_MAX
        self.SCALE_LEVELS = scale_levels if scale_levels is not None else \
            type(self).SCALE_LEVELS
        self.support = support
        self.log_scale_min = math.log(self.SCALE_MIN)
        self.log_scale_max = math.log(self.SCALE_MAX)
        self.log_scale_step = ((self.log_scale_max - self.log_scale_min)
                               / (self.SCALE_LEVELS - 1))
        self.log_step_recip = 1.0 / self.log_scale_step
        self.scale_table = np.exp(np.linspace(
            self.log_scale_min, self.log_scale_max, self.SCALE_LEVELS))
        self.entropy_coder = None
        self.cdf_group_index = None
        self.force_zero_thres = None

    def _cdf(self, x):
        if self.distribution == "laplace":
            return _laplace_cdf(x)
        return _normal_cdf(x)

    def update(self, entropy_coder, force_zero_thres=None):
        self.entropy_coder = entropy_coder
        self.force_zero_thres = force_zero_thres

        S = self.support
        scales = self.scale_table.astype(np.float64)
        pmf_center = np.full(self.SCALE_LEVELS, S, dtype=np.int64)
        for i in range(S, 1, -1):
            probs = self._cdf(i / scales)
            pmf_center = np.where(probs > 0.9999, i, pmf_center)

        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())
        samples = (np.arange(max_length, dtype=np.float64)[None, :]
                   - pmf_center[:, None])
        upper = self._cdf((samples + 0.5) / scales[:, None])
        lower = self._cdf((samples - 0.5) / scales[:, None])
        pmf = upper - lower
        tail_mass = 2 * lower[:, :1]

        quantized_cdf = pmf_to_cdf(pmf, tail_mass, pmf_length, max_length)
        self.cdf_info = (quantized_cdf,
                         (pmf_length + 2).astype(np.int32),
                         (-pmf_center).astype(np.int32))
        self.cdf_group_index = entropy_coder.add_cdf(*self.cdf_info,
                                                     build_lut=True)

    # -- device-side helpers (called from jitted model graphs) -------------

    def process_with_mask(self, y, scales, means, mask):
        return F.process_with_mask(y, scales, means, mask,
                                   self.force_zero_thres)

    def build_indexes_encoder_device(self, y_q, scales):
        """Packs (symbol<<8|index) on device; returns (packed, skip_cond)."""
        return F.build_index_enc(y_q, scales, self.SCALE_MIN, self.SCALE_MAX,
                                 self.log_scale_min, self.log_step_recip,
                                 self.force_zero_thres)

    def build_indexes_decoder_device(self, scales):
        return F.build_index_dec(scales, self.SCALE_MIN, self.SCALE_MAX,
                                 self.log_scale_min, self.log_step_recip,
                                 self.force_zero_thres)

    # -- host-side coding ---------------------------------------------------

    def encode_y_packed(self, packed, skip_cond=None):
        """packed: int16 numpy (already flattened); skip filter applied here."""
        packed = np.asarray(packed, dtype=np.int16).reshape(-1)
        if skip_cond is not None:
            packed = packed[np.asarray(skip_cond).reshape(-1)]
        self.entropy_coder.encode_y(packed, self.cdf_group_index)

    def decode_y(self, indexes, skip_cond=None):
        indexes = np.asarray(indexes, dtype=np.uint8).reshape(-1)
        if skip_cond is not None:
            indexes = indexes[np.asarray(skip_cond).reshape(-1)]
        self.entropy_coder.decode_y(indexes, self.cdf_group_index)

    def get_y(self, shape, skip_cond=None, dtype=np.float32):
        """Scatter decoded symbols back into a dense plane (zeros where
        skipped) — reference entropy_models.py:330-341."""
        val = self.entropy_coder.get_decoded_tensor().astype(dtype)
        if skip_cond is None:
            return val.reshape(shape)
        skip = np.asarray(skip_cond).reshape(-1)
        out = np.zeros(skip.shape[0], dtype=dtype)
        out[skip] = val
        return out.reshape(shape)


def gaussian_bits(y_res, scales):
    """Differentiable rate estimate for training: bits of round(y_res)
    under N(0, scales) with half-integer integration.

    Always computed in float32: ndtr has no bf16 kernel, and under the
    bf16 AMP policy the rate term of the loss should stay full
    precision anyway (the probability differences underflow in bf16)."""
    scales = jnp.clip(scales.astype(jnp.float32), 0.11, None)
    y = y_res.astype(jnp.float32)
    upper = jax.scipy.stats.norm.cdf(y + 0.5, 0.0, scales)
    lower = jax.scipy.stats.norm.cdf(y - 0.5, 0.0, scales)
    probs = jnp.clip(upper - lower, 1e-9, None)
    return -jnp.log2(probs)
