"""Fused device-side ops, pure-jnp path.

This module is the TPU re-expression of the reference's 13 fused CUDA
kernels (reference: src/layers/cuda_inference.py:26-203 and
src/layers/extensions/inference/kernel.cu).  On TPU almost all of them are
elementwise chains that XLA fuses automatically once they live inside one
jitted function, so the "kernels" here are plain jnp compositions.  The
genuinely hot non-elementwise op (bias+WSiLU+3x3 depthwise conv) has a
Pallas kernel in ops/pallas_kernels.py; everything in this file is the
always-correct reference path and the default.

Layout convention: NHWC everywhere (TPU-native).  The reference is NCHW;
channel-order-sensitive ops (pixel shuffle/unshuffle) keep torch's channel
ordering (c*r^2 + dy*r + dx) so torch checkpoints remain mechanically
portable.

All quantization-adjacent ops round half-to-even (jnp.round == torch.round
semantics) and clamp to int8 range, matching the reference bit-exactly in
fp32 (reference: kernel.cu:828 round_and_to_int8, :56 process_with_mask).
"""

import jax
import jax.numpy as jnp


def space_to_depth(x, r):
    """NHWC pixel-unshuffle with torch channel ordering.

    (B, H*r, W*r, C) -> (B, H, W, C*r*r); output channel index is
    c*r*r + dy*r + dx, matching torch.nn.functional.pixel_unshuffle.
    """
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h, w, c, r, r)
    return x.reshape(b, h, w, c * r * r)


def depth_to_space(x, r):
    """NHWC pixel-shuffle, inverse of space_to_depth (torch ordering)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, r, w, r, c)
    return x.reshape(b, h * r, w * r, c)


def round_and_to_int8(z):
    """Round to nearest-even, clamp to int8 range.

    Returns (z_hat float same-dtype, z_int8) — reference
    cuda_inference.py:26-33.
    """
    z_hat = jnp.clip(jnp.round(z.astype(jnp.float32)), -128.0, 127.0)
    z_int8 = z_hat.astype(jnp.int8)
    return z_hat.astype(z.dtype), z_int8


def clamp_reciprocal_with_quant(q_dec, y, min_val):
    """q_dec = max(q_dec, min_val); y *= 1/q_dec  (cuda_inference.py:36-45)."""
    q_dec = jnp.maximum(q_dec, min_val)
    y = y * (1.0 / q_dec)
    return q_dec, y


def add_and_multiply(y_hat_0, y_hat_1, q_dec):
    """(y0 + y1) * q_dec  (cuda_inference.py:48-55)."""
    return (y_hat_0 + y_hat_1) * q_dec


def process_with_mask(y, scales, means, mask, force_zero_thres=None):
    """Masked quantization of y (cuda_inference.py:58-74, kernel.cu:56).

    Returns (y_res, y_q, y_hat, scales_hat).  With force_zero_thres set,
    symbols whose (masked) scale <= thres are forced to 0 and never coded.
    """
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = jnp.round(y_res.astype(jnp.float32))
    if force_zero_thres is not None:
        cond = scales_hat.astype(jnp.float32) > force_zero_thres
        y_q = y_q * cond
    y_q = jnp.clip(y_q, -128.0, 127.0).astype(y.dtype)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


def _fold_halves(x):
    """Sum the two channel halves: (..., C) -> (..., C/2)."""
    c = x.shape[-1]
    return x[..., : c // 2] + x[..., c // 2:]


def combine_for_reading_2x(x, mask):
    """x*mask folded to half channels (cuda_inference.py:77-89)."""
    return _fold_halves(x * mask)


def restore_y_2x(y, means, mask):
    """([y, y] + means) * mask  (cuda_inference.py:92-98)."""
    return (jnp.concatenate((y, y), axis=-1) + means) * mask


def restore_y_2x_with_cat_after(y, means, mask, to_cat):
    """restore_y_2x plus channel concat (cuda_inference.py:101-112)."""
    out = restore_y_2x(y, means, mask)
    return out, jnp.concatenate((out, to_cat), axis=-1)


def restore_y_4x(y, means, mask):
    """([y, y, y, y] + means) * mask  (cuda_inference.py:115-121)."""
    return (jnp.concatenate((y, y, y, y), axis=-1) + means) * mask


def build_index_dec(scales, scale_min, scale_max, log_scale_min,
                    log_step_recip, skip_thres=None):
    """Quantize log-scale to a uint8 CDF index (cuda_inference.py:124-143).

    Returns (indexes uint8, skip_cond bool or None).  Truncation toward
    zero on the cast matches torch's `.to(torch.uint8)`.
    """
    scales = jnp.clip(scales.astype(jnp.float32), scale_min, scale_max)
    indexes = (jnp.log(scales) - log_scale_min) * log_step_recip
    indexes = indexes.astype(jnp.uint8)
    skip_cond = None
    if skip_thres is not None:
        skip_cond = scales > skip_thres
    return indexes, skip_cond


def build_index_enc(symbols, scales, scale_min, scale_max, log_scale_min,
                    log_step_recip, skip_thres=None):
    """Pack (int8 symbol << 8 | uint8 cdf index) into int16
    (cuda_inference.py:146-171).  The skip filter (dynamic size) is applied
    host-side; here we return packed symbols plus the skip mask.
    """
    scales = jnp.clip(scales.astype(jnp.float32), scale_min, scale_max)
    indexes = (jnp.log(scales) - log_scale_min) * log_step_recip
    indexes = indexes.astype(jnp.uint8)
    packed = (symbols.astype(jnp.int16) << 8) + indexes.astype(jnp.int16)
    skip_cond = None
    if skip_thres is not None:
        skip_cond = scales > skip_thres
    return packed, skip_cond


def replicate_pad(x, pad_b, pad_r):
    """Edge-replicate pad bottom/right on NHWC (cuda_inference.py:174-179)."""
    if pad_b == 0 and pad_r == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)), mode="edge")


def pixel_shuffle_clamp(x, r=8, clamp=True):
    """depth_to_space + clamp [0,1] (bias is folded into the preceding
    conv; reference fuses bias+shuffle+clamp in bias_pixel_shuffle_8,
    kernel.cu:763 — on TPU XLA fuses the chain)."""
    out = depth_to_space(x, r)
    if clamp:
        out = jnp.clip(out, 0.0, 1.0)
    return out


# ---------------------------------------------------------------------------
# Checkerboard masks (reference: src/models/common_model.py:90-131).
# Built from broadcasted_iota inside the jitted graph — no host caching
# needed; XLA constant-folds them per compiled shape.
# ---------------------------------------------------------------------------

def _parity_masks(h, w, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return r % 2, c % 2


def checkerboard_masks_2x(h, w, channels, dtype):
    """Two complementary checkerboard masks of shape (1, H, W, C).

    mask_0 = [even-checker over first C/2 channels, odd-checker over the
    rest]; mask_1 is the swap.  Matches get_mask_2x micro-patterns
    ((1,0),(0,1)) / ((0,1),(1,0)) (common_model.py:118-131).
    """
    rp, cp = _parity_masks(h, w, dtype)
    m0 = ((rp + cp) % 2 == 0).astype(dtype)[None, :, :, None]
    m1 = 1.0 - m0
    half = channels // 2
    ones = jnp.ones((1, h, w, half), dtype=dtype)
    mask_0 = jnp.concatenate((ones * m0, ones * m1), axis=-1)
    mask_1 = jnp.concatenate((ones * m1, ones * m0), axis=-1)
    return mask_0, mask_1


def checkerboard_masks_4x(h, w, channels, dtype):
    """Four quadtree masks of shape (1, H, W, C), channel quarters cycled
    per pass (common_model.py:99-116)."""
    rp, cp = _parity_masks(h, w, dtype)
    q = channels // 4
    m = [None] * 4
    m[0] = ((rp == 0) & (cp == 0)).astype(dtype)[None, :, :, None]
    m[1] = ((rp == 0) & (cp == 1)).astype(dtype)[None, :, :, None]
    m[2] = ((rp == 1) & (cp == 0)).astype(dtype)[None, :, :, None]
    m[3] = ((rp == 1) & (cp == 1)).astype(dtype)[None, :, :, None]
    ones = jnp.ones((1, h, w, q), dtype=dtype)

    def build(order):
        return jnp.concatenate([ones * m[i] for i in order], axis=-1)

    mask_0 = build((0, 1, 2, 3))
    mask_1 = build((3, 2, 1, 0))
    mask_2 = build((2, 3, 0, 1))
    mask_3 = build((1, 0, 3, 2))
    return mask_0, mask_1, mask_2, mask_3


def fold_quarters(x):
    """Sum four channel quarters: (..., C) -> (..., C/4)
    (common_model.py:133-136 single_part_for_writing_4x)."""
    c = x.shape[-1]
    q = c // 4
    return (x[..., :q] + x[..., q:2 * q]) + (x[..., 2 * q:3 * q] + x[..., 3 * q:])


def fold_halves(x):
    """Sum two channel halves (common_model.py:138-141)."""
    return _fold_halves(x)
