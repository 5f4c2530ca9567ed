"""Differentiable training forwards for the RT codecs.

The reference only ships training code for the oldest codec (DCVC,
reference: DCVC-family/DCVC/train_*.py); the RT models are released as
checkpoints.  This module provides the RD-training forward passes for the
TPU DMCI/DMC models: straight-through-estimator rounding at the
quantization points and differentiable bit estimates (factorized prior
for z, conditional Gaussian for y), so the whole framework is trainable
end-to-end on TPU.
"""

import jax
import jax.numpy as jnp

from ..models import dmci as MI
from ..models import dmc as MV
from ..models import common as C
from ..ops import fused as F
from ..layers import blocks as L
from ..entropy.models import bit_estimator_bits, gaussian_bits


def ste_round(x):
    """Straight-through round: identity gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quant_noise(x, rng):
    """Additive-uniform-noise quantization surrogate."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def _quant(x, rng, mode):
    if mode == "noise":
        return quant_noise(x, rng)
    return ste_round(x)


# ---------------------------------------------------------------------------
# DMCI training forward
# ---------------------------------------------------------------------------

def dmci_forward(params, x, qp, rng, quant_mode="ste"):
    """One-image RD forward.  Returns dict(x_hat, bpp, bpp_y, bpp_z, mse).
    """
    p = params
    n_pix = x.shape[1] * x.shape[2]
    rngs = jax.random.split(rng, 2)

    q_enc = p["q_scale_enc"][qp][None, None, None, :].astype(x.dtype)
    y = MI.intra_encoder(p, x, q_enc)
    y_pad = C.pad_for_y(y)
    z = MI.hyper_encoder(p, y_pad)
    z_hat = _quant(z, rngs[0], quant_mode)

    bits_z = bit_estimator_bits(p["bit_estimator_z"], z_hat, qp)

    prior = MI.hyper_decoder(p, z_hat)
    prior = MI.prior_fusion(p, prior)
    prior = prior[:, : y.shape[1], : y.shape[2], :]
    q_enc_p, q_dec_p, scales, means, = C.separate_prior_image(prior)
    reduced = L.conv_apply(p["reduction"], prior)

    y = y * q_enc_p
    _, h, w, c = y.shape
    masks = F.checkerboard_masks_4x(h, w, c, y.dtype)

    bits_y = 0.0
    y_hat_so_far = jnp.zeros_like(y)
    for k in range(4):
        if k > 0:
            sm = MI.spatial_prior(
                p, p[f"adaptor_{k}"],
                jnp.concatenate((y_hat_so_far, reduced), axis=-1))
            half = sm.shape[-1] // 2
            scales, means = sm[..., :half], sm[..., half:]
        mask = masks[k]
        y_res = (y - means * mask) * mask
        y_q = ste_round(y_res)
        # price the QUANTIZED residual (gradients flow through the STE):
        # the coder charges -log2 P([y_q-0.5, y_q+0.5]); pricing the
        # continuous y_res instead systematically underestimates the
        # stream (measured ~1.5x on y at trained checkpoints)
        y_hat_k = y_q + means * mask
        y_hat_so_far = y_hat_so_far + y_hat_k
        bits_y = bits_y + jnp.sum(gaussian_bits(y_q, scales * mask) * mask)

    y_hat = y_hat_so_far * q_dec_p
    q_dec = p["q_scale_dec"][qp][None, None, None, :].astype(x.dtype)
    x_hat = jnp.clip(MI.intra_decoder(p, y_hat, q_dec), 0.0, 1.0)

    mse = jnp.mean(jnp.square(x_hat - x))
    bpp_y = bits_y / n_pix
    bpp_z = jnp.sum(bits_z) / n_pix
    return {"x_hat": x_hat, "mse": mse, "bpp_y": bpp_y, "bpp_z": bpp_z,
            "bpp": bpp_y + bpp_z}


# ---------------------------------------------------------------------------
# DMC training forward (single P-frame given a reference)
# ---------------------------------------------------------------------------

def dmc_forward_one_frame(params, x, ref_frame, ref_feature, qp, rng,
                          quant_mode="ste"):
    """One P-frame RD forward.

    ref_frame: (1,H,W,3) pixel reference (used when ref_feature is None
    -> I-adaptor path); ref_feature: (1,H/8,W/8,256) or None.
    Returns dict(x_hat, feature, mse, bpp, ...).
    """
    p = params
    n_pix = x.shape[1] * x.shape[2]
    rngs = jax.random.split(rng, 2)

    if ref_feature is None:
        feature = MV._stage_adaptor_i(p, ref_frame)
    else:
        feature = MV._stage_adaptor_p(p, ref_feature)
    x1, ctx_t = MV._stage_fe_part1(p, feature, qp)
    ctx = MV._stage_fe_part2(p, x1)

    y, z_hat_rounded, _ = None, None, None
    feat = F.space_to_depth(x, 8)
    feat = L.conv_apply(p["enc_conv1"], feat)
    feat = L.depth_conv_block_apply(p["enc_conv2"][0],
                                    jnp.concatenate((feat, ctx), axis=-1))
    feat = L.depth_conv_block_apply(p["enc_conv2"][1], feat)
    feat = L.depth_conv_block_apply(
        p["enc_conv3"], feat,
        quant_step=p["q_encoder"][qp][None, None, None, :].astype(x.dtype))
    y = L.conv_apply(p["enc_down"], feat, stride=2, padding=1)
    z = MV.hyper_encoder(p, C.pad_for_y(y))
    z_hat = _quant(z, rngs[0], quant_mode)
    bits_z = bit_estimator_bits(p["bit_estimator_z"], z_hat, qp)

    prior = MV._stage_prior(p, z_hat, ctx_t)
    y, q_dec, scales, means = C.separate_prior_video_encoding(prior, y)

    _, h, w, c = y.shape
    masks = F.checkerboard_masks_2x(h, w, c, y.dtype)
    bits_y = 0.0
    y_hats = []
    for k in range(2):
        if k > 0:
            scales, means = MV._stage_spatial(p, y_hats[0], prior)
        mask = masks[k]
        y_res = (y - means * mask) * mask
        y_q = ste_round(y_res)
        # price the QUANTIZED residual (gradients flow through the STE):
        # the coder charges -log2 P([y_q-0.5, y_q+0.5]); pricing the
        # continuous y_res instead systematically underestimates the
        # stream (measured ~1.5x on y at trained checkpoints)
        y_hats.append(y_q + means * mask)
        bits_y = bits_y + jnp.sum(gaussian_bits(y_q, scales * mask) * mask)

    y_hat = (y_hats[0] + y_hats[1]) * q_dec
    feature_out = MV._stage_feature(p, y_hat, ctx, qp)
    x_hat = MV._stage_recon_x(p, feature_out, qp)

    mse = jnp.mean(jnp.square(x_hat - x))
    bpp_y = bits_y / n_pix
    bpp_z = jnp.sum(bits_z) / n_pix
    return {"x_hat": x_hat, "feature": feature_out, "mse": mse,
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp": bpp_y + bpp_z}
