"""Differentiable training forwards for the codecs.

The reference ships runnable training only for the oldest codec (DCVC,
reference: DCVC-family/DCVC/train_*.py); the RT models are released as
checkpoints.  This module provides RD-training forward passes for the
TPU models: the RT pair (DMCI/DMC) with straight-through-estimator
rounding, and the reference's own training target DCVC with its exact
staged loss (ME warmup -> recon -> +bits -> end-to-end,
DCVC_net.py:638-666).  Bit estimates are differentiable (factorized
prior for z, conditional Gaussian/Laplace for y), so the framework is
trainable end-to-end on TPU.
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


# ---------------------------------------------------------------------------
# DCVC training forward — the reference's own training target
# (staged loss DCVC_net.py:638-666; training quantization is additive
# uniform noise, :597-613)
# ---------------------------------------------------------------------------

def laplace_bits(x_res, scales):
    """Differentiable Laplace rate: -log2 P([x-0.5, x+0.5]) under
    Laplace(0, b) (reference feature_probs_based_sigma,
    DCVC_net.py:218-260 — DCVC rates y/mv_y with a Laplace)."""
    b = jnp.clip(scales, 1e-9, None)
    def cdf(v):
        return 0.5 + 0.5 * jnp.sign(v) * (-jnp.expm1(-jnp.abs(v) / b))
    probs = jnp.clip(cdf(x_res + 0.5) - cdf(x_res - 0.5), 1e-9, None)
    return -jnp.log2(probs)


def _laplace_scales(logscale):
    """Reference scale transform: exp(softplus(ls + 2.3) - 2.3), keeping
    log-scale > -2.3 (DCVC_net.py:584-585)."""
    return jnp.exp(jax.nn.softplus(logscale + 2.3) - 2.3)


def dcvc_forward(params, x, ref_frame, rng, stage=4, quant_mode="noise"):
    """One P-frame DCVC RD forward with the reference's staged outputs.

    Mirrors DCVC_net.forward (reference DCVC_net.py:558-666): SpyNet
    flow -> mv codec (factorized-prior z_mv + AR/hyper Laplace on mv_y)
    -> feature-domain motion compensation -> contextual codec (temporal
    prior + hyper + AR context, Laplace on y).  Returns every term the
    staged losses need; compose with stage_loss_dcvc.
    """
    from ..models.dcvc import (mv_encoder, mv_decoder_part1, mv_refine,
                               motion_compensation, contextual_encoder,
                               contextual_decoder, prior_enc, prior_dec,
                               temporal_prior_enc, entropy_params_apply,
                               masked_conv_apply, spynet_apply)
    from ..ops.warp import flow_warp
    p = params
    n_pix = x.shape[0] * x.shape[1] * x.shape[2]
    rngs = jax.random.split(rng, 4)

    est_mv = spynet_apply(p["optic_flow"], x, ref_frame)
    mv_y = mv_encoder(p, est_mv)
    mv_z = prior_enc(p["mv_prior_enc"], mv_y)
    mv_z_hat = _quant(mv_z, rngs[0], quant_mode)
    params_mv = prior_dec(p["mv_prior_dec"], mv_z_hat)
    mv_y_hat = _quant(mv_y, rngs[1], quant_mode)
    ctx_params_mv = masked_conv_apply(p["auto_regressive_mv"], mv_y_hat)
    g_mv = entropy_params_apply(
        p["entropy_parameters_mv"],
        jnp.concatenate((params_mv, ctx_params_mv), axis=-1))
    c_mv = g_mv.shape[-1] // 2
    means_mv = g_mv[..., :c_mv]
    scales_mv = _laplace_scales(g_mv[..., c_mv:])

    mv_up = mv_decoder_part1(p, mv_y_hat)
    mv_ref = mv_refine(p, ref_frame, mv_up)
    ctx = motion_compensation(p, ref_frame, mv_ref)
    # stage-1 target: pixel-domain warp of the reference
    # (pixel_motioncompensation, DCVC_net.py:193-195, 590)
    pixel_rec = flow_warp(ref_frame, mv_ref)

    temporal = temporal_prior_enc(p, ctx)
    y = contextual_encoder(p, x, ctx)
    z = prior_enc(p["prior_enc"], y)
    z_hat = _quant(z, rngs[2], quant_mode)
    hp = prior_dec(p["prior_dec"], z_hat)
    y_hat = _quant(y, rngs[3], quant_mode)
    ctx_params = masked_conv_apply(p["auto_regressive"], y_hat)
    g = entropy_params_apply(
        p["entropy_parameters"],
        jnp.concatenate((temporal, hp, ctx_params), axis=-1))
    c_y = g.shape[-1] // 2
    means = g[..., :c_y]
    scales = _laplace_scales(g[..., c_y:])

    x_hat = contextual_decoder(p, y_hat, ctx)

    bpp_y = jnp.sum(laplace_bits(y_hat - means, scales)) / n_pix
    bpp_mv_y = jnp.sum(laplace_bits(mv_y_hat - means_mv,
                                    scales_mv)) / n_pix
    bpp_z = jnp.sum(bit_estimator_bits(p["bit_estimator_z"], z_hat,
                                       0)) / n_pix
    bpp_mv_z = jnp.sum(bit_estimator_bits(p["bit_estimator_z_mv"],
                                          mv_z_hat, 0)) / n_pix

    return {"x_hat": x_hat, "pixel_rec": pixel_rec,
            "mse": jnp.mean(jnp.square(x_hat - x)),
            "warp_mse": jnp.mean(jnp.square(pixel_rec - x)),
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp_mv_y": bpp_mv_y,
            "bpp_mv_z": bpp_mv_z,
            "bpp": bpp_y + bpp_z + bpp_mv_y + bpp_mv_z}


# ---------------------------------------------------------------------------
# DCVC-TCM training forward (reference video_net_dmc.py:430-509:
# noise-free rounding, Laplace rate on y/mv_y, factorized z/mv_z)
# ---------------------------------------------------------------------------

def dmc_tcm_forward_one_frame(params, x, ref_frame, ref_feature, rng,
                              quant_mode="ste"):
    """One P-frame TCM RD forward.  The reference trains TCM-style
    models with hard rounding in the forward (quant = round,
    video_net_dmc.py:427-428); here the rounding is an STE so gradients
    flow (quant_mode='noise' gives the additive-noise surrogate
    instead).  Returns dict(x_hat, feature, mse, warp_mse, bpp terms).
    """
    from ..models import dmc_tcm as T
    p = params
    n_pix = x.shape[0] * x.shape[1] * x.shape[2]
    rngs = jax.random.split(rng, 4)

    from ..layers.blocks_hem import hem_spynet_apply
    est_mv = hem_spynet_apply(p["optic_flow"], x, ref_frame)
    mv_y = T.mv_encoder(p, est_mv)
    mv_z = T.mv_prior_enc(p, mv_y)
    mv_z_hat = _quant(mv_z, rngs[0], quant_mode)
    mv_scales, mv_means = T._stage_mv_params(p, mv_z_hat)
    mv_y_q = _quant(mv_y - mv_means, rngs[1], quant_mode)
    mv_y_hat = mv_y_q + mv_means

    mv_hat = T.mv_decoder(p, mv_y_hat)
    c1, c2, c3, warp_frame = T._stage_motion_comp(p, mv_hat, ref_frame,
                                                  ref_feature)

    y = T.contextual_encoder(p, x, c1, c2, c3)
    z = T.hyper_enc(p, y)
    z_hat = _quant(z, rngs[2], quant_mode)
    scales, means = T._stage_y_params(p, z_hat, c1, c2, c3)
    y_q = _quant(y - means, rngs[3], quant_mode)
    y_hat = y_q + means

    feature, x_hat = T._stage_recon(p, y_hat, c1, c2, c3)

    # Laplace rate with the reference's sigma clamp (:301-307)
    bpp_y = jnp.sum(laplace_bits(y_q, jnp.clip(scales, 1e-5, None))) \
        / n_pix
    bpp_mv_y = jnp.sum(laplace_bits(
        mv_y_q, jnp.clip(mv_scales, 1e-5, None))) / n_pix
    bpp_z = jnp.sum(bit_estimator_bits(p["bit_estimator_z"], z_hat,
                                       0)) / n_pix
    bpp_mv_z = jnp.sum(bit_estimator_bits(p["bit_estimator_z_mv"],
                                          mv_z_hat, 0)) / n_pix

    return {"x_hat": x_hat, "feature": feature,
            "mse": jnp.mean(jnp.square(x_hat - x)),
            "warp_mse": jnp.mean(jnp.square(warp_frame - x)),
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp_mv_y": bpp_mv_y,
            "bpp_mv_z": bpp_mv_z,
            "bpp": bpp_y + bpp_z + bpp_mv_y + bpp_mv_z}


# ---------------------------------------------------------------------------
# DCVC-FM training forward — the family's one-model wide-QP novelty
# (reference DCVC-FM/src/models/common_model.py:37-52: every quant bank
# is log-interpolated between LEARNED min/max anchors over 64 QPs, and
# q_index is a TRACED argument, so a single set of weights trains across
# the whole rate range; the reference ships no FM trainer — this
# demonstrates the novelty is trainable in this framework)
# ---------------------------------------------------------------------------

def _fm_masked_4x(y_div, scales, means, spatial_fn, params_prior):
    """Four-pass quadtree STE rate/recon shared by FM's mv and y latents
    (mirrors models/dmc_fm._spatial_pass + prior_stages.pass_core, with
    the coder's hard round replaced by a straight-through estimator and
    the table rate replaced by the differentiable Gaussian)."""
    _, h, w, c = y_div.shape
    masks = F.checkerboard_masks_4x(h, w, c, y_div.dtype)
    bits = 0.0
    so_far = jnp.zeros_like(y_div)
    for k in range(4):
        if k > 0:
            scales, means = spatial_fn(k, so_far, params_prior)
        mask = masks[k]
        y_res = (y_div - means * mask) * mask
        y_q = ste_round(y_res)
        # price the QUANTIZED residual (see dmci_forward note)
        so_far = so_far + y_q + means * mask
        bits = bits + jnp.sum(gaussian_bits(y_q, scales * mask) * mask)
    return so_far, bits


def dmc_fm_forward_one_frame(params, x, ref_frame, ref_feature,
                             ref_mv_feature, ref_y, ref_mv_y, q_index,
                             rng, quant_mode="ste", fa_idx=0):
    """One P-frame FM RD forward at a (traced) q_index in [0, 64).

    ref_feature/ref_mv_feature/ref_y/ref_mv_y are the propagated DPB
    entries (None on the first P-frame after an intra — the adaptor-I /
    fusion-adaptor-0 path).  Returns the full DPB for cascading plus
    differentiable rate terms.  Mirrors models/dmc_fm.compress_frame
    (reference video_model.py forward) with STE/noise quantization.
    """
    from ..models import dmc_fm as FMM
    from ..layers.blocks_fm import spynet_apply as fm_spynet
    p = params
    n_pix = x.shape[1] * x.shape[2]
    rngs = jax.random.split(rng, 2)
    steady = ref_feature is not None

    # --- motion branch -----------------------------------------------------
    q_mv_enc = FMM.get_curr_q(p["mv_y_q_enc"], q_index).astype(x.dtype)
    est_mv = fm_spynet(p["optic_flow"], x, ref_frame)
    mv_y = FMM.mv_encoder(p, est_mv,
                          ref_mv_feature if steady else None, q_mv_enc)
    mv_z = FMM.hyper_enc_apply(p["mv_hyper_enc"], C.pad_for_y(mv_y))
    mv_z_hat = _quant(mv_z, rngs[0], quant_mode)
    bits_mv_z = jnp.sum(bit_estimator_bits(p["bit_estimator_z_mv"],
                                           mv_z_hat, 0))
    mv_params = FMM._stage_mv_prior(
        p, mv_z_hat.astype(x.dtype), ref_mv_y if steady else None,
        mv_y.shape[1], mv_y.shape[2])
    mv_y_div, mv_q_dec, mv_scales, mv_means = \
        C.separate_prior_video_encoding(mv_params, mv_y)
    mv_so_far, bits_mv_y = _fm_masked_4x(
        mv_y_div, mv_scales, mv_means,
        lambda k, sf, prm: FMM._stage_mv_spatial(p, k, sf, prm),
        mv_params)
    mv_y_hat = mv_so_far * mv_q_dec
    mv_hat, mv_feature = FMM._stage_mv_dec(p, mv_y_hat, q_index)
    c1, c2, c3, warpframe = FMM._stage_motion_comp(
        p, mv_hat, ref_frame, ref_feature if steady else None, fa_idx)

    # --- contextual branch ---------------------------------------------
    q_y_enc = FMM.get_curr_q(p["y_q_enc"], q_index).astype(x.dtype)
    y = FMM.contextual_encoder(p, x, c1, c2, c3, q_y_enc)
    z = FMM.hyper_enc_apply(p["hyper_enc"], C.pad_for_y(y))
    z_hat = _quant(z, rngs[1], quant_mode)
    bits_z = jnp.sum(bit_estimator_bits(p["bit_estimator_z"], z_hat, 0))
    y_params = FMM._stage_ctx_prior(
        p, z_hat.astype(x.dtype), c3, ref_y if steady else None,
        y.shape[1], y.shape[2])
    y_div, q_dec, scales, means = \
        C.separate_prior_video_encoding(y_params, y)
    y_so_far, bits_y = _fm_masked_4x(
        y_div, scales, means,
        lambda k, sf, prm: FMM._stage_y_spatial(p, k, sf, prm),
        y_params)
    y_hat = y_so_far * q_dec
    x_hat, feature = FMM._stage_recon(p, y_hat, c1, c2, c3, q_index)

    return {"x_hat": x_hat, "feature": feature,
            "mv_feature": mv_feature, "y_hat": y_hat,
            "mv_y_hat": mv_y_hat,
            "mse": jnp.mean(jnp.square(x_hat - x)),
            "warp_mse": jnp.mean(jnp.square(warpframe - x)),
            "bpp_y": bits_y / n_pix, "bpp_z": bits_z / n_pix,
            "bpp_mv_y": bits_mv_y / n_pix,
            "bpp_mv_z": bits_mv_z / n_pix,
            "bpp": (bits_y + bits_z + bits_mv_y + bits_mv_z) / n_pix}


#: parameter subtrees of the motion branch, frozen in stages 2-3
#: (reference train_dcvc_sq_2to7_data_ddp.py:174-192)
DCVC_MOTION_SUBTREES = (
    "optic_flow", "mv_enc", "mv_dec1", "mv_dec2", "mv_prior_enc",
    "mv_prior_dec", "entropy_parameters_mv", "auto_regressive_mv",
    "bit_estimator_z_mv",
)


def stage_loss_dcvc(out, lmbda, stage):
    """The reference's four-stage loss (DCVC_net.py:638-666):
      1: L_me  = lmbda*mse(warp, x) + bpp_mv_y + bpp_mv_z
      2: L_rec = lmbda*mse(x_hat, x)            (motion frozen)
      3: L_con = lmbda*mse(x_hat, x) + bpp_y + bpp_z   (motion frozen)
      4: L_all = lmbda*mse(x_hat, x) + bpp
    """
    if stage == 1:
        return lmbda * out["warp_mse"] + out["bpp_mv_y"] \
            + out["bpp_mv_z"]
    if stage == 2:
        return lmbda * out["mse"]
    if stage == 3:
        return lmbda * out["mse"] + out["bpp_y"] + out["bpp_z"]
    return lmbda * out["mse"] + out["bpp"]
