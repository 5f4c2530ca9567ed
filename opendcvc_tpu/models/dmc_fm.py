"""DCVC-FM — feature-modulated wide-range video codec, TPU-native.

Re-design of the reference DCVC-FM (reference:
DCVC-family/DCVC-FM/src/models/video_model.py): explicit motion coding
(SpyNet optical flow -> coded motion latent -> bilinear-warp motion
compensation with OffsetDiversity refinement), multi-scale feature
propagation, latent refs (ref_y, ref_mv_y) fused into the priors,
four-part quadtree entropy coding for both mv and contextual latents,
and a 0-63 continuous QP realized by log-interpolating each quant bank
between learned min/max (common_model.py:37-51) — one model for the full
rate range and intra-period -1 via fa_idx-cycled feature adaptors.

Stage discipline matches the other codecs: every subgraph evaluated by
both encoder and decoder is one shared jitted function, so the DPB
(frame, feature, mv_feature, y, mv_y) propagates bit-identically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_fm as FM
from ..layers.blocks import conv_init, conv_apply
from ..ops import fused as F
from ..ops.warp import flow_warp, bilinear_resize_2x
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C

G_CH_1X = 48
G_CH_2X = 64
G_CH_4X = 96
G_CH_8X = 96
G_CH_16X = 128
G_CH_Z = 64
CH_MV = 64
QP_NUM = 64


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def dmc_fm_init(key):
    ks = iter(jax.random.split(key, 96))
    p = {}
    p["optic_flow"] = FM.spynet_init(next(ks))

    # OffsetDiversity (video_model.py:26-63)
    aux = G_CH_1X + 3 + 2
    p["align"] = {
        "off1": conv_init(next(ks), aux, G_CH_2X, 3),
        "off2": conv_init(next(ks), G_CH_2X, G_CH_2X, 3),
        "off3": conv_init(next(ks), G_CH_2X, 3 * 16 * 2, 3),
        "fusion": conv_init(next(ks), G_CH_1X * 2, G_CH_1X, 1, groups=16),
    }

    # MvEnc / MvDec
    p["mv_enc"] = {
        "enc1_rbs": FM.res_block_stride_init(next(ks), 2, CH_MV),
        "enc1_dcb": FM.dcb4_init(next(ks), CH_MV, CH_MV),
        "enc2": FM.res_block_stride_init(next(ks), CH_MV, CH_MV),
        "adaptor_0": FM.dcb4_init(next(ks), CH_MV, CH_MV),
        "adaptor_1": FM.dcb4_init(next(ks), CH_MV * 2, CH_MV),
        "enc3_rbs": FM.res_block_stride_init(next(ks), CH_MV, CH_MV),
        "enc3_dcb": FM.dcb4_init(next(ks), CH_MV, CH_MV),
        "enc3_down": conv_init(next(ks), CH_MV, CH_MV, 3),
    }
    p["mv_dec"] = {
        "dec1": [FM.dcb4_init(next(ks), CH_MV, CH_MV),
                 FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
                 FM.dcb4_init(next(ks), CH_MV, CH_MV),
                 FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
                 FM.dcb4_init(next(ks), CH_MV, CH_MV)],
        "dec2": FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
        "dec3_dcb": FM.dcb4_init(next(ks), CH_MV, CH_MV),
        "dec3_subpel": FM.subpel1x1_init(next(ks), CH_MV, 2),
    }

    # mv hyper + priors
    p["mv_hyper_enc"] = {
        "dcb": FM.dcb4_init(next(ks), CH_MV, CH_MV),
        "c1": conv_init(next(ks), CH_MV, CH_MV, 3),
        "c2": conv_init(next(ks), CH_MV, CH_MV, 3),
    }
    p["mv_hyper_dec"] = [FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
                         FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
                         FM.dcb4_init(next(ks), CH_MV, CH_MV)]
    p["mv_fusion_adaptor_0"] = FM.dcb_init(next(ks), CH_MV, CH_MV * 2)
    p["mv_fusion_adaptor_1"] = FM.dcb_init(next(ks), CH_MV * 2, CH_MV * 2)
    p["mv_fusion"] = [FM.dcb_init(next(ks), CH_MV * 2, CH_MV * 3),
                      FM.dcb_init(next(ks), CH_MV * 3, CH_MV * 3)]
    p["mv_sp_adaptor_1"] = conv_init(next(ks), CH_MV * 4, CH_MV * 3, 1)
    p["mv_sp_adaptor_2"] = conv_init(next(ks), CH_MV * 4, CH_MV * 3, 1)
    p["mv_sp_adaptor_3"] = conv_init(next(ks), CH_MV * 4, CH_MV * 3, 1)
    p["mv_spatial_prior"] = [FM.dcb_init(next(ks), CH_MV * 3, CH_MV * 3),
                             FM.dcb_init(next(ks), CH_MV * 3, CH_MV * 3),
                             FM.dcb_init(next(ks), CH_MV * 3, CH_MV * 2)]

    # feature pipeline
    p["feature_adaptor_I"] = conv_init(next(ks), 3, G_CH_1X, 3)
    p["feature_adaptor"] = [conv_init(next(ks), G_CH_1X, G_CH_1X, 1)
                            for _ in range(3)]
    p["feature_extractor"] = {
        "c1": conv_init(next(ks), G_CH_1X, G_CH_1X, 3),
        "r1": FM.res_block_init(next(ks), G_CH_1X, G_CH_1X),
        "c2": conv_init(next(ks), G_CH_1X, G_CH_2X, 3),
        "r2": FM.res_block_init(next(ks), G_CH_2X, G_CH_2X),
        "c3": conv_init(next(ks), G_CH_2X, G_CH_4X, 3),
        "r3": FM.res_block_init(next(ks), G_CH_4X, G_CH_4X),
    }
    p["ctx_fusion"] = {
        "c3_up": conv_init(next(ks), G_CH_4X, G_CH_2X * 4, 3),
        "r3_up": FM.res_block_init(next(ks), G_CH_2X, G_CH_2X),
        "c3_out": conv_init(next(ks), G_CH_4X, G_CH_4X, 3),
        "r3_out": FM.res_block_init(next(ks), G_CH_4X, G_CH_4X),
        "c2_up": conv_init(next(ks), G_CH_2X * 2, G_CH_1X * 4, 3),
        "r2_up": FM.res_block_init(next(ks), G_CH_1X, G_CH_1X),
        "c2_out": conv_init(next(ks), G_CH_2X * 2, G_CH_2X, 3),
        "r2_out": FM.res_block_init(next(ks), G_CH_2X, G_CH_2X),
        "c1_out": conv_init(next(ks), G_CH_1X * 2, G_CH_1X, 3),
        "r1_out": FM.res_block_init(next(ks), G_CH_1X, G_CH_1X),
    }

    # contextual enc/dec
    p["ctx_enc"] = {
        "c1": conv_init(next(ks), G_CH_1X + 3, G_CH_2X, 3),
        "r1": FM.dcb4_init(next(ks), G_CH_2X * 2, G_CH_2X * 2),
        "c2": conv_init(next(ks), G_CH_2X * 2, G_CH_4X, 3),
        "r2": FM.dcb4_init(next(ks), G_CH_4X * 2, G_CH_4X * 2),
        "c3": conv_init(next(ks), G_CH_4X * 2, G_CH_8X, 3),
        "c4": conv_init(next(ks), G_CH_8X, G_CH_16X, 3),
    }
    p["ctx_dec"] = {
        "up1": conv_init(next(ks), G_CH_16X, G_CH_8X * 4, 3),
        "up2": conv_init(next(ks), G_CH_8X, G_CH_4X * 4, 3),
        "r1": FM.dcb4_init(next(ks), G_CH_4X * 2, G_CH_4X * 2),
        "up3": conv_init(next(ks), G_CH_4X * 2, G_CH_2X * 4, 3),
        "r2": FM.dcb4_init(next(ks), G_CH_2X * 2, G_CH_2X * 2),
        "up4": conv_init(next(ks), G_CH_2X * 2, 32 * 4, 3),
    }
    p["recon"] = {
        "first": conv_init(next(ks), G_CH_1X + 32, G_CH_1X, 3),
        "unet1": FM.unet2_init(next(ks), G_CH_1X, G_CH_1X),
        "unet2": FM.unet2_init(next(ks), G_CH_1X, G_CH_1X),
        "head": conv_init(next(ks), G_CH_1X, 3, 3),
    }

    # contextual hyper + priors
    p["hyper_enc"] = {
        "dcb": FM.dcb4_init(next(ks), G_CH_16X, G_CH_Z),
        "c1": conv_init(next(ks), G_CH_Z, G_CH_Z, 3),
        "c2": conv_init(next(ks), G_CH_Z, G_CH_Z, 3),
    }
    p["hyper_dec"] = [FM.res_block_upsample_init(next(ks), G_CH_Z, G_CH_Z),
                      FM.res_block_upsample_init(next(ks), G_CH_Z, G_CH_Z),
                      FM.dcb4_init(next(ks), G_CH_Z, G_CH_16X)]
    p["temporal_prior"] = {
        "c1": conv_init(next(ks), G_CH_4X, G_CH_8X, 3),
        "c2": conv_init(next(ks), G_CH_8X, G_CH_16X, 3),
    }
    p["y_fusion_adaptor_0"] = FM.dcb_init(next(ks), G_CH_16X * 2,
                                          G_CH_16X * 3)
    p["y_fusion_adaptor_1"] = FM.dcb_init(next(ks), G_CH_16X * 3,
                                          G_CH_16X * 3)
    p["y_fusion"] = [FM.dcb_init(next(ks), G_CH_16X * 3, G_CH_16X * 3),
                     FM.dcb_init(next(ks), G_CH_16X * 3, G_CH_16X * 3)]
    p["y_sp_adaptor_1"] = conv_init(next(ks), G_CH_16X * 4, G_CH_16X * 3, 1)
    p["y_sp_adaptor_2"] = conv_init(next(ks), G_CH_16X * 4, G_CH_16X * 3, 1)
    p["y_sp_adaptor_3"] = conv_init(next(ks), G_CH_16X * 4, G_CH_16X * 3, 1)
    p["y_spatial_prior"] = [FM.dcb_init(next(ks), G_CH_16X * 3, G_CH_16X * 3),
                            FM.dcb_init(next(ks), G_CH_16X * 3, G_CH_16X * 3),
                            FM.dcb_init(next(ks), G_CH_16X * 3, G_CH_16X * 2)]

    # min/max quant anchors (log-interpolated over 64 QPs)
    p["mv_y_q_enc"] = jnp.ones((2,))
    p["mv_y_q_dec"] = jnp.ones((2,))
    p["y_q_enc"] = jnp.ones((2,))
    p["y_q_dec"] = jnp.ones((2,))

    p["bit_estimator_z"] = bit_estimator_init(next(ks), 1, G_CH_Z)
    p["bit_estimator_z_mv"] = bit_estimator_init(next(ks), 1, CH_MV)
    return p


# ---------------------------------------------------------------------------
# sub-network applies
# ---------------------------------------------------------------------------

def get_curr_q(anchors, q_index, qp_num=QP_NUM):
    """Log-interpolate between learned (min, max) anchors
    (common_model.py:37-51)."""
    min_q = anchors[0]
    max_q = anchors[1]
    step = (jnp.log(max_q) - jnp.log(min_q)) / (qp_num - 1)
    return jnp.exp(jnp.log(min_q) + step * q_index)


def _seq(apply_fn, plist, x):
    for bp in plist:
        x = apply_fn(bp, x)
    return x


def mv_encoder(p, est_mv, ref_mv_feature, q):
    e = p["mv_enc"]
    out = FM.res_block_stride_apply(e["enc1_rbs"], est_mv)
    out = FM.dcb4_apply(e["enc1_dcb"], out)
    out = out * q
    out = FM.res_block_stride_apply(e["enc2"], out)
    if ref_mv_feature is None:
        out = FM.dcb4_apply(e["adaptor_0"], out)
    else:
        out = FM.dcb4_apply(e["adaptor_1"],
                            jnp.concatenate((out, ref_mv_feature), axis=-1))
    out = FM.res_block_stride_apply(e["enc3_rbs"], out)
    out = FM.dcb4_apply(e["enc3_dcb"], out)
    return conv_apply(e["enc3_down"], out, stride=2, padding=1)


def mv_decoder(p, mv_y_hat, q):
    d = p["mv_dec"]
    feat = FM.dcb4_apply(d["dec1"][0], mv_y_hat)
    feat = FM.res_block_upsample_apply(d["dec1"][1], feat)
    feat = FM.dcb4_apply(d["dec1"][2], feat)
    feat = FM.res_block_upsample_apply(d["dec1"][3], feat)
    feat = FM.dcb4_apply(d["dec1"][4], feat)
    out = FM.res_block_upsample_apply(d["dec2"], feat)
    out = out * q
    out = FM.dcb4_apply(d["dec3_dcb"], out)
    mv = FM.subpel1x1_apply(d["dec3_subpel"], out)
    return mv, feat


def hyper_enc_apply(hp, y_pad):
    out = FM.dcb4_apply(hp["dcb"], y_pad)
    out = FM.lrelu(conv_apply(hp["c1"], out, stride=2, padding=1), 0.01)
    return conv_apply(hp["c2"], out, stride=2, padding=1)


def feature_extractor(p, feature):
    fe = p["feature_extractor"]
    l1 = FM.res_block_apply(fe["r1"], conv_apply(fe["c1"], feature,
                                                 padding=1))
    l2 = FM.res_block_apply(fe["r2"], conv_apply(fe["c2"], l1, stride=2,
                                                 padding=1))
    l3 = FM.res_block_apply(fe["r3"], conv_apply(fe["c3"], l2, stride=2,
                                                 padding=1))
    return l1, l2, l3


def context_fusion(p, c1, c2, c3):
    from ..ops.fused import depth_to_space
    f = p["ctx_fusion"]
    c3_up = depth_to_space(conv_apply(f["c3_up"], c3, padding=1), 2)
    c3_up = FM.res_block_apply(f["r3_up"], c3_up)
    c3_out = FM.res_block_apply(f["r3_out"],
                                conv_apply(f["c3_out"], c3, padding=1))
    cat32 = jnp.concatenate((c3_up, c2), axis=-1)
    c2_up = depth_to_space(conv_apply(f["c2_up"], cat32, padding=1), 2)
    c2_up = FM.res_block_apply(f["r2_up"], c2_up)
    c2_out = FM.res_block_apply(f["r2_out"],
                                conv_apply(f["c2_out"], cat32, padding=1))
    cat21 = jnp.concatenate((c2_up, c1), axis=-1)
    c1_out = FM.res_block_apply(f["r1_out"],
                                conv_apply(f["c1_out"], cat21, padding=1))
    return c1 + c1_out, c2 + c2_out, c3 + c3_out


def offset_diversity(p, x, aux, flow, group_num=16, offset_num=2,
                     max_mag=40.0):
    """Group-wise multi-offset warping with masks, channel-for-channel
    faithful to the reference (video_model.py:26-63) so ported weights
    reproduce its numerics.  The reference's `.view(B*G*O, 2, H, W)`
    reads cat(o1, o2) PAIRWISE: unit u's (x, y) offsets are channels
    (2u, 2u+1), units ordered u = o * G + g (from `x.repeat(1, O, ...)`)
    — NOT o1 = all-x / o2 = all-y."""
    a = p["align"]
    b, h, w, c = x.shape
    out = FM.lrelu(conv_apply(a["off1"], aux, stride=2, padding=1), 0.1)
    out = FM.lrelu(conv_apply(a["off2"], out, padding=1), 0.1)
    out = conv_apply(a["off3"], out, padding=1)
    out = bilinear_resize_2x(out, up=True)
    go = group_num * offset_num
    cg = c // group_num
    # per-unit flow: tanh-scaled offsets + base flow tiled (fx, fy, ...)
    offs = max_mag * jnp.tanh(out[..., :2 * go]) \
        + jnp.tile(flow, (1, 1, 1, go))
    flows = offs.reshape(b, h, w, go, 2)
    flows = flows.transpose(0, 3, 1, 2, 4).reshape(b * go, h, w, 2)
    mask = jax.nn.sigmoid(out[..., 2 * go:])
    m = mask.transpose(0, 3, 1, 2).reshape(b * go, h, w, 1)
    # one batched warp over all units folded into the batch dim; unit
    # u = o * G + g warps group g's channels
    xg = x.reshape(b, h, w, group_num, cg)
    xg = jnp.tile(xg[:, :, :, None, :, :], (1, 1, 1, offset_num, 1, 1))
    xg = xg.transpose(0, 3, 4, 1, 2, 5).reshape(b * go, h, w, cg)
    warped = flow_warp(xg, flows) * m
    # back to the reference's channel layout (o, g, cg) for the grouped
    # fusion conv (`x.view(B, C*O, H, W)`)
    warped = warped.reshape(b, offset_num, group_num, h, w, cg)
    warped = warped.transpose(0, 3, 4, 1, 2, 5).reshape(
        b, h, w, offset_num * group_num * cg)
    return conv_apply(a["fusion"], warped, groups=group_num)


def contextual_encoder(p, x, c1, c2, c3, q):
    e = p["ctx_enc"]
    feat = conv_apply(e["c1"], jnp.concatenate((x, c1), axis=-1),
                      stride=2, padding=1)
    feat = FM.dcb4_apply(e["r1"], jnp.concatenate((feat, c2), axis=-1))
    feat = feat * q
    feat = conv_apply(e["c2"], feat, stride=2, padding=1)
    feat = FM.dcb4_apply(e["r2"], jnp.concatenate((feat, c3), axis=-1))
    feat = conv_apply(e["c3"], feat, stride=2, padding=1)
    return conv_apply(e["c4"], feat, stride=2, padding=1)


def contextual_decoder(p, y_hat, c2, c3, q):
    from ..ops.fused import depth_to_space
    d = p["ctx_dec"]
    feat = depth_to_space(conv_apply(d["up1"], y_hat, padding=1), 2)
    feat = depth_to_space(conv_apply(d["up2"], feat, padding=1), 2)
    feat = FM.dcb4_apply(d["r1"], jnp.concatenate((feat, c3), axis=-1))
    feat = depth_to_space(conv_apply(d["up3"], feat, padding=1), 2)
    feat = feat * q
    feat = FM.dcb4_apply(d["r2"], jnp.concatenate((feat, c2), axis=-1))
    return depth_to_space(conv_apply(d["up4"], feat, padding=1), 2)


def recon_generation(p, res, c1):
    # the reference passes the decoded residual as the FIRST cat operand
    # (recon_generation_net(recon_image_feature, context1))
    r = p["recon"]
    feat = conv_apply(r["first"], jnp.concatenate((res, c1), axis=-1),
                      padding=1)
    feat = FM.unet2_apply(r["unet1"], feat)
    feat = FM.unet2_apply(r["unet2"], feat)
    x_hat = conv_apply(r["head"], feat, padding=1)
    return feat, jnp.clip(x_hat, 0.0, 1.0)


# ---------------------------------------------------------------------------
# four-part prior stages (video variant: chunk-3 prior, no reduction)
# ---------------------------------------------------------------------------

GE_CFG_FM = None  # filled by DMCFM.update from its GaussianEncoder


def _fold_index_4x(scales, k, cfg):
    _, h, w, c = scales.shape
    masks = F.checkerboard_masks_4x(h, w, c, scales.dtype)
    scales_r = F.fold_quarters(scales * masks[k])
    smin, smax, lsm, recip = cfg
    indexes, _ = F.build_index_dec(scales_r, smin, smax, lsm, recip, None)
    return indexes


def _enc_mask_4x(y, scales, means, k):
    _, h, w, c = y.shape
    masks = F.checkerboard_masks_4x(h, w, c, y.dtype)
    _, y_q, y_hat, _ = F.process_with_mask(y, scales, means, masks[k], None)
    return F.fold_quarters(y_q).astype(jnp.int16), y_hat


def _dec_restore_4x(y_q_r, means, k):
    _, h, w, c = means.shape
    masks = F.checkerboard_masks_4x(h, w, c, means.dtype)
    return F.restore_y_4x(y_q_r, means, masks[k])


def _spatial_pass(adaptor_p, prior_list, y_hat_so_far, common_params):
    cat = jnp.concatenate((y_hat_so_far, common_params), axis=-1)
    h = conv_apply(adaptor_p, cat)
    out = _seq(FM.dcb_apply, prior_list, h)
    c = out.shape[-1] // 2
    return out[..., :c], out[..., c:]


# ---------------------------------------------------------------------------
# jit stage functions
# ---------------------------------------------------------------------------

def _stage_mv_enc(p, x, ref_frame, ref_mv_feature, q_index):
    q = get_curr_q(p["mv_y_q_enc"], q_index).astype(x.dtype)
    est_mv = FM.spynet_apply(p["optic_flow"], x, ref_frame)
    mv_y = mv_encoder(p, est_mv, ref_mv_feature, q)
    mv_z = hyper_enc_apply(p["mv_hyper_enc"], C.pad_for_y(mv_y))
    mv_z_hat, mv_z_int8 = F.round_and_to_int8(mv_z)
    return mv_y, mv_z_hat.astype(x.dtype), mv_z_int8


def _stage_mv_prior(p, mv_z_hat, ref_mv_y, y_h, y_w):
    mv_params = _seq(FM.res_block_upsample_apply, p["mv_hyper_dec"][:2],
                     mv_z_hat)
    mv_params = FM.dcb4_apply(p["mv_hyper_dec"][2], mv_params)
    mv_params = mv_params[:, :y_h, :y_w, :]
    if ref_mv_y is None:
        mv_params = FM.dcb_apply(p["mv_fusion_adaptor_0"], mv_params)
    else:
        mv_params = FM.dcb_apply(
            p["mv_fusion_adaptor_1"],
            jnp.concatenate((mv_params, ref_mv_y), axis=-1))
    return _seq(FM.dcb_apply, p["mv_fusion"], mv_params)


def _stage_mv_dec(p, mv_y_hat, q_index):
    q = get_curr_q(p["mv_y_q_dec"], q_index).astype(mv_y_hat.dtype)
    return mv_decoder(p, mv_y_hat, q)


def _stage_motion_comp(p, mv_hat, ref_frame, ref_feature, fa_idx):
    if ref_feature is None:
        feature = conv_apply(p["feature_adaptor_I"], ref_frame, padding=1)
    else:
        feature = conv_apply(p["feature_adaptor"][fa_idx], ref_feature)
    f1, f2, f3 = feature_extractor(p, feature)
    warpframe = flow_warp(ref_frame, mv_hat)
    mv2 = bilinear_resize_2x(mv_hat, up=False) / 2
    mv3 = bilinear_resize_2x(mv2, up=False) / 2
    c1_init = flow_warp(f1, mv_hat)
    aux = jnp.concatenate((c1_init, warpframe, mv_hat), axis=-1)
    c1 = offset_diversity(p, f1, aux, mv_hat)
    c2 = flow_warp(f2, mv2)
    c3 = flow_warp(f3, mv3)
    c1, c2, c3 = context_fusion(p, c1, c2, c3)
    return c1, c2, c3, warpframe


def _stage_ctx_enc(p, x, c1, c2, c3, q_index):
    q = get_curr_q(p["y_q_enc"], q_index).astype(x.dtype)
    y = contextual_encoder(p, x, c1, c2, c3, q)
    z = hyper_enc_apply(p["hyper_enc"], C.pad_for_y(y))
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_ctx_prior(p, z_hat, c3, ref_y, y_h, y_w):
    hier = _seq(FM.res_block_upsample_apply, p["hyper_dec"][:2], z_hat)
    hier = FM.dcb4_apply(p["hyper_dec"][2], hier)
    hier = hier[:, :y_h, :y_w, :]
    tp = p["temporal_prior"]
    temporal = FM.lrelu(conv_apply(tp["c1"], c3, stride=2, padding=1), 0.1)
    temporal = conv_apply(tp["c2"], temporal, stride=2, padding=1)
    if ref_y is None:
        params = FM.dcb_apply(p["y_fusion_adaptor_0"],
                              jnp.concatenate((temporal, hier), axis=-1))
    else:
        params = FM.dcb_apply(
            p["y_fusion_adaptor_1"],
            jnp.concatenate((temporal, hier, ref_y), axis=-1))
    return _seq(FM.dcb_apply, p["y_fusion"], params)


def _stage_recon(p, y_hat, c1, c2, c3, q_index):
    q = get_curr_q(p["y_q_dec"], q_index).astype(y_hat.dtype)
    res = contextual_decoder(p, y_hat, c2, c3, q)
    feature, x_hat = recon_generation(p, res, c1)
    return x_hat, feature


def _stage_mv_spatial(p, k, y_hat_so_far, common_params):
    return _spatial_pass(p[f"mv_sp_adaptor_{k}"], p["mv_spatial_prior"],
                         y_hat_so_far, common_params)


def _stage_y_spatial(p, k, y_hat_so_far, common_params):
    return _spatial_pass(p[f"y_sp_adaptor_{k}"], p["y_spatial_prior"],
                         y_hat_so_far, common_params)




# ---------------------------------------------------------------------------
# fused per-frame device-EC megastages
#
# Same design as DMC's (models/dmc.py): ONE compiled program per frame
# on each side.  All ten symbol planes (mv_z, four mv_y passes, z, four
# y passes) code back-to-back per lane with rANS state continuation, so
# the container carries a single dense segment; the decoder interleaves
# the ten decode sub-scans with the NN stages (priors, spatial passes,
# motion compensation) inside one executable.  fa_idx is TRACED (the
# three cyclic feature adaptors are 1x1 convs of equal shape, gathered
# from a stacked bank) so the GOP's adaptor cycle shares one graph.
# ---------------------------------------------------------------------------


def _adaptor_feature(p, ref_frame, ref_feature, fa_idx, steady):
    if not steady:
        return conv_apply(p["feature_adaptor_I"], ref_frame, padding=1)
    w = jnp.stack([a["w"] for a in p["feature_adaptor"]])[fa_idx]
    b = jnp.stack([a["b"] for a in p["feature_adaptor"]])[fa_idx]
    return conv_apply({"w": w, "b": b}, ref_feature)


def _motion_comp_traced(p, mv_hat, ref_frame, ref_feature, fa_idx,
                        steady):
    feature = _adaptor_feature(p, ref_frame, ref_feature, fa_idx, steady)
    f1, f2, f3 = feature_extractor(p, feature)
    warpframe = flow_warp(ref_frame, mv_hat)
    mv2 = bilinear_resize_2x(mv_hat, up=False) / 2
    mv3 = bilinear_resize_2x(mv2, up=False) / 2
    c1_init = flow_warp(f1, mv_hat)
    aux = jnp.concatenate((c1_init, warpframe, mv_hat), axis=-1)
    c1 = offset_diversity(p, f1, aux, mv_hat)
    c2 = flow_warp(f2, mv2)
    c3 = flow_warp(f3, mv3)
    c1, c2, c3 = context_fusion(p, c1, c2, c3)
    return c1, c2, c3, warpframe


def make_fm_device_stages(cfg):
    """Build the jitted (compress_frame, decompress_frame) megastage
    pair for a coder config (the gaussian scale-table constants)."""
    from .prior_stages import make_pass_stages
    from .dmc import (_lane_layout, _lane_unlayout, _cm_flat,
                      _cm_unflat)
    from ..entropy.device_rans import (_encode_scan_carry,
                                       _decode_scan_carry,
                                       _undensify_device,
                                       densify_segment,
                                       encode_carry_init)
    st = make_pass_stages(cfg, 4)

    def enc_4x(y, params_prior, spatial_fn):
        y_div, packed0, so_far = st["enc_pass0_video"](y, params_prior)
        packed = [packed0]
        for k in range(1, 4):
            scales, means = spatial_fn(k, so_far, params_prior)
            pk, so_far = st["enc_pass_k"](y_div, scales, means, so_far, k)
            packed.append(pk)
        return packed, st["finalize_video"](so_far, params_prior)

    def compress_frame(p, x, ref_frame, ref_feature, ref_mv_feature,
                       ref_y, ref_mv_y, fa_idx, q_index, cum_hl,
                       steady, lanes, mw, n_y_rows, cap):
        mv_y, mv_z_hat, mv_z_int8 = _stage_mv_enc(
            p, x, ref_frame, ref_mv_feature if steady else None, q_index)
        myh, myw = mv_y.shape[1], mv_y.shape[2]
        mv_params = _stage_mv_prior(
            p, mv_z_hat, ref_mv_y if steady else None, myh, myw)
        mv_packed, mv_y_hat = enc_4x(
            mv_y, mv_params,
            lambda k, sf, prm: _stage_mv_spatial(p, k, sf, prm))
        mv_hat, mv_feature = _stage_mv_dec(p, mv_y_hat, q_index)
        c1, c2, c3, _ = _motion_comp_traced(
            p, mv_hat, ref_frame, ref_feature if steady else None,
            fa_idx, steady)
        y, z_hat, z_int8 = _stage_ctx_enc(p, x, c1, c2, c3, q_index)
        yh, yw = y.shape[1], y.shape[2]
        params = _stage_ctx_prior(
            p, z_hat, c3, ref_y if steady else None, yh, yw)
        y_packed, y_hat = enc_4x(
            y, params, lambda k, sf, prm: _stage_y_spatial(p, k, sf, prm))
        x_hat, feature = _stage_recon(p, y_hat, c1, c2, c3, q_index)

        # lane-encode the ten planes in REVERSE decode order (the
        # decoder consumes mv_z, mv0..mv3, z, y0..y3)
        carry = encode_carry_init(lanes, mw)
        z_base = n_y_rows
        mvz_base = n_y_rows + G_CH_Z
        for pk in reversed(y_packed):
            flat = _cm_flat(pk).astype(jnp.int32)
            s_l, r_l = _lane_layout(flat >> 8, flat & 255, lanes, True)
            carry = _encode_scan_carry(s_l, r_l, cum_hl, carry)
        z_sym = _cm_flat(z_int8).astype(jnp.int32)
        z_rows = z_base + (jnp.arange(z_sym.shape[0])
                           // (z_sym.shape[0] // G_CH_Z))
        s_l, r_l = _lane_layout(z_sym, z_rows, lanes, True)
        carry = _encode_scan_carry(s_l, r_l, cum_hl, carry)
        for pk in reversed(mv_packed):
            flat = _cm_flat(pk).astype(jnp.int32)
            s_l, r_l = _lane_layout(flat >> 8, flat & 255, lanes, True)
            carry = _encode_scan_carry(s_l, r_l, cum_hl, carry)
        mz_sym = _cm_flat(mv_z_int8).astype(jnp.int32)
        mz_rows = mvz_base + (jnp.arange(mz_sym.shape[0])
                              // (mz_sym.shape[0] // CH_MV))
        s_l, r_l = _lane_layout(mz_sym, mz_rows, lanes, True)
        state, cursors, buf = _encode_scan_carry(s_l, r_l, cum_hl, carry)

        packed_staging = densify_segment(buf, cursors, state, cap)
        return (x_hat, feature, mv_feature, y_hat, mv_y_hat,
                packed_staging)

    def decompress_frame(p, staging, ref_frame, ref_feature,
                         ref_mv_feature, ref_y, ref_mv_y, fa_idx,
                         q_index, cum_hl, steady, yh, yw, zh, zw,
                         lanes, n_y_rows, cap, mw):
        data, states = _undensify_device(staging, cap, lanes, mw)
        carry = (states.astype(jnp.uint32),
                 jnp.zeros((lanes,), jnp.int32))

        def dec_seg(rows_flat):
            nonlocal carry
            rows_l, _ = _lane_layout(rows_flat, rows_flat, lanes, False)
            syms, carry2 = _decode_scan_carry(data, rows_l, cum_hl,
                                              carry)
            carry = carry2
            return _lane_unlayout(syms, rows_flat.shape[0])

        myh, myw = yh, yw
        n_mvz = zh * zw * CH_MV
        mz_rows = n_y_rows + G_CH_Z + (jnp.arange(n_mvz)
                                       // (n_mvz // CH_MV))
        mv_z_hat = _cm_unflat(dec_seg(mz_rows),
                              (1, zh, zw, CH_MV)).astype(ref_frame.dtype)
        mv_params = _stage_mv_prior(
            p, mv_z_hat, ref_mv_y if steady else None, myh, myw)

        idx = st["dec_index0_video"](mv_params)
        so_far = st["dec_restore0_video"](
            _cm_unflat(dec_seg(_cm_flat(idx).astype(jnp.int32)),
                       idx.shape).astype(mv_params.dtype), mv_params)
        for k in range(1, 4):
            scales, means = _stage_mv_spatial(p, k, so_far, mv_params)
            idx = st["dec_index_k"](scales, k)
            y_q_r = _cm_unflat(dec_seg(_cm_flat(idx).astype(jnp.int32)),
                               idx.shape).astype(mv_params.dtype)
            so_far = st["dec_restore_acc"](y_q_r, means, so_far, k)
        mv_y_hat = st["finalize_video"](so_far, mv_params)

        mv_hat, mv_feature = _stage_mv_dec(p, mv_y_hat, q_index)
        c1, c2, c3, _ = _motion_comp_traced(
            p, mv_hat, ref_frame, ref_feature if steady else None,
            fa_idx, steady)

        n_z = zh * zw * G_CH_Z
        z_rows = n_y_rows + (jnp.arange(n_z) // (n_z // G_CH_Z))
        z_hat = _cm_unflat(dec_seg(z_rows),
                           (1, zh, zw, G_CH_Z)).astype(mv_params.dtype)
        params = _stage_ctx_prior(
            p, z_hat, c3, ref_y if steady else None, yh, yw)

        idx = st["dec_index0_video"](params)
        so_far = st["dec_restore0_video"](
            _cm_unflat(dec_seg(_cm_flat(idx).astype(jnp.int32)),
                       idx.shape).astype(params.dtype), params)
        for k in range(1, 4):
            scales, means = _stage_y_spatial(p, k, so_far, params)
            idx = st["dec_index_k"](scales, k)
            y_q_r = _cm_unflat(dec_seg(_cm_flat(idx).astype(jnp.int32)),
                               idx.shape).astype(params.dtype)
            so_far = st["dec_restore_acc"](y_q_r, means, so_far, k)
        y_hat = st["finalize_video"](so_far, params)

        x_hat, feature = _stage_recon(p, y_hat, c1, c2, c3, q_index)
        return (x_hat, feature, mv_feature, y_hat, mv_y_hat)

    j_compress = jax.jit(compress_frame,
                         static_argnums=(10, 11, 12, 13, 14))
    j_decompress = jax.jit(decompress_frame,
                           static_argnums=(10, 11, 12, 13, 14, 15, 16,
                                           17, 18))
    return j_compress, j_decompress


# ---------------------------------------------------------------------------
# host orchestrator
# ---------------------------------------------------------------------------

class DMCFM:
    """DCVC-FM codec.  compress/decompress exchange explicit dpb dicts
    with keys ref_frame, ref_feature, ref_mv_feature, ref_y, ref_mv_y
    (reference video_model.py:441-452)."""

    def __init__(self, dtype=jnp.float32, ec_thread=False,
                 stream_part=1):
        self.dtype = dtype
        self.stream_part = stream_part
        self.ec_thread = ec_thread
        self.params = None
        self.entropy_coder = None
        import os as _os
        self.device_ec = _os.environ.get(
            "OPENDCVC_TPU_DEVICE_EC", "0") not in ("0", "false", "False")
        self.ec_lanes = int(_os.environ.get("OPENDCVC_TPU_EC_LANES",
                                            4096))
        self.ec_bps = float(_os.environ.get("OPENDCVC_TPU_EC_BPS", 0.5))
        self._cur_bps = self.ec_bps
        # adaptive D2H fetch windows (transfer slimming)
        self._fetch_windows = {}
        self.device_encoder = None
        self.device_decoder = None
        self._j_dev_compress = None
        self._j_dev_decompress = None
        self.bit_estimator_z = BitEstimator(1, G_CH_Z, support=50)
        self.bit_estimator_z_mv = BitEstimator(1, CH_MV, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="laplace", scale_min=0.01, scale_max=64.0,
            scale_levels=256, support=50)
        self._cfg = None

        self._j_mv_enc = jax.jit(_stage_mv_enc)
        self._j_mv_enc_i = jax.jit(
            lambda p, x, rf, qi: _stage_mv_enc(p, x, rf, None, qi))
        self._j_mv_prior = jax.jit(_stage_mv_prior,
                                   static_argnums=(3, 4))
        self._j_mv_prior_i = jax.jit(
            lambda p, z, yh, yw: _stage_mv_prior(p, z, None, yh, yw),
            static_argnums=(2, 3))
        self._j_mv_dec = jax.jit(_stage_mv_dec)
        self._j_motion_comp = jax.jit(_stage_motion_comp,
                                      static_argnums=(4,))
        self._j_motion_comp_i = jax.jit(
            lambda p, mv, rf, fa: _stage_motion_comp(p, mv, rf, None, fa),
            static_argnums=(3,))
        self._j_ctx_enc = jax.jit(_stage_ctx_enc)
        self._j_ctx_prior = jax.jit(_stage_ctx_prior,
                                    static_argnums=(4, 5))
        self._j_ctx_prior_i = jax.jit(
            lambda p, z, c3, yh, yw: _stage_ctx_prior(p, z, c3, None,
                                                      yh, yw),
            static_argnums=(3, 4))
        self._j_recon = jax.jit(_stage_recon)
        self._j_mv_spatial = jax.jit(_stage_mv_spatial,
                                     static_argnums=(1,))
        self._j_y_spatial = jax.jit(_stage_y_spatial, static_argnums=(1,))
        self._stages = None  # built in update() from the coder config

    @staticmethod
    def get_qp_num():
        return QP_NUM

    def init_params(self, seed=0):
        # one compiled program (see models/dmc.py init_params)
        def build(key):
            p = dmc_fm_init(key)
            # keep anchors apart so log-interp is well-defined with
            # random init
            p["mv_y_q_enc"] = jnp.array([0.5, 2.0])
            p["mv_y_q_dec"] = jnp.array([0.5, 2.0])
            p["y_q_enc"] = jnp.array([0.5, 2.0])
            p["y_q_dec"] = jnp.array([0.5, 2.0])
            return p
        self.params = C.run_init(
            build, jax.random.PRNGKey(seed),
            memo_key=("dmc_fm", seed, np.dtype(self.dtype).name))
        return self.params

    def load_params(self, params):
        self.params = params

    def update(self, force=False):
        if self.stream_part > 1:
            from ..entropy.nparts import NPartEntropyCoder
            self.entropy_coder = NPartEntropyCoder(
                self.stream_part, threaded=self.ec_thread or None)
        else:
            self.entropy_coder = EntropyCoder()
        self.gaussian_encoder.update(self.entropy_coder)
        self.bit_estimator_z.update(self.params["bit_estimator_z"],
                                    self.entropy_coder)
        self.bit_estimator_z_mv.update(self.params["bit_estimator_z_mv"],
                                       self.entropy_coder)
        self._cfg = (self.gaussian_encoder.SCALE_MIN,
                     self.gaussian_encoder.SCALE_MAX,
                     float(np.log(self.gaussian_encoder.SCALE_MIN)),
                     self.gaussian_encoder.log_step_recip)
        if self._stages is None:
            from .prior_stages import make_pass_stages
            self._stages = make_pass_stages(self._cfg, 4)
        if self.device_ec:
            C.assert_determinism_flags()
            from ..entropy.device_rans import (DeviceRansEncoder,
                                               DeviceRansDecoder,
                                               full_range_cdf_rows)
            y_rows = full_range_cdf_rows(*self.gaussian_encoder.cdf_info)
            z_rows = np.concatenate([
                full_range_cdf_rows(*self.bit_estimator_z.cdf_info),
                full_range_cdf_rows(*self.bit_estimator_z_mv.cdf_info)])
            self.device_encoder = DeviceRansEncoder(
                lanes=self.ec_lanes, bytes_per_symbol=self.ec_bps)
            self.device_encoder.set_tables(y_rows, z_rows)
            self.device_decoder = DeviceRansDecoder()
            self.device_decoder.set_tables(y_rows, z_rows)
            if self._j_dev_compress is None:
                self._j_dev_compress, self._j_dev_decompress = \
                    make_fm_device_stages(self._cfg)

    def set_use_two_entropy_coders(self, b):
        self.entropy_coder.set_use_two_entropy_coders(b)

    # -- four-part prior drivers (fused eager-free stages) --------------------

    def _compress_4x(self, y, params_prior, spatial_fn):
        st = self._stages
        y_div, packed0, so_far = st["enc_pass0_video"](y, params_prior)
        packed = [packed0]
        for k in range(1, 4):
            scales, means = spatial_fn(k, so_far, params_prior)
            pk, so_far = st["enc_pass_k"](y_div, scales, means, so_far, k)
            packed.append(pk)
        y_hat = st["finalize_video"](so_far, params_prior)
        return [np.asarray(pk).reshape(-1) for pk in packed], y_hat

    def _decompress_4x(self, params_prior, spatial_fn):
        st = self._stages
        idx = st["dec_index0_video"](params_prior)
        self.gaussian_encoder.decode_y(np.asarray(idx))
        y_q_r = self.gaussian_encoder.get_y(idx.shape)
        so_far = st["dec_restore0_video"](
            jnp.asarray(y_q_r, self.dtype), params_prior)
        for k in range(1, 4):
            scales, means = spatial_fn(k, so_far, params_prior)
            idx = st["dec_index_k"](scales, k)
            self.gaussian_encoder.decode_y(np.asarray(idx))
            y_q_r = self.gaussian_encoder.get_y(idx.shape)
            so_far = st["dec_restore_acc"](
                jnp.asarray(y_q_r, self.dtype), means, so_far, k)
        return st["finalize_video"](so_far, params_prior)

    # -- compress / decompress -------------------------------------------------

    def _mw_cap_for(self, H, W, top_rung=False):
        from ..entropy.device_rans import effective_lanes
        n_y = (H // 16) * (W // 16) * G_CH_16X // 4
        n_mv = (H // 16) * (W // 16) * CH_MV // 4
        zh, zw = C.get_downsampled_shape(H, W, 64)
        n_sym = (4 * n_y + 4 * n_mv + zh * zw * G_CH_Z
                 + zh * zw * CH_MV)
        # lanes scale with the symbol count (~6 B/lane container
        # overhead would drown small frames at the configured maximum)
        lanes = effective_lanes(self.device_encoder.lanes, n_sym)
        k_total = (4 * (-(-n_y // lanes)) + 4 * (-(-n_mv // lanes))
                   + (-(-(zh * zw * G_CH_Z) // lanes))
                   + (-(-(zh * zw * CH_MV) // lanes)))
        mw = max(8, int(k_total * self._cur_bps / 2)) + 4
        # top rung: full rectangle, so the regrow ladder terminates
        cap = lanes * mw if top_rung else max(4096, lanes * mw // 2)
        n_total = lanes * k_total
        return mw, cap, n_total, k_total, lanes

    def _compress_device(self, x, dpb, q_index, fa_idx):
        p = self.params
        enc = self.device_encoder
        steady = dpb["ref_feature"] is not None
        H, W = x.shape[1], x.shape[2]
        zeros = jnp.zeros((), self.dtype)

        def run(mw, cap):
            return self._j_dev_compress(
                p, x, jnp.asarray(dpb["ref_frame"], self.dtype),
                dpb["ref_feature"] if steady else zeros,
                dpb["ref_mv_feature"] if steady else zeros,
                dpb["ref_y"] if steady else zeros,
                dpb["ref_mv_y"] if steady else zeros,
                jnp.int32(fa_idx), jnp.int32(q_index), enc.cum_hl,
                steady, lanes, mw, enc.n_y_rows, cap)

        self._cur_bps = self.ec_bps
        mw, cap, n_total, k_total, lanes = self._mw_cap_for(H, W)
        out = run(mw, cap)
        x_hat, feature, mv_feature, y_hat, mv_y_hat, staging = out
        from ..entropy.device_rans import (serialize_frame_dense,
                                           slim_fetch,
                                           undensify_packed)
        fetch = slim_fetch(self._fetch_windows, staging, lanes, cap,
                           tail_extra=0)
        dense, ln, st = undensify_packed(fetch(), cap, lanes)
        for _ in range(8):
            if int(ln.max(initial=0)) < mw - 2 and int(ln.sum()) <= cap:
                break
            # hard frame: grow the staging ladder and re-run
            top = self._cur_bps >= 3.0
            self._cur_bps = min(self._cur_bps * 2, 3.0)
            mw, cap, n_total, k_total, lanes = self._mw_cap_for(
                H, W, top_rung=top)
            out = run(mw, cap)
            staging = out[5]
            dense, ln, st = undensify_packed(jax.device_get(staging),
                                             cap, lanes)
        else:
            raise OverflowError(
                "device rANS staging overflowed at the top ladder rung")
        bit_stream = serialize_frame_dense(dense, ln, st, n_total,
                                           k_total, mw, cap)
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat},
            "bit_stream": bit_stream,
        }

    def _decompress_device(self, bit_stream, dpb, sps):
        from ..entropy.device_rans import upload_stagings
        p = self.params
        dec = self.device_decoder
        steady = dpb["ref_feature"] is not None
        metas, stagings = upload_stagings([bit_stream])
        m = metas[0]
        stream_dev = stagings[0]
        yh, yw = C.get_downsampled_shape(sps["height"], sps["width"], 16)
        zh, zw = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        zeros = jnp.zeros((), self.dtype)
        out = self._j_dev_decompress(
            p, stream_dev, jnp.asarray(dpb["ref_frame"], self.dtype),
            dpb["ref_feature"] if steady else zeros,
            dpb["ref_mv_feature"] if steady else zeros,
            dpb["ref_y"] if steady else zeros,
            dpb["ref_mv_y"] if steady else zeros,
            jnp.int32(sps["fa_idx"]), jnp.int32(sps["qp"]), dec.cum_hl,
            steady, yh, yw, zh, zw, m["L"], dec.n_y_rows,
            m["cap"], m["MW"])
        x_hat, feature, mv_feature, y_hat, mv_y_hat = out
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat},
            "x_hat": x_hat,
        }

    def compress(self, x, dpb, q_index, fa_idx):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        qi = jnp.int32(q_index)

        if self.device_ec:
            return self._compress_device(x, dpb, q_index, fa_idx)

        if dpb["ref_mv_feature"] is None:
            mv_y, mv_z_hat, mv_z_int8 = self._j_mv_enc_i(
                p, x, dpb["ref_frame"], qi)
        else:
            mv_y, mv_z_hat, mv_z_int8 = self._j_mv_enc(
                p, x, dpb["ref_frame"], dpb["ref_mv_feature"], qi)
        myh, myw = mv_y.shape[1], mv_y.shape[2]
        if dpb["ref_mv_y"] is None:
            mv_params = self._j_mv_prior_i(p, mv_z_hat, myh, myw)
        else:
            mv_params = self._j_mv_prior(p, mv_z_hat, dpb["ref_mv_y"],
                                         myh, myw)
        mv_packed, mv_y_hat = self._compress_4x(
            mv_y, mv_params,
            lambda k, so_far, prm: self._j_mv_spatial(p, k, so_far, prm))

        mv_hat, mv_feature = self._j_mv_dec(p, mv_y_hat, qi)
        if dpb["ref_feature"] is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat,
                                                  dpb["ref_frame"], fa_idx)
        else:
            c1, c2, c3, _ = self._j_motion_comp(p, mv_hat, dpb["ref_frame"],
                                                dpb["ref_feature"], fa_idx)

        y, z_hat, z_int8 = self._j_ctx_enc(p, x, c1, c2, c3, qi)
        yh, yw = y.shape[1], y.shape[2]
        if dpb["ref_y"] is None:
            params = self._j_ctx_prior_i(p, z_hat, c3, yh, yw)
        else:
            params = self._j_ctx_prior(p, z_hat, c3, dpb["ref_y"], yh, yw)
        y_packed, y_hat = self._compress_4x(
            y, params,
            lambda k, so_far, prm: self._j_y_spatial(p, k, so_far, prm))

        self.entropy_coder.reset()
        self.bit_estimator_z_mv.encode_z(
            np.asarray(mv_z_int8).reshape(-1), 0)
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1), 0)
        for pk in mv_packed:
            self.gaussian_encoder.encode_y_packed(pk)
        for pk in y_packed:
            self.gaussian_encoder.encode_y_packed(pk)
        self.entropy_coder.flush()
        bit_stream = self.entropy_coder.get_encoded_stream()

        x_hat, feature = self._j_recon(p, y_hat, c1, c2, c3, qi)
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat},
            "bit_stream": bit_stream,
        }

    def decompress(self, bit_stream, dpb, sps):
        p = self.params
        qi = jnp.int32(sps["qp"])
        fa_idx = sps["fa_idx"]

        if self.device_ec:
            return self._decompress_device(bit_stream, dpb, sps)

        if bit_stream is not None:
            self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        y_h, y_w = C.get_downsampled_shape(sps["height"], sps["width"], 16)
        self.bit_estimator_z_mv.decode_z(z_size, 0)
        mv_z_np = self.bit_estimator_z_mv.get_z(z_size)
        self.bit_estimator_z.decode_z(z_size, 0)
        z_np = self.bit_estimator_z.get_z(z_size)

        mv_z_hat = jnp.asarray(mv_z_np, self.dtype)
        z_hat = jnp.asarray(z_np, self.dtype)

        if dpb["ref_mv_y"] is None:
            mv_params = self._j_mv_prior_i(p, mv_z_hat, y_h, y_w)
        else:
            mv_params = self._j_mv_prior(p, mv_z_hat, dpb["ref_mv_y"],
                                         y_h, y_w)
        mv_y_hat = self._decompress_4x(
            mv_params,
            lambda k, so_far, prm: self._j_mv_spatial(p, k, so_far, prm))

        mv_hat, mv_feature = self._j_mv_dec(p, mv_y_hat, qi)
        if dpb["ref_feature"] is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat,
                                                  dpb["ref_frame"], fa_idx)
        else:
            c1, c2, c3, _ = self._j_motion_comp(p, mv_hat, dpb["ref_frame"],
                                                dpb["ref_feature"], fa_idx)

        if dpb["ref_y"] is None:
            params = self._j_ctx_prior_i(p, z_hat, c3, y_h, y_w)
        else:
            params = self._j_ctx_prior(p, z_hat, c3, dpb["ref_y"], y_h, y_w)
        y_hat = self._decompress_4x(
            params,
            lambda k, so_far, prm: self._j_y_spatial(p, k, so_far, prm))

        x_hat, feature = self._j_recon(p, y_hat, c1, c2, c3, qi)
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat},
        }
