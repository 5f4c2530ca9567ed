"""DCVC-DC — diverse-context codec, TPU-native.

Re-design of the reference DCVC-DC (reference:
DCVC-family/DCVC-DC/src/models/video_model.py): the generation between
HEM and FM — OffsetDiversity warping, quadtree four-part priors with
latent refs, cyclic feature adaptors (index_map [0,1,0,2] over the frame
index), separate encoder/decoder quant banks per latent with a 64-step
log-interpolated fine QP ladder derived from 4 trained anchors
(video_model.py:325-341), Laplace y-likelihood, UNet (DCB-based) recon.

Shares the motion/feature machinery shapes with the FM implementation but
uses the DCB (bounded-FFN) block generation throughout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_fm as FM
from ..layers import blocks_hem as H
from ..layers.blocks import conv_init, conv_apply
from ..ops import fused as F
from ..ops.warp import flow_warp, bilinear_resize_2x
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C
from .dmc_fm import offset_diversity, feature_extractor, context_fusion

G_CH_1X = 48
G_CH_2X = 64
G_CH_4X = 96
G_CH_8X = 96
G_CH_16X = 128
CH_MV = 64
CH_N = 64
QP_NUM = 64


def dmc_dc_init(key, anchor_num=4):
    ks = iter(jax.random.split(key, 96))
    p = {}
    p["optic_flow"] = H.hem_spynet_init(next(ks))
    aux = G_CH_1X + 3 + 2
    p["align"] = {
        "off1": conv_init(next(ks), aux, G_CH_2X, 3),
        "off2": conv_init(next(ks), G_CH_2X, G_CH_2X, 3),
        "off3": conv_init(next(ks), G_CH_2X, 3 * 16 * 2, 3),
        "fusion": conv_init(next(ks), G_CH_1X * 2, G_CH_1X, 1, groups=16),
    }
    p["mv_enc"] = {
        "enc1_rbs": FM.res_block_stride_init(next(ks), 2, CH_MV),
        "enc1_dcb": FM.dcb_init(next(ks), CH_MV, CH_MV),
        "enc2": FM.res_block_stride_init(next(ks), CH_MV, CH_MV),
        "adaptor_0": FM.dcb_init(next(ks), CH_MV, CH_MV),
        "adaptor_1": FM.dcb_init(next(ks), CH_MV * 2, CH_MV),
        "enc3_rbs": FM.res_block_stride_init(next(ks), CH_MV, CH_MV),
        "enc3_dcb": FM.dcb_init(next(ks), CH_MV, CH_MV),
        "enc3_down": conv_init(next(ks), CH_MV, CH_MV, 3),
    }
    p["mv_dec"] = {
        "dec1": [FM.dcb_init(next(ks), CH_MV, CH_MV),
                 FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
                 FM.dcb_init(next(ks), CH_MV, CH_MV),
                 FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
                 FM.dcb_init(next(ks), CH_MV, CH_MV)],
        "dec2": FM.res_block_upsample_init(next(ks), CH_MV, CH_MV),
        "dec3_dcb": FM.dcb_init(next(ks), CH_MV, CH_MV),
        "dec3_subpel": FM.subpel1x1_init(next(ks), CH_MV, 2),
    }
    p["mv_hyper_enc"] = H.hyper_enc_init(next(ks), CH_MV, CH_N)
    p["mv_hyper_dec"] = H.hyper_dec_init(next(ks), CH_MV, CH_N,
                                         out_factor=1, mid=CH_MV)
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

    p["ctx_enc"] = {
        "c1": conv_init(next(ks), G_CH_1X + 3, G_CH_2X, 3),
        "r1": H.res_block_init(next(ks), G_CH_2X * 2, bottleneck=True),
        "c2": conv_init(next(ks), G_CH_2X * 2, G_CH_4X, 3),
        "r2": H.res_block_init(next(ks), G_CH_4X * 2, bottleneck=True),
        "c3": conv_init(next(ks), G_CH_4X * 2, G_CH_8X, 3),
        "c4": conv_init(next(ks), G_CH_8X, G_CH_16X, 3),
    }
    p["ctx_dec"] = {
        "up1": conv_init(next(ks), G_CH_16X, G_CH_8X * 4, 3),
        "up2": conv_init(next(ks), G_CH_8X, G_CH_4X * 4, 3),
        "r1": H.res_block_init(next(ks), G_CH_4X * 2, bottleneck=True),
        "up3": conv_init(next(ks), G_CH_4X * 2, G_CH_2X * 4, 3),
        "r2": H.res_block_init(next(ks), G_CH_2X * 2, bottleneck=True),
        "up4": conv_init(next(ks), G_CH_2X * 2, 32 * 4, 3),
    }
    p["recon"] = {
        "first": conv_init(next(ks), G_CH_1X + 32, G_CH_1X, 3),
        "unet1": _dc_unet_init(next(ks), G_CH_1X, G_CH_1X),
        "unet2": _dc_unet_init(next(ks), G_CH_1X, G_CH_1X),
        "head": conv_init(next(ks), G_CH_1X, 3, 3),
    }

    # contextual hyper: reduced 3-conv enc, same-width dec
    p["hyper_enc"] = {
        "c0": conv_init(next(ks), G_CH_16X, G_CH_16X, 3),
        "c1": conv_init(next(ks), G_CH_16X, G_CH_16X, 3),
        "c2": conv_init(next(ks), G_CH_16X, G_CH_16X, 3),
    }
    p["hyper_dec"] = H.hyper_dec_init(next(ks), G_CH_16X, G_CH_16X,
                                      out_factor=1, mid=G_CH_16X)
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

    # enc/dec-separate quant anchors (4 each) + per-channel basics
    p["mv_y_q_basic_enc"] = jnp.ones((CH_MV,))
    p["mv_y_q_scale_enc"] = jnp.ones((anchor_num,))
    p["mv_y_q_basic_dec"] = jnp.ones((CH_MV,))
    p["mv_y_q_scale_dec"] = jnp.ones((anchor_num,))
    p["y_q_basic_enc"] = jnp.ones((G_CH_2X * 2,))
    p["y_q_scale_enc"] = jnp.ones((anchor_num,))
    p["y_q_basic_dec"] = jnp.ones((G_CH_2X,))
    p["y_q_scale_dec"] = jnp.ones((anchor_num,))

    p["bit_estimator_z"] = bit_estimator_init(next(ks), 1, G_CH_16X)
    p["bit_estimator_z_mv"] = bit_estimator_init(next(ks), 1, CH_N)
    return p


def _dc_unet_init(key, in_ch, out_ch):
    """DC UNet (video_net.py:129-170): DCB blocks + max-pool."""
    ks = jax.random.split(key, 10)
    return {
        "conv1": FM.dcb_init(ks[0], in_ch, 32),
        "conv2": FM.dcb_init(ks[1], 32, 64),
        "conv3": FM.dcb_init(ks[2], 64, 128),
        "refine": [FM.dcb_init(k, 128, 128) for k in ks[3:7]],
        "up3": FM.subpel1x1_init(ks[7], 128, 64),
        "up_conv3": FM.dcb_init(ks[8], 128, 64),
        "up2": FM.subpel1x1_init(ks[9], 64, 32),
        "up_conv2": FM.dcb_init(jax.random.fold_in(key, 99), 64, out_ch),
    }


def _max_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _dc_unet_apply(p, x):
    x1 = FM.dcb_apply(p["conv1"], x)
    x2 = _max_pool2(x1)
    x2 = FM.dcb_apply(p["conv2"], x2)
    x3 = _max_pool2(x2)
    x3 = FM.dcb_apply(p["conv3"], x3)
    for rp in p["refine"]:
        x3 = FM.dcb_apply(rp, x3)
    d3 = FM.subpel1x1_apply(p["up3"], x3)
    d3 = FM.dcb_apply(p["up_conv3"], jnp.concatenate((x2, d3), axis=-1))
    d2 = FM.subpel1x1_apply(p["up2"], d3)
    return FM.dcb_apply(p["up_conv2"], jnp.concatenate((x1, d2), axis=-1))


# ---------------------------------------------------------------------------
# sub-networks
# ---------------------------------------------------------------------------

def mv_encoder(p, est_mv, ref_mv_feature, q):
    e = p["mv_enc"]
    out = FM.res_block_stride_apply(e["enc1_rbs"], est_mv)
    out = FM.dcb_apply(e["enc1_dcb"], out)
    out = out * q
    out = FM.res_block_stride_apply(e["enc2"], out)
    if ref_mv_feature is None:
        out = FM.dcb_apply(e["adaptor_0"], out)
    else:
        out = FM.dcb_apply(e["adaptor_1"],
                           jnp.concatenate((out, ref_mv_feature), axis=-1))
    out = FM.res_block_stride_apply(e["enc3_rbs"], out)
    out = FM.dcb_apply(e["enc3_dcb"], out)
    return conv_apply(e["enc3_down"], out, stride=2, padding=1)


def mv_decoder(p, mv_y_hat, q):
    d = p["mv_dec"]
    feat = FM.dcb_apply(d["dec1"][0], mv_y_hat)
    feat = FM.res_block_upsample_apply(d["dec1"][1], feat)
    feat = FM.dcb_apply(d["dec1"][2], feat)
    feat = FM.res_block_upsample_apply(d["dec1"][3], feat)
    feat = FM.dcb_apply(d["dec1"][4], feat)
    out = FM.res_block_upsample_apply(d["dec2"], feat)
    out = out * q
    out = FM.dcb_apply(d["dec3_dcb"], out)
    mv = FM.subpel1x1_apply(d["dec3_subpel"], out)
    return mv, feat


def contextual_encoder(p, x, c1, c2, c3, q):
    e = p["ctx_enc"]
    feat = conv_apply(e["c1"], jnp.concatenate((x, c1), axis=-1),
                      stride=2, padding=1)
    feat = H.res_block_apply(e["r1"], jnp.concatenate((feat, c2), axis=-1),
                             slope=0.1, end_with_relu=True)
    feat = feat * q
    feat = conv_apply(e["c2"], feat, stride=2, padding=1)
    feat = H.res_block_apply(e["r2"], jnp.concatenate((feat, c3), axis=-1),
                             slope=0.1, end_with_relu=True)
    feat = conv_apply(e["c3"], feat, stride=2, padding=1)
    return conv_apply(e["c4"], feat, stride=2, padding=1)


def contextual_decoder(p, y_hat, c2, c3, q):
    from ..ops.fused import depth_to_space
    d = p["ctx_dec"]
    feat = depth_to_space(conv_apply(d["up1"], y_hat, padding=1), 2)
    feat = depth_to_space(conv_apply(d["up2"], feat, padding=1), 2)
    feat = H.res_block_apply(d["r1"], jnp.concatenate((feat, c3), axis=-1),
                             slope=0.1, end_with_relu=True)
    feat = depth_to_space(conv_apply(d["up3"], feat, padding=1), 2)
    feat = feat * q
    feat = H.res_block_apply(d["r2"], jnp.concatenate((feat, c2), axis=-1),
                             slope=0.1, end_with_relu=True)
    return depth_to_space(conv_apply(d["up4"], feat, padding=1), 2)


def recon_generation(p, res, c1):
    # the reference passes the decoded residual as the FIRST cat operand
    # (recon_generation_net(recon_image_feature, context1))
    r = p["recon"]
    feat = conv_apply(r["first"], jnp.concatenate((res, c1), axis=-1),
                      padding=1)
    feat = _dc_unet_apply(r["unet1"], feat)
    feat = _dc_unet_apply(r["unet2"], feat)
    x_hat = conv_apply(r["head"], feat, padding=1)
    return feat, jnp.clip(x_hat, 0.0, 1.0)


def ctx_hyper_enc_apply(hp, y_pad):
    h = FM.lrelu(conv_apply(hp["c0"], y_pad, padding=1), 0.01)
    h = FM.lrelu(conv_apply(hp["c1"], h, stride=2, padding=1), 0.01)
    return conv_apply(hp["c2"], h, stride=2, padding=1)


# ---------------------------------------------------------------------------
# jit stage functions
# ---------------------------------------------------------------------------

def _stage_mv_enc(p, x, ref_frame, ref_mv_feature, mv_q_enc):
    est_mv = H.hem_spynet_apply(p["optic_flow"], x, ref_frame)
    mv_y = mv_encoder(p, est_mv, ref_mv_feature, mv_q_enc)
    mv_z = H.hyper_enc_apply(p["mv_hyper_enc"], C.pad_for_y(mv_y))
    mv_z_hat, mv_z_int8 = F.round_and_to_int8(mv_z)
    return mv_y, mv_z_hat.astype(x.dtype), mv_z_int8


def _stage_mv_prior(p, mv_z_hat, ref_mv_y, y_h, y_w):
    mv_params = H.hyper_dec_apply(p["mv_hyper_dec"], mv_z_hat)
    mv_params = mv_params[:, :y_h, :y_w, :]
    if ref_mv_y is None:
        mv_params = FM.dcb_apply(p["mv_fusion_adaptor_0"], mv_params)
    else:
        mv_params = FM.dcb_apply(
            p["mv_fusion_adaptor_1"],
            jnp.concatenate((mv_params, ref_mv_y), axis=-1))
    for bp in p["mv_fusion"]:
        mv_params = FM.dcb_apply(bp, mv_params)
    return mv_params


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
    return (*context_fusion(p, c1, c2, c3), warpframe)


def _stage_ctx_enc(p, x, c1, c2, c3, y_q_enc):
    y = contextual_encoder(p, x, c1, c2, c3, y_q_enc)
    z = ctx_hyper_enc_apply(p["hyper_enc"], C.pad_for_y(y))
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_ctx_prior(p, z_hat, c3, ref_y, y_h, y_w):
    hier = H.hyper_dec_apply(p["hyper_dec"], z_hat)
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
    for bp in p["y_fusion"]:
        params = FM.dcb_apply(bp, params)
    return params


def _stage_mv_dec(p, mv_y_hat, mv_q_dec):
    return mv_decoder(p, mv_y_hat, mv_q_dec)


def _stage_recon(p, y_hat, c1, c2, c3, y_q_dec):
    res = contextual_decoder(p, y_hat, c2, c3, y_q_dec)
    feature, x_hat = recon_generation(p, res, c1)
    return x_hat, feature


def _spatial_pass(adaptor_p, prior_list, y_hat_so_far, common_params):
    cat = jnp.concatenate((y_hat_so_far, common_params), axis=-1)
    h = conv_apply(adaptor_p, cat)
    for bp in prior_list:
        h = FM.dcb_apply(bp, h)
    c = h.shape[-1] // 2
    return h[..., :c], h[..., c:]


def _stage_mv_spatial(p, k, y_hat_so_far, common_params):
    return _spatial_pass(p[f"mv_sp_adaptor_{k}"], p["mv_spatial_prior"],
                         y_hat_so_far, common_params)


def _stage_y_spatial(p, k, y_hat_so_far, common_params):
    return _spatial_pass(p[f"y_sp_adaptor_{k}"], p["y_spatial_prior"],
                         y_hat_so_far, common_params)


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


INDEX_MAP = [0, 1, 0, 2]


class DMCDC:
    """DCVC-DC codec with explicit dpb dicts
    (ref_frame, ref_feature, ref_mv_feature, ref_y, ref_mv_y)."""

    def __init__(self, anchor_num=4, dtype=jnp.float32, ec_thread=False,
                 stream_part=1):
        self.dtype = dtype
        self.anchor_num = anchor_num
        self.stream_part = stream_part
        self.ec_thread = ec_thread
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(1, G_CH_16X, support=50)
        self.bit_estimator_z_mv = BitEstimator(1, CH_N, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="laplace", scale_min=0.01, scale_max=64.0,
            scale_levels=256, support=50)
        self._cfg = None
        self._fine = {}

        self._j_mv_enc = jax.jit(_stage_mv_enc)
        self._j_mv_enc_i = jax.jit(
            lambda p, x, rf, q: _stage_mv_enc(p, x, rf, None, q))
        self._j_mv_prior = jax.jit(_stage_mv_prior, static_argnums=(3, 4))
        self._j_mv_prior_i = jax.jit(
            lambda p, z, yh, yw: _stage_mv_prior(p, z, None, yh, yw),
            static_argnums=(2, 3))
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
        self._j_mv_dec = jax.jit(_stage_mv_dec)
        self._j_recon = jax.jit(_stage_recon)
        self._j_mv_spatial = jax.jit(_stage_mv_spatial, static_argnums=(1,))
        self._j_y_spatial = jax.jit(_stage_y_spatial, static_argnums=(1,))
        self._stages = None  # built in update() from the coder config

    @staticmethod
    def get_qp_num():
        return QP_NUM

    def init_params(self, seed=0):
        self.params = dmc_dc_init(jax.random.PRNGKey(seed), self.anchor_num)
        for name in ("mv_y_q_scale_enc", "mv_y_q_scale_dec",
                     "y_q_scale_enc", "y_q_scale_dec"):
            self.params[name] = jnp.linspace(0.5, 2.0, self.anchor_num)
        self._build_fine_ladders()
        return self.params

    def load_params(self, params):
        self.params = params
        self._build_fine_ladders()

    def _build_fine_ladders(self):
        """64-step log-interpolated fine QP ladders from the 4 anchors
        (video_model.py:325-341)."""
        for name in ("mv_y_q_scale_enc", "mv_y_q_scale_dec",
                     "y_q_scale_enc", "y_q_scale_dec"):
            a = np.asarray(self.params[name]).reshape(-1)
            self._fine[name] = np.exp(
                np.linspace(np.log(a[0]), np.log(a[-1]), QP_NUM))

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

    def _q(self, basic_name, scale_name, q_index, q_in_ckpt):
        if q_in_ckpt:
            scale = float(np.asarray(
                self.params[scale_name]).reshape(-1)[q_index])
        else:
            scale = float(self._fine[scale_name][q_index])
        basic = jnp.maximum(self.params[basic_name], 0.5)
        return (basic * scale)[None, None, None, :].astype(self.dtype)

    def get_q_for_inference(self, q_in_ckpt, q_index):
        return (self._q("mv_y_q_basic_enc", "mv_y_q_scale_enc", q_index,
                        q_in_ckpt),
                self._q("mv_y_q_basic_dec", "mv_y_q_scale_dec", q_index,
                        q_in_ckpt),
                self._q("y_q_basic_enc", "y_q_scale_enc", q_index,
                        q_in_ckpt),
                self._q("y_q_basic_dec", "y_q_scale_dec", q_index,
                        q_in_ckpt))

    # -- 4-part drivers (fused eager-free stages) ------------------------------

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

    def compress(self, x, dpb, q_in_ckpt, q_index, frame_idx=0):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        mv_q_enc, mv_q_dec, y_q_enc, y_q_dec = self.get_q_for_inference(
            q_in_ckpt, q_index)
        fa_idx = INDEX_MAP[frame_idx % 4]

        if dpb["ref_mv_feature"] is None:
            mv_y, mv_z_hat, mv_z_int8 = self._j_mv_enc_i(
                p, x, dpb["ref_frame"], mv_q_enc)
        else:
            mv_y, mv_z_hat, mv_z_int8 = self._j_mv_enc(
                p, x, dpb["ref_frame"], dpb["ref_mv_feature"], mv_q_enc)
        myh, myw = mv_y.shape[1], mv_y.shape[2]
        if dpb["ref_mv_y"] is None:
            mv_params = self._j_mv_prior_i(p, mv_z_hat, myh, myw)
        else:
            mv_params = self._j_mv_prior(p, mv_z_hat, dpb["ref_mv_y"],
                                         myh, myw)
        mv_packed, mv_y_hat = self._compress_4x(
            mv_y, mv_params,
            lambda k, so_far, prm: self._j_mv_spatial(p, k, so_far, prm))

        mv_hat, mv_feature = self._j_mv_dec(p, mv_y_hat, mv_q_dec)
        if dpb["ref_feature"] is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat,
                                                  dpb["ref_frame"], 0)
        else:
            c1, c2, c3, _ = self._j_motion_comp(
                p, mv_hat, dpb["ref_frame"], dpb["ref_feature"], fa_idx)

        y, z_hat, z_int8 = self._j_ctx_enc(p, x, c1, c2, c3, y_q_enc)
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

        x_hat, feature = self._j_recon(p, y_hat, c1, c2, c3, y_q_dec)
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat},
            "bit_stream": self.entropy_coder.get_encoded_stream(),
        }

    def decompress(self, bit_stream, dpb, height, width, q_in_ckpt,
                   q_index, frame_idx=0):
        p = self.params
        _, mv_q_dec, _, y_q_dec = self.get_q_for_inference(q_in_ckpt,
                                                           q_index)
        fa_idx = INDEX_MAP[frame_idx % 4]

        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(height, width, 64)
        y_h, y_w = C.get_downsampled_shape(height, width, 16)
        self.bit_estimator_z_mv.decode_z(z_size, 0)
        mv_z_hat = jnp.asarray(self.bit_estimator_z_mv.get_z(z_size),
                               self.dtype)
        self.bit_estimator_z.decode_z(z_size, 0)
        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size), self.dtype)

        if dpb["ref_mv_y"] is None:
            mv_params = self._j_mv_prior_i(p, mv_z_hat, y_h, y_w)
        else:
            mv_params = self._j_mv_prior(p, mv_z_hat, dpb["ref_mv_y"],
                                         y_h, y_w)
        mv_y_hat = self._decompress_4x(
            mv_params,
            lambda k, so_far, prm: self._j_mv_spatial(p, k, so_far, prm))

        mv_hat, mv_feature = self._j_mv_dec(p, mv_y_hat, mv_q_dec)
        if dpb["ref_feature"] is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat,
                                                  dpb["ref_frame"], 0)
        else:
            c1, c2, c3, _ = self._j_motion_comp(
                p, mv_hat, dpb["ref_frame"], dpb["ref_feature"], fa_idx)

        if dpb["ref_y"] is None:
            params = self._j_ctx_prior_i(p, z_hat, c3, y_h, y_w)
        else:
            params = self._j_ctx_prior(p, z_hat, c3, dpb["ref_y"], y_h, y_w)
        y_hat = self._decompress_4x(
            params,
            lambda k, so_far, prm: self._j_y_spatial(p, k, so_far, prm))

        x_hat, feature = self._j_recon(p, y_hat, c1, c2, c3, y_q_dec)
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_mv_feature": mv_feature, "ref_y": y_hat,
                    "ref_mv_y": mv_y_hat},
        }
