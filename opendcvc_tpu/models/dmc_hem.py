"""DCVC-HEM — hybrid spatial-temporal entropy codec, TPU-native.

Re-design of the reference DCVC-HEM (reference:
DCVC-family/DCVC-HEM/src/models/video_model.py): SpyNet motion + coded
motion latent, multi-scale warped contexts with fusion, latent refs
(ref_y / ref_mv_y, zeros when absent) concatenated into the prior
fusion, dual-prior (two-pass checkerboard) entropy for both latents,
UNet-based reconstruction, and continuous rate via per-latent
q_basic * q_scale anchors (4 anchors, interpolable in between).

Also provides IntraNoAR — the HEM/DC-era hyperprior image codec.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_hem as H
from ..layers.blocks import conv_init, conv_apply
from ..ops import fused as F
from ..ops.warp import flow_warp, bilinear_resize_2x
from ..layers.blocks_hem import hem_spynet_init as spynet_init, \
    hem_spynet_apply as spynet_apply
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C

CH_MV = 64
CH_N = 64
CH_M = 96


def dmc_hem_init(key, anchor_num=4):
    ks = iter(jax.random.split(key, 64))
    p = {}
    p["optic_flow"] = spynet_init(next(ks))
    p["mv_encoder"] = H.enc_tower_init(next(ks), 2, CH_MV)
    p["mv_decoder"] = H.dec_tower_init(next(ks), 2, CH_MV)
    p["mv_hyper_enc"] = H.hyper_enc_init(next(ks), CH_MV, CH_N)
    p["mv_hyper_dec"] = H.hyper_dec_init(next(ks), CH_MV, CH_N,
                                         out_factor=2)
    p["mv_y_prior_fusion"] = H.conv_lrelu_stack_init(
        next(ks), [CH_MV * 3, CH_MV * 3, CH_MV * 3, CH_MV * 3])
    p["mv_y_spatial_prior"] = H.conv_lrelu_stack_init(
        next(ks), [CH_MV * 4, CH_MV * 3, CH_MV * 3, CH_MV * 2])

    p["feature_adaptor_I"] = conv_init(next(ks), 3, CH_N, 3)
    p["feature_adaptor_P"] = conv_init(next(ks), CH_N, CH_N, 1)
    p["feature_extractor"] = {
        "c1": conv_init(next(ks), CH_N, CH_N, 3),
        "r1": H.res_block_init(next(ks), CH_N),
        "c2": conv_init(next(ks), CH_N, CH_N, 3),
        "r2": H.res_block_init(next(ks), CH_N),
        "c3": conv_init(next(ks), CH_N, CH_N, 3),
        "r3": H.res_block_init(next(ks), CH_N),
    }
    p["ctx_fusion"] = {
        "c3_up": conv_init(next(ks), CH_N, CH_N * 4, 3),
        "r3_up": H.res_block_init(next(ks), CH_N),
        "c3_out": conv_init(next(ks), CH_N, CH_N, 3),
        "r3_out": H.res_block_init(next(ks), CH_N),
        "c2_up": conv_init(next(ks), CH_N * 2, CH_N * 4, 3),
        "r2_up": H.res_block_init(next(ks), CH_N),
        "c2_out": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "r2_out": H.res_block_init(next(ks), CH_N),
        "c1_out": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "r1_out": H.res_block_init(next(ks), CH_N),
    }
    p["ctx_enc"] = {
        "c1": conv_init(next(ks), CH_N + 3, CH_N, 3),
        "r1": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "c2": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "r2": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "c3": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "c4": conv_init(next(ks), CH_N, CH_M, 3),
    }
    # contextual hyper enc is the SHORT 3-conv stack (video_model.py:
    # 173-179), unlike the mv hyper's 5-conv tower
    p["hyper_enc"] = H.conv_lrelu_stack_init(
        next(ks), [CH_M, CH_N, CH_N, CH_N])
    # contextual hyper dec outputs 2*M channels
    p["hyper_dec"] = H.hyper_dec_init(next(ks), CH_M, CH_N, out_factor=2)
    p["temporal_prior"] = {
        "c1": conv_init(next(ks), CH_N, CH_M * 3 // 2, 3),
        "c2": conv_init(next(ks), CH_M * 3 // 2, CH_M * 2, 3),
    }
    p["y_prior_fusion"] = H.conv_lrelu_stack_init(
        next(ks), [CH_M * 5, CH_M * 4, CH_M * 3, CH_M * 3])
    p["y_spatial_prior"] = H.conv_lrelu_stack_init(
        next(ks), [CH_M * 4, CH_M * 3, CH_M * 3, CH_M * 2])
    p["ctx_dec"] = {
        "up1": conv_init(next(ks), CH_M, CH_N * 4, 3),
        "up2": conv_init(next(ks), CH_N, CH_N * 4, 3),
        "r1": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "up3": conv_init(next(ks), CH_N * 2, CH_N * 4, 3),
        "r2": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "up4": conv_init(next(ks), CH_N * 2, 32 * 4, 3),
    }
    p["recon"] = {
        "first": conv_init(next(ks), CH_N + 32, CH_N, 3),
        "unet1": H.unet_init(next(ks), CH_N, CH_N),
        "unet2": H.unet_init(next(ks), CH_N, CH_N),
        "head": conv_init(next(ks), CH_N, 3, 3),
    }
    p["mv_y_q_basic"] = jnp.ones((CH_MV,))
    p["mv_y_q_scale"] = jnp.ones((anchor_num,))
    p["y_q_basic"] = jnp.ones((CH_M,))
    p["y_q_scale"] = jnp.ones((anchor_num,))
    p["bit_estimator_z"] = bit_estimator_init(next(ks), 1, CH_N)
    p["bit_estimator_z_mv"] = bit_estimator_init(next(ks), 1, CH_N)
    return p


# ---------------------------------------------------------------------------
# sub-networks
# ---------------------------------------------------------------------------

def _q_vec(basic, scale, dtype):
    return (jnp.maximum(basic, 0.5) * scale)[None, None, None, :].astype(
        dtype)


def feature_extractor(p, feature):
    fe = p["feature_extractor"]
    l1 = H.res_block_apply(fe["r1"], conv_apply(fe["c1"], feature,
                                                padding=1))
    l2 = H.res_block_apply(fe["r2"], conv_apply(fe["c2"], l1, stride=2,
                                                padding=1))
    l3 = H.res_block_apply(fe["r3"], conv_apply(fe["c3"], l2, stride=2,
                                                padding=1))
    return l1, l2, l3


def context_fusion(p, c1, c2, c3):
    from ..ops.fused import depth_to_space
    f = p["ctx_fusion"]
    c3_up = depth_to_space(conv_apply(f["c3_up"], c3, padding=1), 2)
    c3_up = H.res_block_apply(f["r3_up"], c3_up)
    c3_out = H.res_block_apply(f["r3_out"],
                               conv_apply(f["c3_out"], c3, padding=1))
    cat32 = jnp.concatenate((c3_up, c2), axis=-1)
    c2_up = depth_to_space(conv_apply(f["c2_up"], cat32, padding=1), 2)
    c2_up = H.res_block_apply(f["r2_up"], c2_up)
    c2_out = H.res_block_apply(f["r2_out"],
                               conv_apply(f["c2_out"], cat32, padding=1))
    cat21 = jnp.concatenate((c2_up, c1), axis=-1)
    c1_out = H.res_block_apply(f["r1_out"],
                               conv_apply(f["c1_out"], cat21, padding=1))
    return c1 + c1_out, c2 + c2_out, c3 + c3_out


def contextual_encoder(p, x, c1, c2, c3):
    e = p["ctx_enc"]
    feat = conv_apply(e["c1"], jnp.concatenate((x, c1), axis=-1),
                      stride=2, padding=1)
    feat = H.res_block_apply(e["r1"], jnp.concatenate((feat, c2), axis=-1),
                             slope=0.1, end_with_relu=True)
    feat = conv_apply(e["c2"], feat, stride=2, padding=1)
    feat = H.res_block_apply(e["r2"], jnp.concatenate((feat, c3), axis=-1),
                             slope=0.1, end_with_relu=True)
    feat = conv_apply(e["c3"], feat, stride=2, padding=1)
    return conv_apply(e["c4"], feat, stride=2, padding=1)


def contextual_decoder(p, y_hat, c2, c3):
    from ..ops.fused import depth_to_space
    d = p["ctx_dec"]
    feat = depth_to_space(conv_apply(d["up1"], y_hat, padding=1), 2)
    feat = depth_to_space(conv_apply(d["up2"], feat, padding=1), 2)
    feat = H.res_block_apply(d["r1"], jnp.concatenate((feat, c3), axis=-1),
                             slope=0.1, end_with_relu=True)
    feat = depth_to_space(conv_apply(d["up3"], feat, padding=1), 2)
    feat = H.res_block_apply(d["r2"], jnp.concatenate((feat, c2), axis=-1),
                             slope=0.1, end_with_relu=True)
    return depth_to_space(conv_apply(d["up4"], feat, padding=1), 2)


def recon_generation(p, res, c1):
    # the reference passes the decoded residual as the FIRST cat operand
    # (recon_generation_net(recon_image_feature, context1))
    r = p["recon"]
    feat = conv_apply(r["first"], jnp.concatenate((res, c1), axis=-1),
                      padding=1)
    feat = H.unet_apply(r["unet1"], feat)
    feat = H.unet_apply(r["unet2"], feat)
    x_hat = conv_apply(r["head"], feat, padding=1)
    return feat, jnp.clip(x_hat, 0.0, 1.0)


# ---------------------------------------------------------------------------
# jit stage functions
# ---------------------------------------------------------------------------

def _stage_mv_enc(p, x, ref_frame, mv_q):
    est_mv = spynet_apply(p["optic_flow"], x, ref_frame)
    mv_y = H.enc_tower_apply(p["mv_encoder"], est_mv) / mv_q
    mv_z = H.hyper_enc_apply(p["mv_hyper_enc"], mv_y)
    mv_z_hat, mv_z_int8 = F.round_and_to_int8(mv_z)
    return mv_y, mv_z_hat.astype(x.dtype), mv_z_int8


def _stage_mv_prior(p, mv_z_hat, ref_mv_y):
    mv_params = H.hyper_dec_apply(p["mv_hyper_dec"], mv_z_hat)
    mv_params = jnp.concatenate((mv_params, ref_mv_y), axis=-1)
    fused = H.conv_lrelu_stack_apply(p["mv_y_prior_fusion"], mv_params)
    c = fused.shape[-1] // 3
    q_step = jnp.maximum(fused[..., :c], 0.5)
    return q_step, fused[..., c:2 * c], fused[..., 2 * c:]


def _stage_motion_comp(p, mv_hat, ref_frame, ref_feature):
    if ref_feature is None:
        feature = conv_apply(p["feature_adaptor_I"], ref_frame, padding=1)
    else:
        feature = conv_apply(p["feature_adaptor_P"], ref_feature)
    f1, f2, f3 = feature_extractor(p, feature)
    warpframe = flow_warp(ref_frame, mv_hat)
    mv2 = bilinear_resize_2x(mv_hat, up=False) / 2
    mv3 = bilinear_resize_2x(mv2, up=False) / 2
    c1 = flow_warp(f1, mv_hat)
    c2 = flow_warp(f2, mv2)
    c3 = flow_warp(f3, mv3)
    c1, c2, c3 = context_fusion(p, c1, c2, c3)
    return c1, c2, c3, warpframe


def _stage_ctx_enc(p, x, c1, c2, c3, y_q):
    y = contextual_encoder(p, x, c1, c2, c3) / y_q
    he = p["hyper_enc"]
    z = conv_apply(he[0], y, padding=1)
    z = conv_apply(he[1], H.lrelu(z, 0.01), stride=2, padding=1)
    z = conv_apply(he[2], H.lrelu(z, 0.01), stride=2, padding=1)
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_ctx_prior(p, z_hat, c3, ref_y):
    hier = H.hyper_dec_apply(p["hyper_dec"], z_hat)
    tp = p["temporal_prior"]
    temporal = H.lrelu(conv_apply(tp["c1"], c3, stride=2, padding=1), 0.1)
    temporal = conv_apply(tp["c2"], temporal, stride=2, padding=1)
    params = jnp.concatenate((temporal, hier, ref_y), axis=-1)
    fused = H.conv_lrelu_stack_apply(p["y_prior_fusion"], params)
    c = fused.shape[-1] // 3
    q_step = jnp.maximum(fused[..., :c], 0.5)
    return q_step, fused[..., c:2 * c], fused[..., 2 * c:]


def _stage_spatial(plist, y_hat_0, means, scales, q_step):
    cat = jnp.concatenate((y_hat_0, means, scales, q_step), axis=-1)
    out = H.conv_lrelu_stack_apply(plist, cat)
    q = out.shape[-1] // 4
    scales1 = jnp.concatenate((out[..., :q], out[..., 2 * q:3 * q]),
                              axis=-1)
    means1 = jnp.concatenate((out[..., q:2 * q], out[..., 3 * q:]), axis=-1)
    return scales1, means1


def _stage_fold_index_2x(scales, k, cfg):
    _, h, w, c = scales.shape
    masks = F.checkerboard_masks_2x(h, w, c, scales.dtype)
    scales_r = F.fold_halves(scales * masks[k])
    smin, smax, lsm, recip = cfg
    indexes, _ = F.build_index_dec(scales_r, smin, smax, lsm, recip, None)
    return indexes


def _stage_enc_mask_2x(y, scales, means, k):
    _, h, w, c = y.shape
    masks = F.checkerboard_masks_2x(h, w, c, y.dtype)
    _, y_q, y_hat, _ = F.process_with_mask(y, scales, means, masks[k], None)
    return F.fold_halves(y_q).astype(jnp.int16), y_hat


def _stage_dec_restore_2x(y_q_r, means, k):
    _, h, w, c = means.shape
    masks = F.checkerboard_masks_2x(h, w, c, means.dtype)
    return F.restore_y_2x(y_q_r, means, masks[k])


def _stage_mv_dec(p, mv_y_hat):
    return H.dec_tower_apply(p["mv_decoder"], mv_y_hat)


def _stage_recon(p, y_hat, c1, c2, c3):
    res = contextual_decoder(p, y_hat, c2, c3)
    return recon_generation(p, res, c1)


class DMCHEM:
    """DCVC-HEM codec with explicit dpb dicts
    (ref_frame, ref_feature, ref_y, ref_mv_y)."""

    def __init__(self, anchor_num=4, dtype=jnp.float32):
        self.dtype = dtype
        self.anchor_num = anchor_num
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(1, CH_N, support=50)
        self.bit_estimator_z_mv = BitEstimator(1, CH_N, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="laplace", scale_min=0.01, scale_max=64.0,
            scale_levels=256, support=50)
        self._cfg = None

        self._j_mv_enc = jax.jit(_stage_mv_enc)
        self._j_mv_prior = jax.jit(_stage_mv_prior)
        self._j_mv_prior_i = jax.jit(
            lambda p, z, yh, yw: _stage_mv_prior(
                p, z, jnp.zeros((1, yh, yw, CH_MV), z.dtype)),
            static_argnums=(2, 3))
        self._j_ctx_prior_i = jax.jit(
            lambda p, z, c3, yh, yw: _stage_ctx_prior(
                p, z, c3, jnp.zeros((1, yh, yw, CH_M), z.dtype)),
            static_argnums=(3, 4))
        self._j_motion_comp = jax.jit(_stage_motion_comp)
        self._j_motion_comp_i = jax.jit(
            lambda p, mv, rf: _stage_motion_comp(p, mv, rf, None))
        self._j_ctx_enc = jax.jit(_stage_ctx_enc)
        self._j_ctx_prior = jax.jit(_stage_ctx_prior)
        self._j_mv_spatial = jax.jit(
            lambda p, *a: _stage_spatial(p["mv_y_spatial_prior"], *a))
        self._j_y_spatial = jax.jit(
            lambda p, *a: _stage_spatial(p["y_spatial_prior"], *a))
        self._j_mv_dec = jax.jit(_stage_mv_dec)
        self._j_recon = jax.jit(_stage_recon)
        self._stages = None  # built in update()
        dt = self.dtype
        self._j_q = jax.jit(
            lambda basic, scale: (jnp.maximum(basic, 0.5)
                                  * scale)[None, None, None, :].astype(dt))

    def init_params(self, seed=0):
        self.params = dmc_hem_init(jax.random.PRNGKey(seed),
                                   self.anchor_num)
        return self.params

    def load_params(self, params):
        self.params = params

    def update(self, force=False):
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
            self._stages = make_pass_stages(self._cfg, 2)

    def get_q_scales(self):
        return (np.asarray(self.params["y_q_scale"]).reshape(-1),
                np.asarray(self.params["mv_y_q_scale"]).reshape(-1))

    def get_interpolated_q_scales(self, rate_num):
        """Continuous-rate ladder: log-interpolate rate_num points
        between the extreme trained anchors, descending (highest rate
        first), for both y and mv — the reference derives arbitrary
        rate counts from the 4 trained anchors the same way in its
        harness (DCVC-HEM/test_video.py:273-311 via interpolate_log).
        compress()/decompress() accept any float in the spanned range,
        so every rung is a valid operating point."""
        from ..utils.stream_helper import interpolate_log

        def ladder(a):
            lo, hi = float(a.min()), float(a.max())
            if lo >= hi:  # degenerate anchors (e.g. untrained init)
                return np.full(rate_num, hi)
            return np.asarray(interpolate_log(lo, hi, rate_num))

        y, mv = self.get_q_scales()
        return ladder(y), ladder(mv)

    # -- dual prior drivers (fused eager-free stages) --------------------------

    def _compress_2x(self, y, q_step, scales, means, spatial_fn, outer_q):
        st = self._stages
        y_div, packed0, y_hat_0 = st["enc_pass0_qstep"](y, q_step, scales,
                                                        means)
        scales1, means1 = spatial_fn(y_hat_0, means, scales, q_step)
        packed1, y_hat_1 = st["enc_pass_k"](y_div, scales1, means1, None, 1)
        y_hat = st["finalize_qstep"](y_hat_0, y_hat_1, q_step, outer_q)
        return [np.asarray(packed0).reshape(-1),
                np.asarray(packed1).reshape(-1)], y_hat

    def _decompress_2x(self, q_step, scales, means, spatial_fn, outer_q):
        st = self._stages
        idx0 = st["dec_index_k"](scales, 0)
        self.gaussian_encoder.decode_y(np.asarray(idx0))
        y_q_r0 = self.gaussian_encoder.get_y(idx0.shape)
        y_hat_0 = st["dec_restore_acc"](jnp.asarray(y_q_r0, self.dtype),
                                        means, None, 0)
        scales1, means1 = spatial_fn(y_hat_0, means, scales, q_step)
        idx1 = st["dec_index_k"](scales1, 1)
        self.gaussian_encoder.decode_y(np.asarray(idx1))
        y_q_r1 = self.gaussian_encoder.get_y(idx1.shape)
        y_hat_1 = st["dec_restore_acc"](jnp.asarray(y_q_r1, self.dtype),
                                        means1, None, 1)
        return st["finalize_qstep"](y_hat_0, y_hat_1, q_step, outer_q)

    # -- compress / decompress --------------------------------------------------

    def compress(self, x, dpb, mv_y_q_scale, y_q_scale):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        mv_q = self._j_q(p["mv_y_q_basic"],
                         np.asarray(mv_y_q_scale, np.float32))
        y_q = self._j_q(p["y_q_basic"], np.asarray(y_q_scale, np.float32))

        mv_y, mv_z_hat, mv_z_int8 = self._j_mv_enc(p, x, dpb["ref_frame"],
                                                   mv_q)
        if dpb["ref_mv_y"] is None:
            mv_qs, mv_scales, mv_means = self._j_mv_prior_i(
                p, mv_z_hat, mv_y.shape[1], mv_y.shape[2])
        else:
            mv_qs, mv_scales, mv_means = self._j_mv_prior(
                p, mv_z_hat, dpb["ref_mv_y"])
        mv_packed, mv_y_hat = self._compress_2x(
            mv_y, mv_qs, mv_scales, mv_means,
            lambda *a: self._j_mv_spatial(p, *a), mv_q)

        mv_hat = self._j_mv_dec(p, mv_y_hat)
        if dpb["ref_feature"] is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat,
                                                  dpb["ref_frame"])
        else:
            c1, c2, c3, _ = self._j_motion_comp(p, mv_hat, dpb["ref_frame"],
                                                dpb["ref_feature"])

        y, z_hat, z_int8 = self._j_ctx_enc(p, x, c1, c2, c3, y_q)
        if dpb["ref_y"] is None:
            qs, scales, means = self._j_ctx_prior_i(
                p, z_hat, c3, y.shape[1], y.shape[2])
        else:
            qs, scales, means = self._j_ctx_prior(p, z_hat, c3,
                                                  dpb["ref_y"])
        y_packed, y_hat = self._compress_2x(
            y, qs, scales, means, lambda *a: self._j_y_spatial(p, *a), y_q)

        feature, x_hat = self._j_recon(p, y_hat, c1, c2, c3)

        self.entropy_coder.reset()
        self.bit_estimator_z_mv.encode_z(
            np.asarray(mv_z_int8).reshape(-1), 0)
        for pk in mv_packed:
            self.gaussian_encoder.encode_y_packed(pk)
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1), 0)
        for pk in y_packed:
            self.gaussian_encoder.encode_y_packed(pk)
        self.entropy_coder.flush()

        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_y": y_hat, "ref_mv_y": mv_y_hat},
            "bit_stream": self.entropy_coder.get_encoded_stream(),
        }

    def decompress(self, dpb, bit_stream, height, width, mv_y_q_scale,
                   y_q_scale):
        p = self.params
        mv_q = self._j_q(p["mv_y_q_basic"],
                         np.asarray(mv_y_q_scale, np.float32))
        y_q = self._j_q(p["y_q_basic"], np.asarray(y_q_scale, np.float32))

        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(height, width, 64)
        self.bit_estimator_z_mv.decode_z(z_size, 0)
        mv_z_hat = jnp.asarray(self.bit_estimator_z_mv.get_z(z_size),
                               self.dtype)

        y_h, y_w = C.get_downsampled_shape(height, width, 16)
        if dpb["ref_mv_y"] is None:
            mv_qs, mv_scales, mv_means = self._j_mv_prior_i(p, mv_z_hat,
                                                            y_h, y_w)
        else:
            mv_qs, mv_scales, mv_means = self._j_mv_prior(
                p, mv_z_hat, dpb["ref_mv_y"])
        mv_y_hat = self._decompress_2x(
            mv_qs, mv_scales, mv_means,
            lambda *a: self._j_mv_spatial(p, *a), mv_q)

        mv_hat = self._j_mv_dec(p, mv_y_hat)
        if dpb["ref_feature"] is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat,
                                                  dpb["ref_frame"])
        else:
            c1, c2, c3, _ = self._j_motion_comp(p, mv_hat, dpb["ref_frame"],
                                                dpb["ref_feature"])

        self.bit_estimator_z.decode_z(z_size, 0)
        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size), self.dtype)
        if dpb["ref_y"] is None:
            qs, scales, means = self._j_ctx_prior_i(p, z_hat, c3, y_h, y_w)
        else:
            qs, scales, means = self._j_ctx_prior(p, z_hat, c3,
                                                  dpb["ref_y"])
        y_hat = self._decompress_2x(
            qs, scales, means, lambda *a: self._j_y_spatial(p, *a), y_q)

        feature, x_hat = self._j_recon(p, y_hat, c1, c2, c3)
        return {
            "dpb": {"ref_frame": x_hat, "ref_feature": feature,
                    "ref_y": y_hat, "ref_mv_y": mv_y_hat},
        }
