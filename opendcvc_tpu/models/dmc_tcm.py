"""DCVC-TCM — temporal-context-mining codec, TPU-native.

Re-design of the reference DCVC-TCM (reference:
DCVC-family/DCVC-TCM/src/models/video_net_dmc.py): multi-scale
propagated feature contexts (the first codec to replace pixel refs with
features), GDN/IGDN enc/dec towers, ConvTranspose upsampling in the
hyper/mv decoders, and SEQUENTIAL single-string entropy coding (no
checkerboard): mv_z -> mv_y -> z -> y, each latent coded densely against
its per-element scales.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_hem as H
from ..layers.blocks import conv_init, conv_apply, conv_transpose2x_apply
from ..layers.gdn import gdn_init, gdn_apply
from ..layers.blocks_hem import hem_spynet_init as spynet_init, \
    hem_spynet_apply as spynet_apply
from ..ops import fused as F
from ..ops.warp import flow_warp, bilinear_resize_2x
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C

CH_MV = 128
CH_N = 64
CH_M = 96


def dmc_tcm_init(key):
    ks = iter(jax.random.split(key, 128))
    p = {}
    p["optic_flow"] = spynet_init(next(ks))

    # mv encoder: 3x [conv s2 + GDN + ResBlock + lrelu] + final conv s2
    # (video_net_dmc.py:178-193 — the last level is conv-only)
    p["mv_enc"] = []
    in_ch = 2
    for _ in range(3):
        p["mv_enc"].append({
            "conv": conv_init(next(ks), in_ch, CH_MV, 3),
            "gdn": gdn_init(next(ks), CH_MV),
            "res": H.res_block_init(next(ks), CH_MV),
        })
        in_ch = CH_MV
    p["mv_enc"].append({"conv": conv_init(next(ks), CH_MV, CH_MV, 3)})
    p["mv_prior_enc"] = [conv_init(next(ks), CH_MV, CH_N, 3),
                         conv_init(next(ks), CH_N, CH_N, 3),
                         conv_init(next(ks), CH_N, CH_N, 3)]
    p["mv_prior_dec"] = [conv_init(next(ks), CH_N, CH_MV, 3),
                         conv_init(next(ks), CH_MV, CH_MV * 3 // 2, 3),
                         conv_init(next(ks), CH_MV * 3 // 2, CH_MV * 2, 3)]
    p["mv_dec"] = {
        "t1": conv_init(next(ks), CH_MV, CH_MV, 3),
        "res": H.res_block_init(next(ks), CH_MV),
        "gdn1": gdn_init(next(ks), CH_MV),
        "t2": conv_init(next(ks), CH_MV, CH_MV, 3),
        "gdn2": gdn_init(next(ks), CH_MV),
        "t3": conv_init(next(ks), CH_MV, CH_MV, 3),
        "gdn3": gdn_init(next(ks), CH_MV),
        "t4": conv_init(next(ks), CH_MV, 2, 3),
    }

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
        "g1": gdn_init(next(ks), CH_N),
        "r1": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "c2": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "g2": gdn_init(next(ks), CH_N),
        "r2": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "c3": conv_init(next(ks), CH_N * 2, CH_N, 3),
        "g3": gdn_init(next(ks), CH_N),
        "c4": conv_init(next(ks), CH_N, CH_M, 3),
    }
    p["ctx_dec"] = {
        "up1": conv_init(next(ks), CH_M, CH_N * 4, 3),
        "g1": gdn_init(next(ks), CH_N),
        "up2": conv_init(next(ks), CH_N, CH_N * 4, 3),
        "g2": gdn_init(next(ks), CH_N),
        "r1": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "up3": conv_init(next(ks), CH_N * 2, CH_N * 4, 3),
        "g3": gdn_init(next(ks), CH_N),
        "r2": H.res_block_init(next(ks), CH_N * 2, bottleneck=True),
        "up4": conv_init(next(ks), CH_N * 2, 32 * 4, 3),
    }
    p["hyper_enc"] = [conv_init(next(ks), CH_M, CH_N, 3),
                      conv_init(next(ks), CH_N, CH_N, 3),
                      conv_init(next(ks), CH_N, CH_N, 3)]
    p["hyper_dec"] = [conv_init(next(ks), CH_N, CH_M, 3),
                      conv_init(next(ks), CH_M, CH_M * 3 // 2, 3),
                      conv_init(next(ks), CH_M * 3 // 2, CH_M * 2, 3)]
    p["temporal_prior"] = {
        "c1": conv_init(next(ks), CH_N, CH_N, 3),
        "g1": gdn_init(next(ks), CH_N),
        "c2": conv_init(next(ks), CH_N * 2, CH_M, 3),
        "g2": gdn_init(next(ks), CH_M),
        "c3": conv_init(next(ks), CH_M + CH_N, CH_M * 3 // 2, 3),
        "g3": gdn_init(next(ks), CH_M * 3 // 2),
        "c4": conv_init(next(ks), CH_M * 3 // 2, CH_M * 2, 3),
    }
    p["entropy_parameter"] = [
        conv_init(next(ks), CH_M * 4, CH_M * 10 // 3, 3),
        conv_init(next(ks), CH_M * 10 // 3, CH_M * 8 // 3, 3),
        conv_init(next(ks), CH_M * 8 // 3, CH_M * 2, 3)]
    p["recon"] = {
        "first": conv_init(next(ks), CH_N + 32, CH_N, 3),
        "res1": H.res_block_init(next(ks), CH_N),
        "res2": H.res_block_init(next(ks), CH_N),
        "head": conv_init(next(ks), CH_N, 3, 3),
    }
    p["bit_estimator_z"] = bit_estimator_init(next(ks), 1, CH_N)
    p["bit_estimator_z_mv"] = bit_estimator_init(next(ks), 1, CH_N)
    return p


# ---------------------------------------------------------------------------
# sub-networks
# ---------------------------------------------------------------------------

def mv_encoder(p, mv):
    h = mv
    for blk in p["mv_enc"]:
        h = conv_apply(blk["conv"], h, stride=2, padding=1)
        if "gdn" in blk:
            h = gdn_apply(blk["gdn"], h)
            h = H.res_block_apply(blk["res"], h, start_from_relu=False)
            h = H.lrelu(h, 0.1)
    return h


def mv_prior_enc(p, mv_y):
    h = H.lrelu(conv_apply(p["mv_prior_enc"][0], mv_y, padding=1), 0.01)
    h = H.lrelu(conv_apply(p["mv_prior_enc"][1], h, stride=2, padding=1),
                0.01)
    return conv_apply(p["mv_prior_enc"][2], h, stride=2, padding=1)


def mv_prior_dec(p, mv_z_hat):
    h = H.lrelu(conv_transpose2x_apply(p["mv_prior_dec"][0], mv_z_hat),
                0.01)
    h = H.lrelu(conv_transpose2x_apply(p["mv_prior_dec"][1], h), 0.01)
    return conv_apply(p["mv_prior_dec"][2], h, padding=1)


def mv_decoder(p, mv_y_hat):
    d = p["mv_dec"]
    h = H.lrelu(conv_transpose2x_apply(d["t1"], mv_y_hat), 0.1)
    h = H.res_block_apply(d["res"], h, start_from_relu=False)
    h = gdn_apply(d["gdn1"], h, inverse=True)
    h = conv_transpose2x_apply(d["t2"], h)
    h = gdn_apply(d["gdn2"], h, inverse=True)
    h = conv_transpose2x_apply(d["t3"], h)
    h = gdn_apply(d["gdn3"], h, inverse=True)
    return conv_transpose2x_apply(d["t4"], h)


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
    h = conv_apply(e["c1"], jnp.concatenate((x, c1), axis=-1), stride=2,
                   padding=1)
    h = gdn_apply(e["g1"], h)
    h = H.res_block_apply(e["r1"], jnp.concatenate((h, c2), axis=-1),
                          slope=0.1, start_from_relu=False,
                          end_with_relu=True)
    h = conv_apply(e["c2"], h, stride=2, padding=1)
    h = gdn_apply(e["g2"], h)
    h = H.res_block_apply(e["r2"], jnp.concatenate((h, c3), axis=-1),
                          slope=0.1, start_from_relu=False,
                          end_with_relu=True)
    h = conv_apply(e["c3"], h, stride=2, padding=1)
    h = gdn_apply(e["g3"], h)
    return conv_apply(e["c4"], h, stride=2, padding=1)


def contextual_decoder(p, y_hat, c2, c3):
    from ..ops.fused import depth_to_space
    d = p["ctx_dec"]
    h = depth_to_space(conv_apply(d["up1"], y_hat, padding=1), 2)
    h = gdn_apply(d["g1"], h, inverse=True)
    h = depth_to_space(conv_apply(d["up2"], h, padding=1), 2)
    h = gdn_apply(d["g2"], h, inverse=True)
    h = H.res_block_apply(d["r1"], jnp.concatenate((h, c3), axis=-1),
                          slope=0.1, start_from_relu=False,
                          end_with_relu=True)
    h = depth_to_space(conv_apply(d["up3"], h, padding=1), 2)
    h = gdn_apply(d["g3"], h, inverse=True)
    h = H.res_block_apply(d["r2"], jnp.concatenate((h, c2), axis=-1),
                          slope=0.1, start_from_relu=False,
                          end_with_relu=True)
    return depth_to_space(conv_apply(d["up4"], h, padding=1), 2)


def temporal_prior_encoder(p, c1, c2, c3):
    t = p["temporal_prior"]
    h = gdn_apply(t["g1"], conv_apply(t["c1"], c1, stride=2, padding=1))
    h = gdn_apply(t["g2"], conv_apply(
        t["c2"], jnp.concatenate((h, c2), axis=-1), stride=2, padding=1))
    h = gdn_apply(t["g3"], conv_apply(
        t["c3"], jnp.concatenate((h, c3), axis=-1), stride=2, padding=1))
    return conv_apply(t["c4"], h, stride=2, padding=1)


def hyper_enc(p, y):
    h = H.lrelu(conv_apply(p["hyper_enc"][0], y, padding=1), 0.01)
    h = H.lrelu(conv_apply(p["hyper_enc"][1], h, stride=2, padding=1), 0.01)
    return conv_apply(p["hyper_enc"][2], h, stride=2, padding=1)


def hyper_dec(p, z_hat):
    h = H.lrelu(conv_transpose2x_apply(p["hyper_dec"][0], z_hat), 0.01)
    h = H.lrelu(conv_transpose2x_apply(p["hyper_dec"][1], h), 0.01)
    return conv_apply(p["hyper_dec"][2], h, padding=1)


def entropy_parameter(p, params):
    h = H.lrelu(conv_apply(p["entropy_parameter"][0], params, padding=1),
                0.01)
    h = H.lrelu(conv_apply(p["entropy_parameter"][1], h, padding=1), 0.01)
    return conv_apply(p["entropy_parameter"][2], h, padding=1)


def recon_generation(p, res, c1):
    # the reference passes the decoded residual as the FIRST cat operand
    # (recon_generation_net(recon_image_feature, context1))
    r = p["recon"]
    h = conv_apply(r["first"], jnp.concatenate((res, c1), axis=-1),
                   padding=1)
    h = H.res_block_apply(r["res1"], h)
    h = H.res_block_apply(r["res2"], h)
    x_hat = conv_apply(r["head"], h, padding=1)
    return h, jnp.clip(x_hat, 0.0, 1.0)


# ---------------------------------------------------------------------------
# jit stage functions
# ---------------------------------------------------------------------------

def _stage_mv_enc(p, x, ref_frame):
    est_mv = spynet_apply(p["optic_flow"], x, ref_frame)
    mv_y = mv_encoder(p, est_mv)
    mv_z = mv_prior_enc(p, mv_y)
    mv_z_hat, mv_z_int8 = F.round_and_to_int8(mv_z)
    return mv_y, mv_z_hat.astype(x.dtype), mv_z_int8


def _stage_mv_params(p, mv_z_hat):
    params = mv_prior_dec(p, mv_z_hat)
    c = params.shape[-1] // 2
    return params[..., :c], params[..., c:]  # scales, means


def _stage_quantize_dense(y, scales, means, cfg):
    """Dense (no-mask) quantization + packed symbols for one latent."""
    y_q = jnp.clip(jnp.round((y - means).astype(jnp.float32)),
                   -128.0, 127.0)
    smin, smax, lsm, recip = cfg
    idx, _ = F.build_index_dec(scales, smin, smax, lsm, recip, None)
    packed = (y_q.astype(jnp.int16) << 8) + idx.astype(jnp.int16)
    y_hat = y_q.astype(y.dtype) + means
    return packed, y_hat


def _stage_index_dense(scales, cfg):
    smin, smax, lsm, recip = cfg
    idx, _ = F.build_index_dec(scales, smin, smax, lsm, recip, None)
    return idx


def _stage_mv_dec(p, mv_y_hat):
    return mv_decoder(p, mv_y_hat)


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


def _stage_ctx_enc(p, x, c1, c2, c3):
    y = contextual_encoder(p, x, c1, c2, c3)
    z = hyper_enc(p, y)
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_y_params(p, z_hat, c1, c2, c3):
    hier = hyper_dec(p, z_hat)
    temporal = temporal_prior_encoder(p, c1, c2, c3)
    gp = entropy_parameter(p, jnp.concatenate((temporal, hier), axis=-1))
    c = gp.shape[-1] // 2
    return gp[..., :c], gp[..., c:]


def _stage_recon(p, y_hat, c1, c2, c3):
    res = contextual_decoder(p, y_hat, c2, c3)
    return recon_generation(p, res, c1)


class DMCTCM:
    """DCVC-TCM codec: refs are (ref_frame, ref_feature)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(1, CH_N, support=50)
        self.bit_estimator_z_mv = BitEstimator(1, CH_N, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="laplace", scale_min=0.01, scale_max=64.0,
            scale_levels=256, support=50)
        self._cfg = None

        self._j_mv_enc = jax.jit(_stage_mv_enc)
        self._j_mv_params = jax.jit(_stage_mv_params)
        self._j_quant_dense = jax.jit(_stage_quantize_dense,
                                      static_argnums=(3,))
        self._j_index_dense = jax.jit(_stage_index_dense,
                                      static_argnums=(1,))
        self._j_mv_dec = jax.jit(_stage_mv_dec)
        self._j_motion_comp = jax.jit(_stage_motion_comp)
        self._j_motion_comp_i = jax.jit(
            lambda p, mv, rf: _stage_motion_comp(p, mv, rf, None))
        self._j_ctx_enc = jax.jit(_stage_ctx_enc)
        self._j_y_params = jax.jit(_stage_y_params)
        self._j_recon = jax.jit(_stage_recon)
        self._j_add_means = jax.jit(lambda q, m: q.astype(m.dtype) + m)

    def init_params(self, seed=0):
        self.params = dmc_tcm_init(jax.random.PRNGKey(seed))
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

    def compress(self, x, ref_frame, ref_feature):
        p = self.params
        x = jnp.asarray(x, self.dtype)

        mv_y, mv_z_hat, mv_z_int8 = self._j_mv_enc(p, x, ref_frame)
        mv_scales, mv_means = self._j_mv_params(p, mv_z_hat)
        mv_packed, mv_y_hat = self._j_quant_dense(mv_y, mv_scales,
                                                  mv_means, self._cfg)
        mv_hat = self._j_mv_dec(p, mv_y_hat)
        if ref_feature is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat, ref_frame)
        else:
            c1, c2, c3, _ = self._j_motion_comp(p, mv_hat, ref_frame,
                                                ref_feature)
        y, z_hat, z_int8 = self._j_ctx_enc(p, x, c1, c2, c3)
        scales, means = self._j_y_params(p, z_hat, c1, c2, c3)
        y_packed, y_hat = self._j_quant_dense(y, scales, means, self._cfg)

        self.entropy_coder.reset()
        self.bit_estimator_z_mv.encode_z(
            np.asarray(mv_z_int8).reshape(-1), 0)
        self.gaussian_encoder.encode_y_packed(
            np.asarray(mv_packed).reshape(-1))
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1), 0)
        self.gaussian_encoder.encode_y_packed(
            np.asarray(y_packed).reshape(-1))
        self.entropy_coder.flush()

        feature, x_hat = self._j_recon(p, y_hat, c1, c2, c3)
        return {"bit_stream": self.entropy_coder.get_encoded_stream(),
                "x_hat": x_hat, "feature": feature}

    def decompress(self, ref_frame, ref_feature, bit_stream, height,
                   width):
        p = self.params
        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(height, width, 64)
        self.bit_estimator_z_mv.decode_z(z_size, 0)
        mv_z_hat = jnp.asarray(self.bit_estimator_z_mv.get_z(z_size),
                               self.dtype)
        mv_scales, mv_means = self._j_mv_params(p, mv_z_hat)
        mv_idx = self._j_index_dense(mv_scales, self._cfg)
        self.gaussian_encoder.decode_y(np.asarray(mv_idx))
        mv_y_q = self.gaussian_encoder.get_y(mv_idx.shape)
        mv_y_hat = self._j_add_means(jnp.asarray(mv_y_q), mv_means)

        mv_hat = self._j_mv_dec(p, mv_y_hat)
        if ref_feature is None:
            c1, c2, c3, _ = self._j_motion_comp_i(p, mv_hat, ref_frame)
        else:
            c1, c2, c3, _ = self._j_motion_comp(p, mv_hat, ref_frame,
                                                ref_feature)

        self.bit_estimator_z.decode_z(z_size, 0)
        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size), self.dtype)
        scales, means = self._j_y_params(p, z_hat, c1, c2, c3)
        idx = self._j_index_dense(scales, self._cfg)
        self.gaussian_encoder.decode_y(np.asarray(idx))
        y_q = self.gaussian_encoder.get_y(idx.shape)
        y_hat = self._j_add_means(jnp.asarray(y_q), means)

        feature, x_hat = self._j_recon(p, y_hat, c1, c2, c3)
        return {"x_hat": x_hat, "feature": feature}
