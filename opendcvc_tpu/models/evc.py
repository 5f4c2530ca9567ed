"""EVC — real-time scalable image codec, TPU-native.

Re-design of the reference EVC (reference:
DCVC-family/EVC/src/models/image_model.py, scalable_encoder_model.py):
a hyperprior image codec with a dual-prior (two-pass checkerboard)
entropy model, width-scalable encoder/decoder variants
(EVC_{LL,LM,LS,SL,ML,SS,MM,MS}), continuous rate via a single learned
q_basic scaled by a scalar q_scale (coded as round(q*100) in the
header), and the mask-decay ScalableEnc with enc_num parallel encoders.

The dual prior maps exactly onto the framework's channel-half
checkerboard machinery (ops.checkerboard_masks_2x): pass-0 codes
[first-half x even-checker, second-half x odd-checker], pass 1 the
complement; the spatial-prior input is cat(y_hat_pass0, means, scales,
q_step) (reference common_model.py:76-164).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_evc as E
from ..layers.blocks import conv_init, conv_apply
from ..ops import fused as F
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C


# ---------------------------------------------------------------------------
# sub-networks
# ---------------------------------------------------------------------------

def enc_init(key, channels, in_ch=3):
    c2, c4, c8, c16 = channels
    ks = jax.random.split(key, 7)
    return {
        "rbs1": E.res_block_stride_init(ks[0], in_ch, c2),
        "dcb1": E.dcb_init(ks[1], c2, c2),
        "rbs2": E.res_block_stride_init(ks[2], c2, c4),
        "dcb2": E.dcb_init(ks[3], c4, c4),
        "rbs3": E.res_block_stride_init(ks[4], c4, c8),
        "dcb3": E.dcb_init(ks[5], c8, c8),
        "down": conv_init(ks[6], c8, c16, 3),
    }


def enc_apply(p, x):
    h = E.res_block_stride_apply(p["rbs1"], x)
    h = E.dcb_apply(p["dcb1"], h)
    h = E.res_block_stride_apply(p["rbs2"], h)
    h = E.dcb_apply(p["dcb2"], h)
    h = E.res_block_stride_apply(p["rbs3"], h)
    h = E.dcb_apply(p["dcb3"], h)
    return conv_apply(p["down"], h, stride=2, padding=1)


def dec_init(key, channels, out_ch=3):
    c2, c4, c8, c16 = channels
    ks = jax.random.split(key, 8)
    return {
        "dcb1": E.dcb_init(ks[0], c16, c16),
        "rbu1": E.res_block_upsample_init(ks[1], c16, c8),
        "dcb2": E.dcb_init(ks[2], c8, c8),
        "rbu2": E.res_block_upsample_init(ks[3], c8, c4),
        "dcb3": E.dcb_init(ks[4], c4, c4),
        "rbu3": E.res_block_upsample_init(ks[5], c4, c2),
        "dcb4": E.dcb_init(ks[6], c2, c2),
        "subpel": E.subpel1x1_init(ks[7], c2, out_ch),
    }


def dec_apply(p, y):
    h = E.dcb_apply(p["dcb1"], y)
    h = E.res_block_upsample_apply(p["rbu1"], h)
    h = E.dcb_apply(p["dcb2"], h)
    h = E.res_block_upsample_apply(p["rbu2"], h)
    h = E.dcb_apply(p["dcb3"], h)
    h = E.res_block_upsample_apply(p["rbu3"], h)
    h = E.dcb_apply(p["dcb4"], h)
    return E.subpel1x1_apply(p["subpel"], h)


def hyper_init(key, N):
    ks = jax.random.split(key, 9)
    return {
        "he_dcb": E.hp_dcb_init(ks[0], N, N),
        "he_c1": conv_init(ks[1], N, N, 3),
        "he_c2": conv_init(ks[2], N, N, 3),
        "hd_up1": E.hp_dcb_upsample_init(ks[3], N, N),
        "hd_up2": E.hp_dcb_upsample_init(ks[4], N, N),
        "hd_dcb": E.hp_dcb_init(ks[5], N, N),
        "fusion1": E.hp_dcb_init(ks[6], N, N * 2),
        "fusion2": E.hp_dcb_init(ks[7], N * 2, N * 3),
    }


def hyper_enc_apply(p, y):
    h = E.hp_dcb_apply(p["he_dcb"], y)
    h = E.lrelu(conv_apply(p["he_c1"], h, stride=2, padding=1), 0.01)
    return conv_apply(p["he_c2"], h, stride=2, padding=1)


def hyper_dec_fusion_apply(p, z_hat):
    h = E.hp_dcb_upsample_apply(p["hd_up1"], z_hat)
    h = E.hp_dcb_upsample_apply(p["hd_up2"], h)
    h = E.hp_dcb_apply(p["hd_dcb"], h)
    h = E.hp_dcb_apply(p["fusion1"], h)
    return E.hp_dcb_apply(p["fusion2"], h)


def dual_prior_init(key, N):
    ks = jax.random.split(key, 3)
    return [E.hp_dcb_init(ks[0], N * 4, N * 3),
            E.hp_dcb_init(ks[1], N * 3, N * 2),
            E.hp_dcb_init(ks[2], N * 2, N * 2)]


def dual_prior_apply(plist, x):
    for p in plist:
        x = E.hp_dcb_apply(p, x)
    return x


ENC_DEC_CHANNELS = {
    "L": [192, 192, 192, 192],
    "M": [128, 128, 192, 192],
    "S": [64, 64, 128, 192],
}


def evc_init(key, N=192, enc_width="L", dec_width="L", anchor_num=4,
             enc_num=1):
    ks = jax.random.split(key, 8)
    p = {}
    if enc_num > 1:
        p["encs"] = [enc_init(k, ENC_DEC_CHANNELS["S"])
                     for k in jax.random.split(ks[0], enc_num)]
    else:
        p["enc"] = enc_init(ks[0], ENC_DEC_CHANNELS[enc_width])
    p["dec"] = dec_init(ks[1], ENC_DEC_CHANNELS[dec_width])
    p["hyper"] = hyper_init(ks[2], N)
    p["y_spatial_prior"] = dual_prior_init(ks[3], N)
    p["q_basic"] = jnp.ones((N,))
    p["q_scale"] = jnp.ones((anchor_num,))
    p["bit_estimator_z"] = bit_estimator_init(ks[4], 1, N)
    return p


# ---------------------------------------------------------------------------
# jit stage functions (shared = used by both encoder and decoder)
# ---------------------------------------------------------------------------

def _curr_q(p, q_scale, dtype):
    q_basic = jnp.maximum(p["q_basic"], 0.5)
    return (q_basic * q_scale)[None, None, None, :].astype(dtype)


def _stage_enc_front(p, x, q_scale):
    y = enc_apply(p["enc"], x) / _curr_q(p, q_scale, x.dtype)
    z = hyper_enc_apply(p["hyper"], y)
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_prior(p, z_hat):
    """Shared: z -> (q_step clamped, scales, means)."""
    params = hyper_dec_fusion_apply(p["hyper"], z_hat)
    c = params.shape[-1] // 3
    q_step = jnp.maximum(params[..., :c], 0.5)
    scales = params[..., c:2 * c]
    means = params[..., 2 * c:]
    return q_step, scales, means


def _stage_spatial(p, y_hat_0, means, scales, q_step):
    """Shared: dual-prior second pass (common_model.py:100-101).
    Output channel order (scales_0, means_0, scales_1, means_1) quarters
    -> full-tensor (scales, means)."""
    cat = jnp.concatenate((y_hat_0, means, scales, q_step), axis=-1)
    out = dual_prior_apply(p["y_spatial_prior"], cat)
    q = out.shape[-1] // 4
    scales1 = jnp.concatenate((out[..., :q], out[..., 2 * q:3 * q]), axis=-1)
    means1 = jnp.concatenate((out[..., q:2 * q], out[..., 3 * q:]), axis=-1)
    return scales1, means1


def _fold_index_cfg(ge):
    return (ge.SCALE_MIN, ge.SCALE_MAX, float(np.log(ge.SCALE_MIN)),
            ge.log_step_recip)


def _stage_fold_index(scales, k, cfg):
    _, h, w, c = scales.shape
    masks = F.checkerboard_masks_2x(h, w, c, scales.dtype)
    scales_r = F.fold_halves(scales * masks[k])
    smin, smax, lsm, recip = cfg
    indexes, _ = F.build_index_dec(scales_r, smin, smax, lsm, recip, None)
    return indexes


def _stage_enc_mask(y, scales, means, k):
    _, h, w, c = y.shape
    masks = F.checkerboard_masks_2x(h, w, c, y.dtype)
    _, y_q, y_hat, _ = F.process_with_mask(y, scales, means, masks[k], None)
    return F.fold_halves(y_q).astype(jnp.int16), y_hat


def _stage_dec_restore(y_q_r, means, k):
    _, h, w, c = means.shape
    masks = F.checkerboard_masks_2x(h, w, c, means.dtype)
    return F.restore_y_2x(y_q_r, means, masks[k])


def _stage_recon(p, y_hat_0, y_hat_1, q_step, q_scale):
    y_hat = (y_hat_0 + y_hat_1) * q_step \
        * _curr_q(p, q_scale, y_hat_0.dtype)
    return jnp.clip(dec_apply(p["dec"], y_hat), 0.0, 1.0)


# ---------------------------------------------------------------------------
# host orchestrator
# ---------------------------------------------------------------------------

class EVC:
    """Base EVC; width variants select encoder/decoder channel plans."""

    enc_width = "L"
    dec_width = "L"

    def __init__(self, N=192, anchor_num=4, dtype=jnp.float32):
        self.N = N
        self.anchor_num = anchor_num
        self.dtype = dtype
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(1, N, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="gaussian", scale_min=0.11, scale_max=64.0,
            scale_levels=256, support=50)
        self._cfg = None

        self._j_enc_front = jax.jit(_stage_enc_front)
        self._j_prior = jax.jit(_stage_prior)
        self._j_spatial = jax.jit(_stage_spatial)
        self._j_fold_index = jax.jit(_stage_fold_index,
                                     static_argnums=(1, 2))
        self._j_enc_mask = jax.jit(_stage_enc_mask, static_argnums=(3,))
        self._j_dec_restore = jax.jit(_stage_dec_restore,
                                      static_argnums=(2,))
        self._j_recon = jax.jit(_stage_recon)

    def init_params(self, seed=0):
        self.params = evc_init(jax.random.PRNGKey(seed), self.N,
                               self.enc_width, self.dec_width,
                               self.anchor_num)
        if self.dtype != jnp.float32:
            self.params = jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype)
                if a.dtype == jnp.float32 else a, self.params)
        return self.params

    def load_params(self, params):
        self.params = params

    def update(self):
        self.entropy_coder = EntropyCoder()
        self.gaussian_encoder.update(self.entropy_coder)
        self.bit_estimator_z.update(self.params["bit_estimator_z"],
                                    self.entropy_coder)
        self._cfg = _fold_index_cfg(self.gaussian_encoder)
        if getattr(self, "_stages", None) is None:
            from .prior_stages import make_pass_stages
            self._stages = make_pass_stages(self._cfg, 2)

    def get_q_scales(self):
        return np.asarray(self.params["q_scale"]).reshape(-1)

    # -- compress/decompress -------------------------------------------------

    def compress(self, x, q_scale):
        p = self.params
        st = self._stages
        x = jnp.asarray(x, self.dtype)
        q_scale = np.asarray(q_scale, np.float32)

        y, z_hat, z_int8 = self._j_enc_front(p, x, q_scale)
        q_step, scales, means = self._j_prior(p, z_hat)

        y_div, packed0, y_hat_0 = st["enc_pass0_qstep"](y, q_step, scales,
                                                        means)
        scales1, means1 = self._j_spatial(p, y_hat_0, means, scales, q_step)
        packed1, y_hat_1 = st["enc_pass_k"](y_div, scales1, means1, None, 1)
        x_hat = self._j_recon(p, y_hat_0, y_hat_1, q_step, q_scale)

        self.entropy_coder.reset()
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1), 0)
        self.gaussian_encoder.encode_y_packed(
            np.asarray(packed0).reshape(-1))
        self.gaussian_encoder.encode_y_packed(
            np.asarray(packed1).reshape(-1))
        self.entropy_coder.flush()
        return {"bit_stream": self.entropy_coder.get_encoded_stream(),
                "x_hat": x_hat}

    def decompress(self, bit_stream, height, width, q_scale):
        p = self.params
        q_scale = jnp.asarray(q_scale, self.dtype)
        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(height, width, 64)
        self.bit_estimator_z.decode_z(z_size, 0)
        z_np = self.bit_estimator_z.get_z(z_size)
        z_hat = jnp.asarray(z_np, self.dtype)

        q_step, scales, means = self._j_prior(p, z_hat)

        st = self._stages
        idx0 = st["dec_index_k"](scales, 0)
        self.gaussian_encoder.decode_y(np.asarray(idx0))
        y_q_r0 = self.gaussian_encoder.get_y(idx0.shape)
        y_hat_0 = st["dec_restore_acc"](jnp.asarray(y_q_r0, self.dtype),
                                        means, None, 0)
        scales1, means1 = self._j_spatial(p, y_hat_0, means, scales, q_step)
        idx1 = st["dec_index_k"](scales1, 1)
        self.gaussian_encoder.decode_y(np.asarray(idx1))
        y_q_r1 = self.gaussian_encoder.get_y(idx1.shape)
        y_hat_1 = st["dec_restore_acc"](jnp.asarray(y_q_r1, self.dtype),
                                        means1, None, 1)

        x_hat = self._j_recon(p, y_hat_0, y_hat_1, q_step, q_scale)
        return {"x_hat": x_hat}


class EVC_LL(EVC):
    enc_width, dec_width = "L", "L"


class EVC_LM(EVC):
    enc_width, dec_width = "L", "M"


class EVC_LS(EVC):
    enc_width, dec_width = "L", "S"


class EVC_ML(EVC):
    enc_width, dec_width = "M", "L"


class EVC_SL(EVC):
    enc_width, dec_width = "S", "L"


class EVC_MM(EVC):
    enc_width, dec_width = "M", "M"


class EVC_MS(EVC):
    enc_width, dec_width = "M", "S"


class EVC_SS(EVC):
    enc_width, dec_width = "S", "S"


class ScalableEVC(EVC):
    """Mask-decay scalable encoder: enc_num small encoders whose latents
    are cumulatively summed; set_rate picks the operating point
    (reference scalable_encoder_model.py:27-143)."""

    enc_width, dec_width = "S", "L"

    def __init__(self, N=192, anchor_num=4, enc_num=4, dtype=jnp.float32):
        super().__init__(N, anchor_num, dtype)
        self.enc_num = enc_num
        self.rate = 0

    def init_params(self, seed=0):
        self.params = evc_init(jax.random.PRNGKey(seed), self.N,
                               "S", "L", self.anchor_num,
                               enc_num=self.enc_num)
        return self.params

    def set_rate(self, rate):
        assert 0 <= rate < self.enc_num
        self.rate = rate

    def _enc_front_for_rate(self, rate):
        if not hasattr(self, "_enc_fronts"):
            self._enc_fronts = {}
        if rate not in self._enc_fronts:
            def enc_front(p_all, x_in, q_scale_in):
                # cumulative latent over the first (rate+1) encoders
                y = enc_apply(p_all["encs"][0], x_in)
                for e in p_all["encs"][1:rate + 1]:
                    y = y + enc_apply(e, x_in)
                q = jnp.maximum(p_all["q_basic"], 0.5) * \
                    q_scale_in.astype(x_in.dtype)
                y = y / q[None, None, None, :]
                z = hyper_enc_apply(p_all["hyper"], y)
                z_hat, z_int8 = F.round_and_to_int8(z)
                return y, z_hat.astype(x_in.dtype), z_int8
            self._enc_fronts[rate] = jax.jit(enc_front)
        return self._enc_fronts[rate]

    def compress(self, x, q_scale):
        enc_front = self._enc_front_for_rate(self.rate)
        st = self._stages
        x_dev = jnp.asarray(x, self.dtype)
        qs = np.asarray(q_scale, np.float32)
        y, z_hat, z_int8 = enc_front(self.params, x_dev, jnp.asarray(qs))
        q_step, scales, means = self._j_prior(self.params, z_hat)

        y_div, packed0, y_hat_0 = st["enc_pass0_qstep"](y, q_step, scales,
                                                        means)
        scales1, means1 = self._j_spatial(self.params, y_hat_0, means,
                                          scales, q_step)
        packed1, y_hat_1 = st["enc_pass_k"](y_div, scales1, means1, None, 1)
        x_hat = self._j_recon(self.params, y_hat_0, y_hat_1, q_step, qs)

        self.entropy_coder.reset()
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1), 0)
        self.gaussian_encoder.encode_y_packed(
            np.asarray(packed0).reshape(-1))
        self.gaussian_encoder.encode_y_packed(
            np.asarray(packed1).reshape(-1))
        self.entropy_coder.flush()
        return {"bit_stream": self.entropy_coder.get_encoded_stream(),
                "x_hat": x_hat}


Scale_EVC_SS = ScalableEVC
Scale_EVC_SL = ScalableEVC
