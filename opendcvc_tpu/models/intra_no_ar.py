"""IntraNoAR — HEM/DC-era hyperprior image codec, TPU-native.

Re-design of the reference IntraNoAR (reference:
DCVC-family/DCVC-HEM/src/models/image_model.py:15-99): residual-block
enc/dec towers (dec to 16ch + UNet refine head), 5-conv hyper towers,
conv-stack prior fusion producing (q_step, scales, means), dual-prior
two-pass checkerboard coding, continuous rate via q_basic * q_scale.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_hem as H
from ..layers.blocks import conv_init, conv_apply
from ..ops import fused as F
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C


def intra_no_ar_init(key, N=192, anchor_num=4):
    ks = iter(jax.random.split(key, 16))
    p = {}
    p["enc"] = H.enc_tower_init(next(ks), 3, N)
    p["dec"] = H.dec_tower_init(next(ks), 16, N)
    p["refine_unet"] = H.unet_init(next(ks), 16, 16)
    p["refine_head"] = conv_init(next(ks), 16, 3, 3)
    p["hyper_enc"] = H.hyper_enc_init(next(ks), N, N)
    p["hyper_dec"] = H.hyper_dec_init(next(ks), N, N, out_factor=2)
    p["y_prior_fusion"] = H.conv_lrelu_stack_init(
        next(ks), [N * 2, N * 3, N * 3, N * 3])
    p["y_spatial_prior"] = H.conv_lrelu_stack_init(
        next(ks), [N * 4, N * 3, N * 3, N * 2])
    p["q_basic"] = jnp.ones((N,))
    p["q_scale"] = jnp.ones((anchor_num,))
    p["bit_estimator_z"] = bit_estimator_init(next(ks), 1, N)
    return p


def _stage_enc_front(p, x, q):
    y = H.enc_tower_apply(p["enc"], x) / q
    z = H.hyper_enc_apply(p["hyper_enc"], y)
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_prior(p, z_hat):
    params = H.hyper_dec_apply(p["hyper_dec"], z_hat)
    fused = H.conv_lrelu_stack_apply(p["y_prior_fusion"], params)
    c = fused.shape[-1] // 3
    q_step = jnp.maximum(fused[..., :c], 0.5)
    return q_step, fused[..., c:2 * c], fused[..., 2 * c:]


def _stage_spatial(p, y_hat_0, means, scales, q_step):
    cat = jnp.concatenate((y_hat_0, means, scales, q_step), axis=-1)
    out = H.conv_lrelu_stack_apply(p["y_spatial_prior"], cat)
    q = out.shape[-1] // 4
    scales1 = jnp.concatenate((out[..., :q], out[..., 2 * q:3 * q]),
                              axis=-1)
    means1 = jnp.concatenate((out[..., q:2 * q], out[..., 3 * q:]), axis=-1)
    return scales1, means1


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


def _stage_recon(p, y_hat, q):
    out = H.dec_tower_apply(p["dec"], y_hat * q)
    out = H.unet_apply(p["refine_unet"], out)
    out = conv_apply(p["refine_head"], out, padding=1)
    return jnp.clip(out, 0.0, 1.0)


class IntraNoAR:
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
        self.params = intra_no_ar_init(jax.random.PRNGKey(seed), self.N,
                                       self.anchor_num)
        return self.params

    def load_params(self, params):
        self.params = params

    def update(self, force=False):
        self.entropy_coder = EntropyCoder()
        self.gaussian_encoder.update(self.entropy_coder)
        self.bit_estimator_z.update(self.params["bit_estimator_z"],
                                    self.entropy_coder)
        self._cfg = (self.gaussian_encoder.SCALE_MIN,
                     self.gaussian_encoder.SCALE_MAX,
                     float(np.log(self.gaussian_encoder.SCALE_MIN)),
                     self.gaussian_encoder.log_step_recip)
        if getattr(self, "_stages", None) is None:
            from .prior_stages import make_pass_stages
            self._stages = make_pass_stages(self._cfg, 2)
            self._one = jnp.ones((), self.dtype)

    def get_q_scales(self):
        return np.asarray(self.params["q_scale"]).reshape(-1)

    def _q(self, q_scale):
        return (jnp.maximum(self.params["q_basic"], 0.5)
                * jnp.asarray(q_scale))[None, None, None, :].astype(
                    self.dtype)

    def compress(self, x, q_scale):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        q = self._q(q_scale)
        st = self._stages
        y, z_hat, z_int8 = self._j_enc_front(p, x, q)
        q_step, scales, means = self._j_prior(p, z_hat)
        y_div, packed0, y_hat_0 = st["enc_pass0_qstep"](y, q_step, scales,
                                                        means)
        scales1, means1 = self._j_spatial(p, y_hat_0, means, scales, q_step)
        packed1, y_hat_1 = st["enc_pass_k"](y_div, scales1, means1, None, 1)
        y_hat = st["finalize_qstep"](y_hat_0, y_hat_1, q_step,
                                     self._one)

        x_hat = self._j_recon(p, y_hat, q)

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
        q = self._q(q_scale)
        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(height, width, 64)
        self.bit_estimator_z.decode_z(z_size, 0)
        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size), self.dtype)
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
        y_hat = st["finalize_qstep"](y_hat_0, y_hat_1, q_step,
                                     self._one)

        x_hat = self._j_recon(p, y_hat, q)
        return {"x_hat": x_hat}
