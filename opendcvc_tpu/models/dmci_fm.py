"""DCVC-FM intra codec, TPU-native.

Re-design of the reference FM image model (reference:
DCVC-FM/src/models/image_model.py): gated DepthConvBlock3 enc/dec,
four-part quadtree prior with a reduction conv and DCB2 adaptors,
UNet refinement head, QP-banked q_scale vectors (64 x 128) and a
QP-banked factorized prior for z.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks_fm as FM
from ..layers.blocks import conv_init, conv_apply
from ..ops import fused as F
from ..entropy.coder import EntropyCoder
from ..entropy.models import BitEstimator, GaussianEncoder, \
    bit_estimator_init
from . import common as C

QP_NUM = 64


def dmci_fm_init(key, N=256, z_channel=128):
    ks = iter(jax.random.split(key, 48))
    p = {}
    p["enc1"] = [FM.rbs2_init(next(ks), 3, 128),
                 FM.dcb3_init(next(ks), 128, 128)]
    p["enc2"] = {
        "rbs1": FM.rbs2_init(next(ks), 128, 192),
        "dcb1": FM.dcb3_init(next(ks), 192, 192),
        "rbs2": FM.rbs2_init(next(ks), 192, N),
        "dcb2": FM.dcb3_init(next(ks), N, N),
        "down": conv_init(next(ks), N, N, 3),
    }
    p["hyper_enc"] = {
        "dcb": FM.dcb4_init(next(ks), N, z_channel),
        "c1": conv_init(next(ks), z_channel, z_channel, 3),
        "c2": conv_init(next(ks), z_channel, z_channel, 3),
    }
    p["hyper_dec"] = [FM.res_block_upsample_init(next(ks), z_channel,
                                                 z_channel),
                      FM.res_block_upsample_init(next(ks), z_channel,
                                                 z_channel),
                      FM.dcb4_init(next(ks), z_channel, N)]
    p["y_fusion"] = [FM.dcb4_init(next(ks), N, N * 2),
                     FM.dcb4_init(next(ks), N * 2, N * 2 + 2)]
    p["reduction"] = conv_init(next(ks), N * 2 + 2, N, 1)
    p["adaptor_1"] = FM.dcb2_init(next(ks), N * 2, N * 2)
    p["adaptor_2"] = FM.dcb2_init(next(ks), N * 2, N * 2)
    p["adaptor_3"] = FM.dcb2_init(next(ks), N * 2, N * 2)
    p["y_spatial_prior"] = [FM.dcb2_init(next(ks), N * 2, N * 2)
                            for _ in range(3)]
    p["dec1"] = {
        "dcb1": FM.dcb3_init(next(ks), N, N),
        "rbu1": FM.res_block_upsample_init(next(ks), N, N),
        "dcb2": FM.dcb3_init(next(ks), N, N),
        "rbu2": FM.res_block_upsample_init(next(ks), N, 192),
        "dcb3": FM.dcb3_init(next(ks), 192, 192),
        "rbu3": FM.res_block_upsample_init(next(ks), 192, 128),
    }
    p["dec2"] = {
        "dcb": FM.dcb3_init(next(ks), 128, 128),
        "rbu": FM.res_block_upsample_init(next(ks), 128, 16),
    }
    p["refine_unet"] = FM.unet_init(next(ks), 16, 16)
    p["refine_head"] = conv_init(next(ks), 16, 3, 3)
    p["q_scale_enc"] = jnp.ones((QP_NUM, 128))
    p["q_scale_dec"] = jnp.ones((QP_NUM, 128))
    p["bit_estimator_z"] = bit_estimator_init(next(ks), QP_NUM, z_channel)
    return p


def intra_encoder(p, x, q_enc):
    out = FM.rbs2_apply(p["enc1"][0], x)
    out = FM.dcb3_apply(p["enc1"][1], out)
    out = out * q_enc
    e = p["enc2"]
    out = FM.rbs2_apply(e["rbs1"], out)
    out = FM.dcb3_apply(e["dcb1"], out)
    out = FM.rbs2_apply(e["rbs2"], out)
    out = FM.dcb3_apply(e["dcb2"], out)
    return conv_apply(e["down"], out, stride=2, padding=1)


def intra_decoder(p, y_hat, q_dec):
    d = p["dec1"]
    out = FM.dcb3_apply(d["dcb1"], y_hat)
    out = FM.res_block_upsample_apply(d["rbu1"], out)
    out = FM.dcb3_apply(d["dcb2"], out)
    out = FM.res_block_upsample_apply(d["rbu2"], out)
    out = FM.dcb3_apply(d["dcb3"], out)
    out = FM.res_block_upsample_apply(d["rbu3"], out)
    out = out * q_dec
    out = FM.dcb3_apply(p["dec2"]["dcb"], out)
    out = FM.res_block_upsample_apply(p["dec2"]["rbu"], out)
    return out


def refine(p, x):
    out = FM.unet_apply(p["refine_unet"], x)
    return conv_apply(p["refine_head"], out, padding=1)


def hyper_enc_apply(hp, y_pad):
    out = FM.dcb4_apply(hp["dcb"], y_pad)
    out = FM.lrelu(conv_apply(hp["c1"], out, stride=2, padding=1), 0.01)
    return conv_apply(hp["c2"], out, stride=2, padding=1)


# ---------------------------------------------------------------------------
# stage functions
# ---------------------------------------------------------------------------

def _stage_enc_front(p, x, qp):
    q_enc = p["q_scale_enc"][qp][None, None, None, :].astype(x.dtype)
    y = intra_encoder(p, x, q_enc)
    z = hyper_enc_apply(p["hyper_enc"], C.pad_for_y(y))
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_prior(p, z_hat, y_h, y_w):
    params = FM.res_block_upsample_apply(p["hyper_dec"][0], z_hat)
    params = FM.res_block_upsample_apply(p["hyper_dec"][1], params)
    params = FM.dcb4_apply(p["hyper_dec"][2], params)
    params = FM.dcb4_apply(p["y_fusion"][0], params)
    params = FM.dcb4_apply(p["y_fusion"][1], params)
    params = params[:, :y_h, :y_w, :]
    q_enc, q_dec, scales, means = C.separate_prior_image(params)
    reduced = conv_apply(p["reduction"], params)
    return q_enc, q_dec, scales, means, reduced


def _stage_spatial(p, k, y_hat_so_far, reduced):
    cat = jnp.concatenate((y_hat_so_far, reduced), axis=-1)
    h = FM.dcb2_apply(p[f"adaptor_{k}"], cat)
    for sp in p["y_spatial_prior"]:
        h = FM.dcb2_apply(sp, h)
    c = h.shape[-1] // 2
    return h[..., :c], h[..., c:]


def _stage_fold_index(scales, k, cfg):
    _, h, w, c = scales.shape
    masks = F.checkerboard_masks_4x(h, w, c, scales.dtype)
    scales_r = F.fold_quarters(scales * masks[k])
    smin, smax, lsm, recip = cfg
    indexes, _ = F.build_index_dec(scales_r, smin, smax, lsm, recip, None)
    return indexes


def _stage_enc_pass(y_s, scales, means, y_hat_so_far, k, cfg):
    """Fused encoder pass k: masked quantization + index/pack +
    accumulation."""
    _, h, w, c = y_s.shape
    masks = F.checkerboard_masks_4x(h, w, c, y_s.dtype)
    _, y_q, y_hat_k, _ = F.process_with_mask(y_s, scales, means, masks[k],
                                             None)
    scales_r = F.fold_quarters(scales * masks[k])
    smin, smax, lsm, recip = cfg
    idx, _ = F.build_index_dec(scales_r, smin, smax, lsm, recip, None)
    packed = (F.fold_quarters(y_q).astype(jnp.int16) << 8) \
        + idx.astype(jnp.int16)
    so_far = y_hat_k if y_hat_so_far is None else y_hat_so_far + y_hat_k
    return packed, so_far


def _stage_enc_pass0(y, q_enc, scales, means, cfg):
    y_s = y * q_enc
    packed, so_far = _stage_enc_pass(y_s, scales, means, None, 0, cfg)
    return y_s, packed, so_far


def _stage_dec_restore(y_q_r, means, y_hat_so_far, k):
    _, h, w, c = means.shape
    masks = F.checkerboard_masks_4x(h, w, c, means.dtype)
    y_hat_k = F.restore_y_4x(y_q_r, means, masks[k])
    return y_hat_k if y_hat_so_far is None else y_hat_so_far + y_hat_k


def _stage_recon(p, y_hat_so_far, q_dec_prior, qp):
    y_hat = y_hat_so_far * q_dec_prior
    q_dec = p["q_scale_dec"][qp][None, None, None, :].astype(y_hat.dtype)
    out = intra_decoder(p, y_hat, q_dec)
    return jnp.clip(refine(p, out), 0.0, 1.0)


class DMCIFM:
    """FM-generation intra codec."""

    def __init__(self, N=256, z_channel=128, dtype=jnp.float32):
        self.N = N
        self.z_channel = z_channel
        self.dtype = dtype
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(QP_NUM, z_channel, support=50)
        self.gaussian_encoder = GaussianEncoder(
            distribution="gaussian", scale_min=0.11, scale_max=64.0,
            scale_levels=256, support=50)
        self._cfg = None

        self._j_enc_front = jax.jit(_stage_enc_front)
        self._j_prior = jax.jit(_stage_prior, static_argnums=(2, 3))
        self._j_spatial = jax.jit(_stage_spatial, static_argnums=(1,))
        self._j_fold_index = jax.jit(_stage_fold_index,
                                     static_argnums=(1, 2))
        self._j_enc_pass0 = jax.jit(_stage_enc_pass0, static_argnums=(4,))
        self._j_enc_pass = jax.jit(_stage_enc_pass, static_argnums=(4, 5))
        self._j_dec_restore = jax.jit(_stage_dec_restore,
                                      static_argnums=(3,))
        self._j_recon = jax.jit(_stage_recon)

    def init_params(self, seed=0):
        self.params = dmci_fm_init(jax.random.PRNGKey(seed), self.N,
                                   self.z_channel)
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

    def set_use_two_entropy_coders(self, b):
        self.entropy_coder.set_use_two_entropy_coders(b)

    def compress(self, x, q_index):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        qp = jnp.int32(q_index)
        y, z_hat, z_int8 = self._j_enc_front(p, x, qp)
        y_h, y_w = y.shape[1], y.shape[2]
        q_enc, q_dec_p, scales, means, reduced = self._j_prior(p, z_hat,
                                                               y_h, y_w)
        y_s, pk0, so_far = self._j_enc_pass0(y, q_enc, scales, means,
                                             self._cfg)
        packed = [np.asarray(pk0).reshape(-1)]
        for k in range(1, 4):
            scales, means = self._j_spatial(p, k, so_far, reduced)
            pk, so_far = self._j_enc_pass(y_s, scales, means, so_far, k,
                                          self._cfg)
            packed.append(np.asarray(pk).reshape(-1))
        y_hat_so_far = so_far

        x_hat = self._j_recon(p, y_hat_so_far, q_dec_p, qp)

        self.entropy_coder.reset()
        self.bit_estimator_z.encode_z(np.asarray(z_int8).reshape(-1),
                                      q_index)
        for pk in packed:
            self.gaussian_encoder.encode_y_packed(pk)
        self.entropy_coder.flush()
        return {"bit_stream": self.entropy_coder.get_encoded_stream(),
                "x_hat": x_hat}

    def decompress(self, bit_stream, sps):
        p = self.params
        qp = jnp.int32(sps["qp"])
        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        y_h, y_w = C.get_downsampled_shape(sps["height"], sps["width"], 16)
        self.bit_estimator_z.decode_z(z_size, sps["qp"])
        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size), self.dtype)
        _, q_dec_p, scales, means, reduced = self._j_prior(p, z_hat, y_h,
                                                           y_w)
        y_hat_so_far = None
        for k in range(4):
            if k > 0:
                scales, means = self._j_spatial(p, k, y_hat_so_far, reduced)
            idx = self._j_fold_index(scales, k, self._cfg)
            self.gaussian_encoder.decode_y(np.asarray(idx))
            y_q_r = self.gaussian_encoder.get_y(idx.shape)
            y_hat_so_far = self._j_dec_restore(
                jnp.asarray(y_q_r, self.dtype), means, y_hat_so_far, k)

        x_hat = self._j_recon(p, y_hat_so_far, q_dec_p, qp)
        return {"x_hat": x_hat}
