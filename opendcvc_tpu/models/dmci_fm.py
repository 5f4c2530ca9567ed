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


# ---------------------------------------------------------------------------
# fused per-frame device-EC megastages (same design as models/dmci.py):
# ONE compiled program per frame per side; the five symbol planes
# (z + four quadtree passes) code back-to-back per lane with rANS state
# continuation, and only a dense ~true-bpp staging vector crosses the
# link.
# ---------------------------------------------------------------------------


def _compress_frame_ifm(p, x, qp, cum_hl, cfg, lanes, mw, n_y_rows,
                        cap, z_channel):
    from ..entropy.device_rans import (_encode_scan_carry, _slice_rows,
                                       densify_segment,
                                       encode_carry_init)
    from .dmc import _lane_layout, _cm_flat, _z_rows
    y, z_hat, z_int8 = _stage_enc_front(p, x, qp)
    y_h, y_w = y.shape[1], y.shape[2]
    q_enc, q_dec_p, scales, means, reduced = _stage_prior(p, z_hat,
                                                          y_h, y_w)
    planes = []
    y_s, pk0, so_far = _stage_enc_pass0(y, q_enc, scales, means, cfg)
    planes.append(pk0)
    for k in range(1, 4):
        scales, means = _stage_spatial(p, k, so_far, reduced)
        pk, so_far = _stage_enc_pass(y_s, scales, means, so_far, k, cfg)
        planes.append(pk)
    x_hat = _stage_recon(p, so_far, q_dec_p, qp)

    carry = encode_carry_init(lanes, mw)
    cum_y = jax.lax.slice(cum_hl, (0, 0), (n_y_rows, cum_hl.shape[1]))
    for pk in reversed(planes):
        flat = _cm_flat(pk).astype(jnp.int32)
        s_l, r_l = _lane_layout(flat >> 8, flat & 255, lanes, True)
        carry = _encode_scan_carry(s_l, r_l, cum_y, carry)
    z_sym = _cm_flat(z_int8).astype(jnp.int32)
    z_rows = _z_rows(z_sym.shape[0], z_channel, qp, n_y_rows)
    s_l, r_l = _lane_layout(z_sym, z_rows, lanes, True)
    cum_sub, rows_local = _slice_rows(cum_hl, r_l, z_channel,
                                      n_y_rows + qp * z_channel)
    state, cursors, buf = _encode_scan_carry(s_l, rows_local, cum_sub,
                                             carry)
    return x_hat, densify_segment(buf, cursors, state, cap)


def _decompress_frame_ifm(p, staging, qp, cum_hl, cfg, zh, zw, y_h,
                          y_w, z_channel, lanes, n_y_rows, cap, mw,
                          dt_name):
    from ..entropy.device_rans import (_decode_scan_carry, _slice_rows,
                                       _undensify_device)
    from .dmc import (_lane_layout, _lane_unlayout, _cm_flat,
                      _cm_unflat, _z_rows)
    data, states = _undensify_device(staging, cap, lanes, mw)
    carry = (states.astype(jnp.uint32), jnp.zeros((lanes,), jnp.int32))

    n_z = zh * zw * z_channel
    z_rows = _z_rows(n_z, z_channel, qp, n_y_rows)
    rows_l, _ = _lane_layout(z_rows, z_rows, lanes, False)
    cum_sub, rows_local = _slice_rows(cum_hl, rows_l, z_channel,
                                      n_y_rows + qp * z_channel)
    z_syms, carry = _decode_scan_carry(data, rows_local, cum_sub, carry)
    z_hat = _cm_unflat(_lane_unlayout(z_syms, n_z),
                       (1, zh, zw, z_channel)).astype(jnp.dtype(dt_name))

    _, q_dec_p, scales, means, reduced = _stage_prior(p, z_hat, y_h,
                                                      y_w)

    cum_y = jax.lax.slice(cum_hl, (0, 0), (n_y_rows, cum_hl.shape[1]))
    y_hat_so_far = None
    for k in range(4):
        if k > 0:
            scales, means = _stage_spatial(p, k, y_hat_so_far, reduced)
        indexes = _stage_fold_index(scales, k, cfg)
        _, ih, iw, ic = indexes.shape
        n_y = ih * iw * ic
        idx_cm = _cm_flat(indexes).astype(jnp.int32)
        rows_l, _ = _lane_layout(idx_cm, idx_cm, lanes, False)
        y_syms, carry = _decode_scan_carry(data, rows_l, cum_y, carry)
        y_q_r = _cm_unflat(_lane_unlayout(y_syms, n_y),
                           (1, ih, iw, ic)).astype(means.dtype)
        y_hat_so_far = _stage_dec_restore(y_q_r, means, y_hat_so_far, k)

    return _stage_recon(p, y_hat_so_far, q_dec_p, qp)


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

        import os as _os
        from ..utils.common import env_flag
        self.device_ec = env_flag("OPENDCVC_TPU_DEVICE_EC")
        self.ec_lanes = int(_os.environ.get("OPENDCVC_TPU_EC_LANES",
                                            4096))
        self.ec_bps = float(_os.environ.get("OPENDCVC_TPU_EC_BPS", 0.5))
        # adaptive D2H fetch windows (transfer slimming)
        self._fetch_windows = {}
        self.device_encoder = None
        self.device_decoder = None
        self._j_compress_frame = jax.jit(
            _compress_frame_ifm, static_argnums=(4, 5, 6, 7, 8, 9))
        self._j_decompress_frame = jax.jit(
            _decompress_frame_ifm,
            static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))

    def init_params(self, seed=0):
        # one compiled program (see models/dmc.py init_params)
        self.params = jax.jit(
            lambda k: dmci_fm_init(k, self.N, self.z_channel))(
                jax.random.PRNGKey(seed))
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
        if self.device_ec:
            C.assert_determinism_flags()
            from ..entropy.device_rans import (DeviceRansEncoder,
                                               DeviceRansDecoder,
                                               full_range_cdf_rows)
            y_rows = full_range_cdf_rows(*self.gaussian_encoder.cdf_info)
            z_rows = full_range_cdf_rows(*self.bit_estimator_z.cdf_info)
            self.device_encoder = DeviceRansEncoder(
                lanes=self.ec_lanes, bytes_per_symbol=self.ec_bps)
            self.device_encoder.set_tables(y_rows, z_rows)
            self.device_decoder = DeviceRansDecoder()
            self.device_decoder.set_tables(y_rows, z_rows)

    def set_use_two_entropy_coders(self, b):
        self.entropy_coder.set_use_two_entropy_coders(b)

    def _mw_cap_for(self, H, W, bps=None, top_rung=False):
        from ..entropy.device_rans import effective_lanes
        if bps is None:
            bps = self.device_encoder.bytes_per_symbol
        y_h, y_w = C.get_downsampled_shape(H, W, 16)
        zh, zw = C.get_downsampled_shape(H, W, 64)
        n_y = y_h * y_w * self.N // 4
        n_z = zh * zw * self.z_channel
        # lanes scale with the symbol count (~6 B/lane overhead)
        lanes = effective_lanes(self.device_encoder.lanes,
                                4 * n_y + n_z)
        k_total = 4 * (-(-n_y // lanes)) + (-(-n_z // lanes))
        mw = max(8, int(k_total * bps / 2)) + 4
        cap = lanes * mw if top_rung else max(4096, lanes * mw // 2)
        return mw, cap, lanes * k_total, k_total, lanes

    def _compress_device(self, x, q_index):
        from ..entropy.device_rans import (serialize_frame_dense,
                                           slim_fetch,
                                           undensify_packed)
        enc = self.device_encoder
        H, W = x.shape[1], x.shape[2]
        qp_dev = np.int32(q_index)
        bps = enc.bytes_per_symbol
        mw, cap, n_total, k_total, lanes = self._mw_cap_for(H, W, bps)
        x_hat, staging = self._j_compress_frame(
            self.params, x, qp_dev, enc.cum_hl, self._cfg, lanes,
            mw, enc.n_y_rows, cap, self.z_channel)
        fetch = slim_fetch(self._fetch_windows, staging, lanes, cap,
                           tail_extra=0)
        dense, ln, st = undensify_packed(fetch(), cap, lanes)
        for _ in range(8):
            if int(ln.max(initial=0)) < mw - 2 and int(ln.sum()) <= cap:
                break
            top = bps >= 3.0
            bps = min(bps * 2, 3.0)
            mw, cap, n_total, k_total, lanes = self._mw_cap_for(
                H, W, bps, top_rung=top)
            _, staging = self._j_compress_frame(
                self.params, x, qp_dev, enc.cum_hl, self._cfg,
                lanes, mw, enc.n_y_rows, cap, self.z_channel)
            dense, ln, st = undensify_packed(jax.device_get(staging),
                                             cap, lanes)
        else:
            raise OverflowError(
                "device rANS staging overflowed at the top ladder rung")
        return {"bit_stream": serialize_frame_dense(dense, ln, st,
                                                    n_total, k_total,
                                                    mw, cap),
                "x_hat": x_hat}

    def _decompress_device(self, bit_stream, sps):
        from ..entropy.device_rans import upload_stagings
        dec = self.device_decoder
        metas, stagings = upload_stagings([bit_stream])
        m = metas[0]
        stream_dev = stagings[0]
        zh, zw = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        y_h, y_w = C.get_downsampled_shape(sps["height"], sps["width"],
                                           16)
        x_hat = self._j_decompress_frame(
            self.params, stream_dev, np.int32(sps["qp"]), dec.cum_hl,
            self._cfg, zh, zw, y_h, y_w, self.z_channel, m["L"],
            dec.n_y_rows, m["cap"], m["MW"],
            np.dtype(self.dtype).name)
        return {"x_hat": x_hat}

    def compress(self, x, q_index):
        p = self.params
        x = jnp.asarray(x, self.dtype)
        qp = jnp.int32(q_index)
        if self.device_ec:
            return self._compress_device(x, q_index)
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
        if self.device_ec:
            return self._decompress_device(bit_stream, sps)
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
