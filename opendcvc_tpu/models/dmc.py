"""DMC — P-frame video codec with implicit temporal modeling, TPU-native.

Re-design of the reference DCVC-RT video codec (reference:
src/models/video_model.py): no motion coding; a propagated decoder-side
feature (g_ch_d=256 at 1/8 resolution) carries temporal context, a single
low-resolution latent (g_ch_y=128 at 1/16) is coded with a two-pass
checkerboard spatial prior fused from hyper + temporal priors, and
per-QP parameter banks (64+8 rows for hierarchical-QP shifts) modulate
every stage.

Bit-exactness contract: every stage both encoder and decoder evaluate
(feature extraction, prior fusion, spatial-prior pass, the latent decoder
producing the NEXT reference feature, reconstruction) is ONE shared jitted
function, so the temporal prediction chain cannot drift between the two
sides over arbitrarily long GOPs (intra period -1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..layers import blocks as L
from ..ops import fused as F
from ..entropy.coder import EntropyCoder
from ..entropy.models import (BitEstimator, GaussianEncoder,
                              bit_estimator_init)
from . import common as C

QP_SHIFT = [0, 8, 4]
EXTRA_QP = max(QP_SHIFT)

G_CH_SRC_D = 3 * 8 * 8
G_CH_RECON = 320
G_CH_Y = 128
G_CH_Z = 128
G_CH_D = 256


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def dmc_init(key, qp_num=C.QP_NUM):
    ks = iter(jax.random.split(key, 64))
    p = {}
    p["feature_adaptor_i"] = L.depth_conv_block_init(next(ks), G_CH_SRC_D,
                                                     G_CH_D)
    p["feature_adaptor_p"] = L.conv_init(next(ks), G_CH_D, G_CH_D, 1)
    p["fe_conv1"] = [L.depth_conv_block_init(next(ks), G_CH_D, G_CH_D)
                     for _ in range(2)]
    p["fe_conv2"] = [L.depth_conv_block_init(next(ks), G_CH_D, G_CH_D)
                     for _ in range(4)]

    p["enc_conv1"] = L.conv_init(next(ks), G_CH_SRC_D, G_CH_D, 1)
    p["enc_conv2"] = [
        L.depth_conv_block_init(next(ks), G_CH_D * 2, G_CH_D),
        L.depth_conv_block_init(next(ks), G_CH_D, G_CH_D),
    ]
    p["enc_conv3"] = L.depth_conv_block_init(next(ks), G_CH_D, G_CH_D)
    p["enc_down"] = L.conv_init(next(ks), G_CH_D, G_CH_Y, 3)

    p["hyper_enc"] = [
        L.depth_conv_block_init(next(ks), G_CH_Y, G_CH_Z),
        L.res_block_stride2_init(next(ks), G_CH_Z, G_CH_Z),
        L.res_block_stride2_init(next(ks), G_CH_Z, G_CH_Z),
    ]
    p["hyper_dec"] = [
        L.res_block_upsample_init(next(ks), G_CH_Z, G_CH_Z),
        L.res_block_upsample_init(next(ks), G_CH_Z, G_CH_Z),
        L.depth_conv_block_init(next(ks), G_CH_Z, G_CH_Y),
    ]
    p["temporal_prior"] = L.res_block_stride2_init(next(ks), G_CH_D,
                                                   G_CH_Y * 2)
    p["y_prior_fusion"] = [
        L.depth_conv_block_init(next(ks), G_CH_Y * 3, G_CH_Y * 3),
        L.depth_conv_block_init(next(ks), G_CH_Y * 3, G_CH_Y * 3),
        L.depth_conv_block_init(next(ks), G_CH_Y * 3, G_CH_Y * 3),
        L.conv_init(next(ks), G_CH_Y * 3, G_CH_Y * 3, 1),
    ]
    p["y_spatial_prior"] = [
        L.depth_conv_block_init(next(ks), G_CH_Y * 4, G_CH_Y * 3),
        L.depth_conv_block_init(next(ks), G_CH_Y * 3, G_CH_Y * 3),
        L.conv_init(next(ks), G_CH_Y * 3, G_CH_Y * 2, 1),
    ]

    p["dec_up"] = L.subpel_conv2x_init(next(ks), G_CH_Y, G_CH_D, 3)
    p["dec_conv1"] = [
        L.depth_conv_block_init(next(ks), G_CH_D * 2, G_CH_D),
        L.depth_conv_block_init(next(ks), G_CH_D, G_CH_D),
        L.depth_conv_block_init(next(ks), G_CH_D, G_CH_D),
    ]
    p["dec_conv2"] = L.conv_init(next(ks), G_CH_D, G_CH_D, 1)

    p["recon_conv"] = [
        L.depth_conv_block_init(next(ks), G_CH_D, G_CH_RECON),
        L.depth_conv_block_init(next(ks), G_CH_RECON, G_CH_RECON),
        L.depth_conv_block_init(next(ks), G_CH_RECON, G_CH_RECON),
        L.depth_conv_block_init(next(ks), G_CH_RECON, G_CH_RECON),
    ]
    p["recon_head"] = L.conv_init(next(ks), G_CH_RECON, G_CH_SRC_D, 1)

    n_qp = qp_num + EXTRA_QP
    # Initialize the rate-control banks as a log-spaced ladder
    # (qp 0 = highest rate), the shape the family codecs DERIVE their
    # 64-step ladders from (DCVC-DC log-interpolated anchors,
    # common_model.py:311-341; DCVC-FM get_curr_q, common_model.py:
    # 37-52); training refines per-row from here.  All-ones init gives
    # every QP identical rate and the per-row gradients are too sparse
    # to separate them in any reasonable schedule.
    ladder = jnp.exp(jnp.linspace(jnp.log(4.0), jnp.log(0.4),
                                  n_qp))[:, None]
    p["q_encoder"] = jnp.ones((n_qp, G_CH_D)) * ladder
    p["q_decoder"] = jnp.ones((n_qp, G_CH_D)) / ladder
    p["q_feature"] = jnp.ones((n_qp, G_CH_D))
    p["q_recon"] = jnp.ones((n_qp, G_CH_RECON))
    p["bit_estimator_z"] = bit_estimator_init(next(ks), n_qp, G_CH_Z)
    return p


# ---------------------------------------------------------------------------
# sub-network applies
# ---------------------------------------------------------------------------

def _dcb_seq(params_list, x):
    for bp in params_list:
        x = L.depth_conv_block_apply(bp, x)
    return x


def _q_vec(bank, qp, dtype):
    return bank[qp][None, None, None, :].astype(dtype)


def hyper_encoder(p, y_pad):
    h = L.depth_conv_block_apply(p["hyper_enc"][0], y_pad)
    h = L.res_block_stride2_apply(p["hyper_enc"][1], h)
    return L.res_block_stride2_apply(p["hyper_enc"][2], h)


def hyper_decoder(p, z_hat):
    h = L.res_block_upsample_apply(p["hyper_dec"][0], z_hat)
    h = L.res_block_upsample_apply(p["hyper_dec"][1], h)
    return L.depth_conv_block_apply(p["hyper_dec"][2], h)


def spatial_prior(p, x):
    h = L.depth_conv_block_apply(p["y_spatial_prior"][0], x)
    h = L.depth_conv_block_apply(p["y_spatial_prior"][1], h)
    return L.conv_apply(p["y_spatial_prior"][2], h)


# ---------------------------------------------------------------------------
# jit stage functions (shared = used by both encoder and decoder)
# ---------------------------------------------------------------------------

def _stage_adaptor_i(p, frame):
    """Shared: pixel reference -> feature (video_model.py:274-277)."""
    return L.depth_conv_block_apply(p["feature_adaptor_i"],
                                    F.space_to_depth(frame, 8))


def _stage_adaptor_p(p, feature):
    """Shared: propagated feature -> adapted feature."""
    return L.conv_apply(p["feature_adaptor_p"], feature)


def _stage_fe_part1(p, feature, qp):
    """Shared: first 2 blocks + temporal context (video_model.py:44-47)."""
    x1 = _dcb_seq(p["fe_conv1"], feature)
    ctx_t = x1 * _q_vec(p["q_feature"], qp, x1.dtype)
    return x1, ctx_t


def _stage_fe_part2(p, x1):
    """Shared: remaining 4 blocks -> ctx."""
    return _dcb_seq(p["fe_conv2"], x1)


def _stage_encode_y(p, x, ctx, qp):
    """Encoder-only: frame -> latent y + rounded z (video_model.py:54-97)."""
    feat = F.space_to_depth(x, 8)
    feat = L.conv_apply(p["enc_conv1"], feat)
    feat = L.depth_conv_block_apply(p["enc_conv2"][0],
                                    jnp.concatenate((feat, ctx), axis=-1))
    feat = L.depth_conv_block_apply(p["enc_conv2"][1], feat)
    feat = L.depth_conv_block_apply(
        p["enc_conv3"], feat,
        quant_step=_q_vec(p["q_encoder"], qp, feat.dtype))
    y = L.conv_apply(p["enc_down"], feat, stride=2, padding=1)
    z = hyper_encoder(p, C.pad_for_y(y))
    z_hat, z_int8 = F.round_and_to_int8(z)
    return y, z_hat.astype(x.dtype), z_int8


def _stage_prior(p, z_hat, ctx_t):
    """Shared: hyper + temporal priors -> fused params
    (video_model.py:279-286)."""
    hier = hyper_decoder(p, z_hat)
    temporal = L.res_block_stride2_apply(p["temporal_prior"], ctx_t)
    th, tw = temporal.shape[1], temporal.shape[2]
    hier = hier[:, :th, :tw, :]
    fused = _dcb_seq(p["y_prior_fusion"][:3],
                     jnp.concatenate((hier, temporal), axis=-1))
    return L.conv_apply(p["y_prior_fusion"][3], fused)


def _stage_spatial(p, y_hat_0, common_params):
    """Shared: second-pass spatial prior (video_model.py:206-216)."""
    cat = jnp.concatenate((y_hat_0, common_params), axis=-1)
    out = spatial_prior(p, cat)
    c = out.shape[-1] // 2
    return out[..., :c], out[..., c:]


_GE_IDX_CFG = (GaussianEncoder.SCALE_MIN, GaussianEncoder.SCALE_MAX,
               float(np.log(GaussianEncoder.SCALE_MIN)),
               (GaussianEncoder.SCALE_LEVELS - 1)
               / (np.log(GaussianEncoder.SCALE_MAX)
                  - np.log(GaussianEncoder.SCALE_MIN)))


def _indexes_of(scales_r, force_zero_thres):
    smin, smax, lsm, recip = _GE_IDX_CFG
    return F.build_index_dec(scales_r, smin, smax, lsm, recip,
                             force_zero_thres)


def _stage_fold_index_2x(scales, k, force_zero_thres):
    """Shared: fold active-half scales, build CDF indexes."""
    _, h, w, c = scales.shape
    masks = F.checkerboard_masks_2x(h, w, c, scales.dtype)
    scales_r = F.fold_halves(scales * masks[k])
    return _indexes_of(scales_r, force_zero_thres)


def _stage_enc_pass0(y, params_prior, force_zero_thres):
    """Encoder-only pass 0, fully fused: prior separation, masked
    quantization, symbol packing (int16 = sym<<8 | idx)."""
    y, q_dec, scales, means = C.separate_prior_video_encoding(
        params_prior, y)
    _, h, w, c = y.shape
    masks = F.checkerboard_masks_2x(h, w, c, y.dtype)
    _, y_q, y_hat_0, _ = F.process_with_mask(y, scales, means, masks[0],
                                             force_zero_thres)
    scales_r = F.fold_halves(scales * masks[0])
    idx, skip = _indexes_of(scales_r, force_zero_thres)
    packed = (F.fold_halves(y_q).astype(jnp.int16) << 8) \
        + idx.astype(jnp.int16)
    return y, packed, skip, y_hat_0


def _stage_enc_pass1(y, scales, means, force_zero_thres):
    """Encoder-only pass 1 (y already divided by q_dec in pass 0)."""
    _, h, w, c = y.shape
    masks = F.checkerboard_masks_2x(h, w, c, y.dtype)
    _, y_q, y_hat_1, _ = F.process_with_mask(y, scales, means, masks[1],
                                             force_zero_thres)
    scales_r = F.fold_halves(scales * masks[1])
    idx, skip = _indexes_of(scales_r, force_zero_thres)
    packed = (F.fold_halves(y_q).astype(jnp.int16) << 8) \
        + idx.astype(jnp.int16)
    return packed, skip, y_hat_1


def _stage_dec_index0(params_prior, force_zero_thres):
    """Decoder-only: prior separation + pass-0 indexes (elementwise-only,
    so bit-identical to the encoder's fused pass-0 index computation)."""
    q_dec, scales, means = C.separate_prior_video_decoding(params_prior)
    _, h, w, c = scales.shape
    masks = F.checkerboard_masks_2x(h, w, c, scales.dtype)
    scales_r = F.fold_halves(scales * masks[0])
    idx, skip = _indexes_of(scales_r, force_zero_thres)
    return idx, skip


def _stage_dec_restore_2x(y_q_r, params_or_means, k, from_params):
    """Decoder-only: scatter decoded symbols back through mask k.
    from_params=True slices the means third out of the fused prior."""
    if from_params:
        c3 = params_or_means.shape[-1] // 3
        means = params_or_means[..., 2 * c3:]
    else:
        means = params_or_means
    _, h, w, c = means.shape
    masks = F.checkerboard_masks_2x(h, w, c, means.dtype)
    return F.restore_y_2x(y_q_r, means, masks[k])


def _stage_feature_out(p, y_hat_0, y_hat_1, params_prior, ctx, qp):
    """Shared: dequantized latent -> next reference feature.  Both sides
    evaluate this single compiled fn so the temporal chain can't drift."""
    c3 = params_prior.shape[-1] // 3
    q_dec = jnp.maximum(params_prior[..., :c3], 0.5)
    y_hat = (y_hat_0 + y_hat_1) * q_dec
    return _stage_feature(p, y_hat, ctx, qp)


def _stage_pack_all(z_int8, packed0, packed1):
    """Concatenate all symbol planes into ONE flat int16 buffer so a
    frame needs a single device->host transfer (transfer round trips are
    the top cost on tunneled/remote devices)."""
    return jnp.concatenate([z_int8.reshape(-1).astype(jnp.int16),
                            packed0.reshape(-1), packed1.reshape(-1)])


def _use_pallas_ec():
    """Pallas rANS kernels (ops/pallas_rans.py): opt-in via
    OPENDCVC_TPU_PALLAS_EC=1.  Both paths emit identical bytes.

    Measured head-to-head at 1080p (v5e, 4096 lanes, 272 steps): the
    kernel alone beats the XLA lax.scan 5.3 ms vs 11 ms, but embedded
    in the per-frame megastage the custom-call boundary (operand
    materialization + lost fusion) costs more than it saves — 26.8 ms
    vs 17.3 ms full-megastage device time — so the XLA scan stays the
    default until the megastage itself moves into the kernel."""
    from ..utils.common import env_flag
    return env_flag("OPENDCVC_TPU_PALLAS_EC")


def _cm_flat(plane):
    """Flatten a (..., C) plane CHANNEL-MAJOR (c outermost).

    The strided lane assignment maps flat index i -> lane i % lanes;
    with the natural NHWC flatten and lanes a multiple of C, lane
    l would see ONLY channel l % C — one hot channel then overloads
    its lanes ~8x the mean (measured ln.max 107 vs mean 13 at 1080p)
    and triggers the staging regrow every frame.  Channel-major
    flattening makes each lane's symbols cycle through all channels
    AND stride across space (p = l + (lanes - P % lanes) * c mod
    lanes), so per-lane load hugs the mean.  This matches the
    reference z coder's order too (cdf index = i / per_channel_size,
    reference src/cpp/py_rans/rans.cpp:184-200 on NCHW tensors)."""
    c = plane.shape[-1]
    return plane.reshape(-1, c).T.reshape(-1)


def _cm_unflat(flat, shape):
    """Inverse of _cm_flat: channel-major flat -> (..., C) plane."""
    c = shape[-1]
    return flat.reshape(c, -1).T.reshape(shape)


def _lane_layout(sym, rows, lanes, reverse):
    """Strided lane assignment: symbol i -> lane i % lanes.  Activity in
    a frame is spatially clustered; striding spreads it evenly across
    lanes so the max lane length (which sizes the staging buffer and the
    D2H volume) hugs the mean instead of the hottest region.  Feed it
    CHANNEL-MAJOR flats (_cm_flat) so lanes decorrelate from channels
    too."""
    n = sym.shape[0]
    k = -(-n // lanes)
    pad = lanes * k - n
    sym = jnp.concatenate([sym, jnp.zeros((pad,), sym.dtype)])
    rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
    sym = sym.reshape(k, lanes).T
    rows = rows.reshape(k, lanes).T
    if reverse:  # rANS encodes last-symbol-first within each lane
        sym = sym[:, ::-1]
        rows = rows[:, ::-1]
    return sym, rows


def _lane_unlayout(sym_lanes, n):
    """Inverse of the strided _lane_layout (decode order)."""
    return sym_lanes.T.reshape(-1)[:n]


def _lane_layout_t(sym, rows, lanes, reverse):
    """Strided lane layout in the Pallas kernels' native (K, L)
    step-major orientation (no transpose materialized)."""
    n = sym.shape[0]
    k = -(-n // lanes)
    pad = lanes * k - n
    sym = jnp.concatenate([sym, jnp.zeros((pad,), sym.dtype)])
    rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
    sym = sym.reshape(k, lanes)
    rows = rows.reshape(k, lanes)
    if reverse:  # rANS encodes last-symbol-first within each lane
        sym = sym[::-1]
        rows = rows[::-1]
    return sym, rows


def _lane_unlayout_t(sym_kl, n):
    """Inverse of _lane_layout_t (decode order, step-major input)."""
    return sym_kl.reshape(-1)[:n]


def _z_rows(nz, c, qp, n_y_rows):
    """Per-symbol CDF row ids for a CHANNEL-MAJOR flat z plane (row =
    channel = i // per_channel, the reference coder's own z order,
    rans.cpp:184-200)."""
    return n_y_rows + qp * c + (jnp.arange(nz) // (nz // c))


def _stage_feature(p, y_hat, ctx, qp):
    """Shared: latent decoder -> next reference feature
    (video_model.py:100-129).  MUST be identical enc/dec: the temporal
    chain propagates this output."""
    feat = L.subpel_conv2x_apply(p["dec_up"], y_hat, padding=1)
    feat = jnp.concatenate((feat, ctx), axis=-1)
    feat = L.depth_conv_block_apply(p["dec_conv1"][0], feat)
    feat = L.depth_conv_block_apply(p["dec_conv1"][1], feat)
    feat = L.depth_conv_block_apply(p["dec_conv1"][2], feat)
    feat = L.conv_apply(p["dec_conv2"], feat)
    return feat * _q_vec(p["q_decoder"], qp, feat.dtype)


def _stage_recon_x(p, feature, qp):
    """Shared (decode + encoder-side periodic refresh): feature -> frame
    (video_model.py:132-163)."""
    out = L.depth_conv_block_apply(p["recon_conv"][0], feature)
    out = L.depth_conv_block_apply(p["recon_conv"][1], out)
    out = L.depth_conv_block_apply(p["recon_conv"][2], out)
    out = L.depth_conv_block_apply(
        p["recon_conv"][3], out,
        quant_step=_q_vec(p["q_recon"], qp, out.dtype))
    out = L.conv_apply(p["recon_head"], out)
    return F.pixel_shuffle_clamp(out, 8)


# ---------------------------------------------------------------------------
# fused per-frame stages (device-EC fast path)
#
# On tunneled/remote devices every execution carries a fixed dispatch
# overhead (~2 ms measured through the axon tunnel), so the production
# path runs ONE compiled program per frame: all NN stages, the lane
# layout, and the three rANS scans fused into a single executable.  The
# split stage functions above remain the host-EC / test / parity path.
# ---------------------------------------------------------------------------


def _compress_frame_core(p, x, feature, qp, cum_hl, lanes, mw,
                         n_y_rows, cap, use_pallas=False, fz=None,
                         kyc=0):
    """Encoder megastage body on an already-adapted feature: frame ->
    next ref feature + ONE encoded lane segment (z, y0, y1 coded
    back-to-back per lane with rANS state continuation, so the container
    carries a single set of lane states/lengths).  Mirrors the per-stage
    pipeline of compress_async (reference video_model.py:299-341) in one
    program.

    Encode order per lane is reversed(y1), reversed(y0), reversed(z) —
    the decoder consumes z, then y0, then y1."""
    from ..entropy.device_rans import (SKIP_ROW, _encode_scan_carry,
                                       _slice_rows, compact_skip_enc,
                                       densify_segment,
                                       encode_carry_init)
    x1, ctx_t = _stage_fe_part1(p, feature, qp)
    ctx = _stage_fe_part2(p, x1)
    y, z_hat, z_int8 = _stage_encode_y(p, x, ctx, qp)
    params_prior = _stage_prior(p, z_hat, ctx_t)
    y_div, packed0, keep0, y_hat_0 = _stage_enc_pass0(y, params_prior,
                                                      fz)
    scales1, means1 = _stage_spatial(p, y_hat_0, params_prior)
    packed1, keep1, y_hat_1 = _stage_enc_pass1(y_div, scales1, means1,
                                               fz)
    feature_out = _stage_feature_out(p, y_hat_0, y_hat_1, params_prior,
                                     ctx, qp)

    cum_y = lax.slice(cum_hl, (0, 0), (n_y_rows, cum_hl.shape[1]))
    planes = []  # (flat_sym, flat_rows) in encode order, channel-major
    m_max = jnp.zeros((), jnp.int32)
    for pk, keep in ((packed1, keep1), (packed0, keep0)):
        flat = _cm_flat(pk).astype(jnp.int32)
        sym, row = flat >> 8, flat & 255
        if fz is not None and kyc > 0:
            # skip-lane COMPACTION: surviving symbols pack into a
            # lanes*kyc prefix so the y scans run kyc steps instead of
            # K — device time scales with CODED symbols, matching where
            # the reference's skip-mode speed comes from
            # (entropy_models.py:330-341).  The in-graph survivor count
            # rides the staging tail; the host re-runs at a larger rung
            # on overflow.
            sym, row, m = compact_skip_enc(sym, row, _cm_flat(keep),
                                           lanes * kyc)
            m_max = jnp.maximum(m_max, m)
        elif fz is not None:
            # uncompacted skip: sub-threshold positions keep their lane
            # slot but ride the zero-rate SKIP_ROW (the quantizer
            # already forced their symbol to 0 in process_with_mask)
            kf = _cm_flat(keep)
            row = jnp.where(kf, row, SKIP_ROW)
            sym = jnp.where(kf, sym, 0)
        planes.append((sym, row))

    c_z = z_int8.shape[-1]
    z_sym = _cm_flat(z_int8).astype(jnp.int32)
    z_rows = _z_rows(z_sym.shape[0], c_z, qp, n_y_rows)
    cum_sub, z_rows_local = _slice_rows(cum_hl, z_rows, c_z,
                                        n_y_rows + qp * c_z)

    if use_pallas:
        # one fused VMEM-resident scan over all three planes (local z
        # rows offset into a per-frame combined table), built directly
        # in the kernel's native step-major layout.  The operand is ONE
        # packed (K, L) int32 — (sym+128)<<8 | row — so the custom-call
        # boundary materializes half the bytes; skip/compaction rows
        # (SKIP_ROW) pass through at zero rate inside the kernel.
        from ..ops.pallas_rans import (encode_scan_pallas_packed,
                                       ENC_ROW_BITS, ENC_SKIP)
        cum_comb = jnp.concatenate([cum_y, cum_sub], axis=0)
        # remap the y planes' 8-bit SKIP_ROW sentinel to the packed
        # form's 9-bit ENC_SKIP (the combined table reaches 256 rows,
        # where an 8-bit sentinel would collide with z channel 127)
        pieces = [_lane_layout_t(s, jnp.where(r == SKIP_ROW, ENC_SKIP, r),
                                 lanes, True) for s, r in planes]
        # offset z rows AFTER layout so the pad slots land on the z
        # subtable's row 0 (global n_y_rows) exactly like the XLA
        # chain's per-plane padding, not on y row 0
        zs, zr = _lane_layout_t(z_sym, z_rows_local, lanes, True)
        pieces.append((zs, zr + n_y_rows))
        packed_all = jnp.concatenate(
            [((s + 128) << ENC_ROW_BITS) | r for s, r in pieces], axis=0)
        buf, cursors, state = encode_scan_pallas_packed(packed_all,
                                                        cum_comb, mw)
        buf = buf.astype(jnp.int32)
    else:
        carry = encode_carry_init(lanes, mw)
        for s, r in planes:
            sym_l, row_l = _lane_layout(s, r, lanes, True)
            carry = _encode_scan_carry(sym_l, row_l, cum_y, carry)
        sym_l, row_l = _lane_layout(z_sym, z_rows_local, lanes, True)
        state, cursors, buf = _encode_scan_carry(sym_l, row_l,
                                                 cum_sub, carry)
    # compact + single-transfer: the tunnel link pays latency per array
    # and ~18 MB/s bandwidth, so the frame result is ONE u16 vector of
    # ~true-bpp size (dense decode-order words + lens + states + the
    # skip-compaction survivor count for overflow detection)
    staging = densify_segment(buf, cursors, state, cap)
    m_words = jnp.stack([(m_max >> 16).astype(jnp.uint16),
                         (m_max & 0xFFFF).astype(jnp.uint16)])
    return feature_out, jnp.concatenate([staging, m_words])


def _compress_frame(p, x, ref, qp, cum_hl, from_feature, lanes, mw,
                    n_y_rows, cap, use_pallas=False, fz=None, kyc=0):
    """Single-frame encoder megastage (adaptor + core)."""
    if from_feature:
        feature = _stage_adaptor_p(p, ref)
    else:
        feature = _stage_adaptor_i(p, ref)
    return _compress_frame_core(p, x, feature, qp, cum_hl, lanes, mw,
                                n_y_rows, cap, use_pallas, fz, kyc)


def _compress_gop(p, xs, feature_in, qps, cum_hl, lanes, mw, n_y_rows,
                  cap, use_pallas=False, fz=None, kyc=0):
    """GOP-batched encoder megastage: N consecutive P-frames in ONE
    compiled program (lax.scan over the frame axis; the propagated
    feature is the scan carry, an in-graph dependency).  The link's
    per-transfer latency then amortizes over the whole chunk: one
    execution + one dense D2H per N frames instead of per frame.  The
    reference hides coding behind compute with CUDA streams
    (video_model.py:314-337); on a remote-attached TPU the transfer
    round-trip is the cost to hide, and batching is what hides it.

    xs: (N, 1, H, W, C) frames; qps: (N,) int32 (hierarchical-QP shifts
    vary inside a GOP).  The first frame consumes feature_in via the
    same per-frame adaptor the single-frame path applies.

    Returns (feature_last, segs (N, cap+3L) u16, feats_in (N, ...)) —
    feats_in[i] is frame i's carry-in feature so a (rare) staging
    overflow can re-run JUST that frame at a larger rung: the feature
    chain itself never depends on the rANS staging."""
    def body(feat, xq):
        x, qp = xq
        f = _stage_adaptor_p(p, feat)
        f_out, seg = _compress_frame_core(p, x, f, qp, cum_hl, lanes,
                                          mw, n_y_rows, cap, use_pallas,
                                          fz, kyc)
        return f_out, (seg, feat)

    feat_last, (segs, feats_in) = lax.scan(body, feature_in, (xs, qps))
    return feat_last, segs, feats_in


def _decompress_frame_core(p, staging, feature, qp, cum_hl, zh, zw,
                           lanes, n_y_rows, cap, mw, use_pallas=False,
                           fz=None, kyc=0):
    """Decoder megastage body on an already-adapted feature: compact
    staged lane stream -> next ref feature + reconstructed frame, fully
    on-device (one H2D upload of ~true-bpp bytes, one execution).  The
    single segment carries z, y0, y1 back-to-back per lane; the three
    decode sub-scans share one rANS state/pointer carry.  Every shared
    stage is the same code the encoder megastage ran, so the temporal
    chain stays bit-identical."""
    from ..entropy.device_rans import (SKIP_ROW, _decode_scan_carry,
                                       _slice_rows, _undensify_device,
                                       compact_skip_dec,
                                       expand_compact_syms)
    x1, ctx_t = _stage_fe_part1(p, feature, qp)

    data, states = _undensify_device(staging, cap, lanes, mw)
    carry = (states.astype(jnp.uint32),
             jnp.zeros((lanes,), jnp.int32))

    def dec_seg(rows_flat, cum, carry):
        """Decode one plane from FLAT row ids; returns flat symbols."""
        n = rows_flat.shape[0]
        if use_pallas:
            from ..ops.pallas_rans import decode_scan_pallas
            rows_t, _ = _lane_layout_t(rows_flat, rows_flat, lanes,
                                       False)
            syms_t, st, ptr = decode_scan_pallas(
                data, rows_t, rows_t.shape[0], cum, carry[0], carry[1])
            return _lane_unlayout_t(syms_t, n), (st, ptr)
        rows_l, _ = _lane_layout(rows_flat, rows_flat, lanes, False)
        syms, carry = _decode_scan_carry(data, rows_l, cum, carry)
        return _lane_unlayout(syms, n), carry

    def dec_y_plane(idx, keep, carry):
        """Decode one y plane: compacted (kyc steps) or full, mirroring
        the encoder's layout exactly from the shared keep mask."""
        rows = _cm_flat(idx).astype(jnp.int32)
        n = rows.shape[0]
        if fz is not None and kyc > 0:
            rows_c, orig = compact_skip_dec(rows, _cm_flat(keep),
                                            lanes * kyc)
            syms_c, carry = dec_seg(rows_c, cum_y, carry)
            return expand_compact_syms(syms_c, orig, n), carry
        if fz is not None:
            rows = jnp.where(_cm_flat(keep), rows, SKIP_ROW)
        return dec_seg(rows, cum_y, carry)

    c_z = G_CH_Z
    n_z = zh * zw * c_z
    z_rows = _z_rows(n_z, c_z, qp, n_y_rows)
    cum_sub, z_rows_local = _slice_rows(cum_hl, z_rows, c_z,
                                        n_y_rows + qp * c_z)
    z_syms, carry = dec_seg(z_rows_local, cum_sub, carry)
    z_hat = _cm_unflat(z_syms, (1, zh, zw, c_z)).astype(x1.dtype)
    params_prior = _stage_prior(p, z_hat, ctx_t)

    cum_y = lax.slice(cum_hl, (0, 0), (n_y_rows, cum_hl.shape[1]))
    idx0, keep0 = _stage_dec_index0(params_prior, fz)
    ctx = _stage_fe_part2(p, x1)
    _, ih, iw, ic = idx0.shape
    y0_syms, carry = dec_y_plane(idx0, keep0, carry)
    y_q_r0 = _cm_unflat(y0_syms, (1, ih, iw, ic)).astype(x1.dtype)
    y_hat_0 = _stage_dec_restore_2x(y_q_r0, params_prior, 0, True)

    scales1, means1 = _stage_spatial(p, y_hat_0, params_prior)
    idx1, keep1 = _stage_fold_index_2x(scales1, 1, fz)
    y1_syms, carry = dec_y_plane(idx1, keep1, carry)
    y_q_r1 = _cm_unflat(y1_syms, (1, ih, iw, ic)).astype(x1.dtype)
    y_hat_1 = _stage_dec_restore_2x(y_q_r1, means1, 1, False)

    feature_out = _stage_feature_out(p, y_hat_0, y_hat_1, params_prior,
                                     ctx, qp)
    x_hat = _stage_recon_x(p, feature_out, qp)
    return feature_out, x_hat


def _decompress_frame(p, staging, ref, qp, cum_hl, from_feature, zh,
                      zw, lanes, n_y_rows, cap, mw, use_pallas=False,
                      fz=None, kyc=0):
    """Single-frame decoder megastage (adaptor + core)."""
    if from_feature:
        feature = _stage_adaptor_p(p, ref)
    else:
        feature = _stage_adaptor_i(p, ref)
    return _decompress_frame_core(p, staging, feature, qp, cum_hl, zh,
                                  zw, lanes, n_y_rows, cap, mw,
                                  use_pallas, fz, kyc)


def _decompress_gop(p, stagings, feature_in, qps, cum_hl, zh, zw,
                    lanes, n_y_rows, cap, mw, use_pallas=False,
                    fz=None, kyc=0):
    """GOP-batched decoder megastage: N frames' compact stagings in ONE
    upload + ONE execution (scan mirror of _compress_gop — the decoder
    runs the exact same shared stage code, so the temporal chain stays
    bit-identical across the whole chunk).

    Returns (feature_last, x_hats (N, 1, H, W, C))."""
    def body(feat, sq):
        staging, qp = sq
        f = _stage_adaptor_p(p, feat)
        f_out, x_hat = _decompress_frame_core(
            p, staging, f, qp, cum_hl, zh, zw, lanes, n_y_rows, cap,
            mw, use_pallas, fz, kyc)
        return f_out, x_hat

    feat_last, x_hats = lax.scan(body, feature_in, (stagings, qps))
    return feat_last, x_hats


# ---------------------------------------------------------------------------
# DPB
# ---------------------------------------------------------------------------

class RefFrame:
    def __init__(self):
        self.frame = None
        self.feature = None
        self.poc = None


# ---------------------------------------------------------------------------
# host orchestrator
# ---------------------------------------------------------------------------

class DMC:
    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.qp_shift = QP_SHIFT
        self.params = None
        self.entropy_coder = None
        self.bit_estimator_z = BitEstimator(C.QP_NUM + EXTRA_QP, G_CH_Z)
        self.gaussian_encoder = GaussianEncoder()
        self.force_zero_thres = None

        self.dpb = []
        self.max_dpb_size = 1
        self.curr_poc = 0

        self._j_adaptor_i = jax.jit(_stage_adaptor_i)
        self._j_adaptor_p = jax.jit(_stage_adaptor_p)
        self._j_fe_part1 = jax.jit(_stage_fe_part1)
        self._j_fe_part2 = jax.jit(_stage_fe_part2)
        self._j_encode_y = jax.jit(_stage_encode_y)
        self._j_prior = jax.jit(_stage_prior)
        self._j_spatial = jax.jit(_stage_spatial)
        self._j_fold_index = jax.jit(_stage_fold_index_2x,
                                     static_argnums=(1, 2))
        self._j_enc_pass0 = jax.jit(_stage_enc_pass0, static_argnums=(2,))
        self._j_enc_pass1 = jax.jit(_stage_enc_pass1, static_argnums=(3,))
        self._j_dec_index0 = jax.jit(_stage_dec_index0,
                                     static_argnums=(1,))
        self._j_dec_restore = jax.jit(_stage_dec_restore_2x,
                                      static_argnums=(2, 3))
        self._j_feature = jax.jit(_stage_feature)
        self._j_feature_out = jax.jit(_stage_feature_out)
        self._j_recon_x = jax.jit(_stage_recon_x)
        self._j_pack_all = jax.jit(_stage_pack_all)
        # device-side entropy coding (tpu-lane v2 format): opt-in
        from ..utils.common import env_flag
        self.device_ec = env_flag("OPENDCVC_TPU_DEVICE_EC")
        self.device_encoder = None
        self.device_decoder = None
        self.z_lanes = int(os.environ.get("OPENDCVC_TPU_EC_Z_LANES", 512))
        self._j_compress_frame = jax.jit(
            _compress_frame, static_argnums=(5, 6, 7, 8, 9, 10, 11,
                                             12))
        self._j_decompress_frame = jax.jit(
            _decompress_frame, static_argnums=(5, 6, 7, 8, 9, 10, 11,
                                               12, 13, 14))
        self._j_compress_gop = jax.jit(
            _compress_gop, static_argnums=(5, 6, 7, 8, 9, 10, 11))
        self._j_decompress_gop = jax.jit(
            _decompress_gop, static_argnums=(5, 6, 7, 8, 9, 10, 11,
                                             12, 13))
        # adaptive D2H fetch-window width per staging capacity
        # (transfer slimming; see entropy.device_rans fetch_window)
        self._fetch_windows = {}
        # learned LAUNCH staging rate (bytes/symbol) per (H, W) (see
        # DMCI._ec_learned: without memory, content hotter than the
        # first-rung guess pays the regrow ladder on every chunk; with
        # it only the first one does).  Launch sizing only — serialized
        # rungs stay a pure function of each frame's payload.
        self._ec_learned = {}
        self._ec_rerun_count = 0

    # -- setup ---------------------------------------------------------------

    @staticmethod
    def get_qp_num():
        return C.QP_NUM

    def init_params(self, seed=0):
        # ONE compiled program for the whole init: eagerly, the ~300
        # small random ops each pay the full dispatch latency on
        # remote-attached devices (minutes); jitted, it's one execution
        def build(key):
            p = dmc_init(key)
            if self.dtype != jnp.float32:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(self.dtype)
                    if a.dtype == jnp.float32 else a, p)
            return p
        self.params = C.run_init(
            build, jax.random.PRNGKey(seed),
            memo_key=("dmc", seed, np.dtype(self.dtype).name))
        return self.params

    def load_params(self, params):
        self.params = params

    def update(self, force_zero_thres=None):
        self.entropy_coder = EntropyCoder()
        self.force_zero_thres = force_zero_thres
        self.gaussian_encoder.update(self.entropy_coder, force_zero_thres)
        self.bit_estimator_z.update(self.params["bit_estimator_z"],
                                    self.entropy_coder)
        if self.device_ec:
            C.assert_determinism_flags()
            from ..entropy.device_rans import (DeviceRansEncoder,
                                               DeviceRansDecoder,
                                               full_range_cdf_rows)
            self.device_encoder = DeviceRansEncoder(
                lanes=int(os.environ.get("OPENDCVC_TPU_EC_LANES", 4096)),
                bytes_per_symbol=float(
                    os.environ.get("OPENDCVC_TPU_EC_BPS", 0.5)))
            y_rows = full_range_cdf_rows(*self.gaussian_encoder.cdf_info)
            z_rows = full_range_cdf_rows(*self.bit_estimator_z.cdf_info)
            self.device_encoder.set_tables(y_rows, z_rows)
            self.device_decoder = DeviceRansDecoder()
            self.device_decoder.set_tables(y_rows, z_rows)

    def set_use_two_entropy_coders(self, b):
        self.entropy_coder.set_use_two_entropy_coders(b)

    # -- DPB management (video_model.py:253-297) ------------------------------

    def reset_ref_feature(self):
        if self.dpb:
            self.dpb[0].feature = None

    def add_ref_frame(self, feature=None, frame=None, increase_poc=True):
        ref = RefFrame()
        ref.poc = self.curr_poc
        ref.frame = frame
        ref.feature = feature
        if len(self.dpb) >= self.max_dpb_size:
            self.dpb.pop(-1)
        self.dpb.insert(0, ref)
        if increase_poc:
            self.curr_poc += 1

    def clear_dpb(self):
        self.dpb.clear()

    def set_curr_poc(self, poc):
        self.curr_poc = poc

    def apply_feature_adaptor(self):
        if self.dpb[0].feature is None:
            return self._j_adaptor_i(
                self.params, jnp.asarray(self.dpb[0].frame, self.dtype))
        return self._j_adaptor_p(self.params, self.dpb[0].feature)

    def prepare_feature_adaptor_i(self, last_qp):
        """Periodic refresh: regenerate a pixel reference from the feature
        so decoder and encoder re-anchor (video_model.py:293-297)."""
        if self.dpb[0].frame is None:
            self.dpb[0].frame = self._j_recon_x(
                self.params, self.dpb[0].feature, np.int32(last_qp))
            self.reset_ref_feature()

    def shift_qp(self, qp, fa_idx):
        return qp + self.qp_shift[fa_idx]

    # -- compress ------------------------------------------------------------

    def compress_async(self, x, qp):
        """Device-side encode: dispatches all stages, starts the (single)
        symbol transfer asynchronously, updates the DPB, and returns a
        zero-argument callable that completes the host-side entropy coding
        and returns the bit stream.  Callers can pipeline: submit frame
        t+1's compute before finishing frame t's stream (the reference
        hides coding behind compute with CUDA streams,
        video_model.py:325-337 — here the transfer RTT hides behind the
        next frame's dispatch instead)."""
        p = self.params
        fz = self.force_zero_thres
        qp_dev = np.int32(qp)
        x = jnp.asarray(x, dtype=self.dtype)

        if self.device_ec:
            return self._compress_async_device(x, qp, qp_dev)

        feature = self.apply_feature_adaptor()
        x1, ctx_t = self._j_fe_part1(p, feature, qp_dev)
        ctx = self._j_fe_part2(p, x1)
        y, z_hat, z_int8 = self._j_encode_y(p, x, ctx, qp_dev)
        params_prior = self._j_prior(p, z_hat, ctx_t)

        y_div, packed0, skip0, y_hat_0 = self._j_enc_pass0(y, params_prior,
                                                           fz)
        scales1, means1 = self._j_spatial(p, y_hat_0, params_prior)
        packed1, skip1, y_hat_1 = self._j_enc_pass1(y_div, scales1, means1,
                                                    fz)
        feature_out = self._j_feature_out(p, y_hat_0, y_hat_1,
                                          params_prior, ctx, qp_dev)

        n_z = int(np.prod(z_int8.shape))
        n_y = int(np.prod(packed0.shape))
        if fz is None:
            flat = self._j_pack_all(z_int8, packed0, packed1)
            try:
                flat.copy_to_host_async()
            except Exception:
                pass
            fetch = (flat,)
        else:
            fetch = (z_int8, packed0, packed1, skip0, skip1)

        self.add_ref_frame(feature_out, None)

        def finish():
            host = jax.device_get(list(fetch))
            if fz is None:
                buf = host[0]
                z_np = buf[:n_z].astype(np.int8)
                p0_np, p1_np = buf[n_z:n_z + n_y], buf[n_z + n_y:]
                s0_np = s1_np = None
            else:
                z_np = host[0].reshape(-1)
                p0_np, p1_np = host[1].reshape(-1), host[2].reshape(-1)
                s0_np, s1_np = host[3].reshape(-1), host[4].reshape(-1)
            self.entropy_coder.reset()
            self.bit_estimator_z.encode_z(z_np.reshape(-1), qp)
            self.gaussian_encoder.encode_y_packed(p0_np, s0_np)
            self.gaussian_encoder.encode_y_packed(p1_np, s1_np)
            self.entropy_coder.flush()
            return self.entropy_coder.get_encoded_stream()

        return finish

    def _mw_for(self, n_sym, lanes, bps):
        k = -(-n_sym // lanes)
        return k, max(8, int(k * bps / 2)) + 4

    @staticmethod
    def _cap_for(lanes, mw, top_rung=False):
        # dense-payload budget: sum(lens) <= lanes * max_len, and the
        # strided lane layout keeps max_len near the MEAN lane length,
        # so a fixed fraction of the staging rectangle bounds the dense
        # payload; the regrow ladder doubles it alongside mw on
        # overflow.  The fraction trades D2H bytes against regrow
        # frequency (every D2H byte costs link time on tunneled chips).
        # At the TOP rung the cap is the full rectangle — each symbol
        # emits at most one u16 word, so lanes*mw always fits and the
        # ladder terminates (no same-config relaunch loop).
        if top_rung:
            return lanes * mw
        frac = float(os.environ.get("OPENDCVC_TPU_EC_CAP_FRAC", 0.5))
        return max(4096, int(lanes * mw * frac) // 8 * 8)

    @staticmethod
    def _kyc_for(k_y, fz):
        """First-rung skip-compaction steps per lane (0 = off).

        Opt-in via OPENDCVC_TPU_EC_SKIP_COMPACT=1: measured at 1080p on
        a v5e (4096 lanes, fz=0.12, ~50% survivors) the compaction
        machinery costs MORE than the scan steps it saves — enc 24.5 vs
        18.4 ms/frame, GOP dec 31.2 vs 16.8 ms/frame.  The per-plane
        cumsum + scatters run over the full 524k-symbol plane on both
        sides while the saved 64 scan steps are only ~3 ms, and the
        rung-regrow ladder makes container metas content-dependent
        (a mid-sequence rung change forces a fresh megastage compile on
        the decoder).  The zero-rate SKIP_ROW passthrough (kyc=0) is
        measured free (18.4/16.8 with fz vs 18.6/17.1 without), so skip
        mode itself stays on; compaction remains available for
        link-limited deployments where the ~45% smaller staging
        transfer outweighs device time.

        Quantized to multiples of 8 so mixed-content sequences reuse a
        handful of compiled configs; OPENDCVC_TPU_EC_SKIP_FRAC sets the
        assumed survivor fraction (the ladder regrows from the in-graph
        survivor count when a frame beats the assumption)."""
        from ..utils.common import env_flag
        if fz is None or not env_flag("OPENDCVC_TPU_EC_SKIP_COMPACT"):
            return 0
        frac = float(os.environ.get("OPENDCVC_TPU_EC_SKIP_FRAC", 0.5))
        kyc = min(k_y, -(-int(np.ceil(k_y * frac)) // 8) * 8)
        return max(kyc, min(k_y, 8))

    def _plan_device_ec(self, H, W):
        """Static lane-coding plan for a frame size: effective lane
        count (scaled to the symbol count so the ~6 B/lane container
        overhead stays negligible on small frames), symbol counts, the
        skip-compaction rung, and the first-rung (mw, cap)."""
        from ..entropy.device_rans import effective_lanes
        enc = self.device_encoder
        n_y = (H // 16) * (W // 16) * G_CH_Y // 2
        zh, zw = C.get_downsampled_shape(H, W, 64)
        n_z = zh * zw * G_CH_Z
        lanes = effective_lanes(enc.lanes, 2 * n_y + n_z)
        k_y = -(-n_y // lanes)
        k_z = -(-n_z // lanes)
        kyc = self._kyc_for(k_y, self.force_zero_thres)
        bps = max(enc.bytes_per_symbol,
                  self._ec_learned.get((H, W), 0.0))
        k_total = k_z + 2 * (kyc if kyc > 0 else k_y)
        n_total = lanes * k_total
        _, mw = self._mw_for(n_total, lanes, bps)
        cap = self._cap_for(lanes, mw, top_rung=bps >= 3.0)
        return lanes, n_total, k_total, bps, mw, cap, kyc, k_y, k_z

    def _finish_one_device(self, arr, lanes, mw, cap, bps, n_total,
                           k_total, rerun, kyc=0, k_y=0, k_z=0,
                           learn_key=None):
        """Overflow-check one fetched compact staging and serialize it;
        `rerun(mw, cap, kyc)` re-executes the frame at a grown rung (XLA
        scan path: overflow frames are rare and each extra Pallas
        (mw, cap) config would cost a fresh multi-minute Mosaic
        compile).  Two overflow axes: the staging rectangle (lens too
        long -> grow bps) and the skip-compaction prefix (survivors
        m > lanes*kyc -> grow kyc straight to what the in-graph count
        says the frame needs).  Settled rates persist in _ec_learned
        (keyed by learn_key) so later launches skip the reruns; the
        serialized rung is recomputed from the payload with a
        default-start settle so streams stay history-independent (see
        DMCI._finish_one_device_i)."""
        from ..entropy.device_rans import (serialize_frame_dense,
                                           undensify_packed)
        g_mw, g_cap, g_bps, g_kyc = mw, cap, bps, kyc
        g_n_total, g_k_total = n_total, k_total
        for _ in range(8):
            dense, ln, st = undensify_packed(arr, g_cap, lanes)
            m_max = (int(arr[g_cap + 3 * lanes]) << 16) \
                | int(arr[g_cap + 3 * lanes + 1])
            comp_over = g_kyc > 0 and g_kyc < k_y \
                and m_max > lanes * g_kyc
            stage_over = int(ln.max(initial=0)) >= g_mw - 2 \
                or int(ln.sum()) > g_cap
            if not comp_over and not stage_over:
                break
            if comp_over:
                need = -(-m_max // lanes)
                g_kyc = min(k_y, -(-max(need, g_kyc * 2) // 8) * 8)
                g_k_total = k_z + 2 * g_kyc
                g_n_total = lanes * g_k_total
            if stage_over:
                g_bps = min(g_bps * 2, 3.0)
            top = g_bps >= 3.0
            _, g_mw = self._mw_for(g_n_total, lanes, g_bps)
            g_cap = self._cap_for(lanes, g_mw, top_rung=top)
            self._ec_rerun_count += 1
            arr = jax.device_get(rerun(g_mw, g_cap, g_kyc))
        else:
            raise OverflowError(
                "device rANS staging overflowed at the top ladder rung")
        if learn_key is not None and g_bps > bps:
            self._ec_learned[learn_key] = max(
                self._ec_learned.get(learn_key, 0.0), g_bps)
        # serialize at the rung a DEFAULT-start ladder settles at (pure
        # host arithmetic over the complete payload): streams stay
        # deterministic even though the launch rectangle adapts
        ln_max, ln_sum = int(ln.max(initial=0)), int(ln.sum())
        s_bps = self.device_encoder.bytes_per_symbol
        for _ in range(8):
            _, s_mw = self._mw_for(g_n_total, lanes, s_bps)
            s_cap = self._cap_for(lanes, s_mw, top_rung=s_bps >= 3.0)
            if ln_max < s_mw - 2 and ln_sum <= s_cap:
                return serialize_frame_dense(dense, ln, st, g_n_total,
                                             g_k_total, s_mw, s_cap,
                                             g_kyc)
            s_bps = min(s_bps * 2, 3.0)
        raise OverflowError(
            "device rANS staging overflowed at the top ladder rung")

    def _slim_fetch(self, packed, lanes, cap):
        """Windowed D2H of encode staging(s); see device_rans.slim_fetch
        (transfer slimming — only ~true-bpp bytes cross the link)."""
        from ..entropy.device_rans import slim_fetch
        return slim_fetch(self._fetch_windows, packed, lanes, cap)

    def _upload_stagings(self, bit_streams):
        """Bucketed H2D of decode stagings; see
        device_rans.upload_stagings."""
        from ..entropy.device_rans import upload_stagings
        return upload_stagings(bit_streams)

    def _compress_async_device(self, x, qp, qp_dev):
        """Device-EC encode: ONE execution per frame (all NN stages +
        lane layout + the three rANS scans fused), one async D2H of the
        staged segments; rare staging overflows re-run the megastage at
        the next bytes-per-symbol ladder step."""
        p = self.params
        enc = self.device_encoder
        from_feature = self.dpb[0].feature is not None
        ref = self.dpb[0].feature if from_feature \
            else jnp.asarray(self.dpb[0].frame, self.dtype)

        H, W = x.shape[1], x.shape[2]
        lanes, n_total, k_total, bps, mw, cap, kyc, k_y, k_z = \
            self._plan_device_ec(H, W)

        fz = self.force_zero_thres

        def run(mw, cap, kyc, use_pallas):
            return self._j_compress_frame(
                p, x, ref, qp_dev, enc.cum_hl, from_feature, lanes,
                mw, enc.n_y_rows, cap, use_pallas, fz, kyc)

        feature_out, packed = run(mw, cap, kyc,
                                  _use_pallas_ec())
        fetch = self._slim_fetch(packed, lanes, cap)
        self.add_ref_frame(feature_out, None)

        def finish_device():
            return self._finish_one_device(
                fetch(), lanes, mw, cap, bps, n_total,
                k_total, lambda m, c, k: run(m, c, k, False)[1],
                kyc, k_y, k_z, learn_key=(H, W))

        return finish_device

    def compress_gop_async(self, frames, qps):
        """GOP-batched device-EC encode: N consecutive P-frames in ONE
        device execution and ONE dense D2H (the link's per-transfer
        latency amortizes over the chunk; see _compress_gop).  Requires
        a feature reference in the DPB (encode the first P after an I
        with compress_async).  Returns a zero-arg callable producing the
        list of per-frame bit streams (same container each frame as the
        single-frame path)."""
        if not self.device_ec:
            raise ValueError("compress_gop_async requires device-EC "
                             "mode")
        if self.dpb[0].feature is None:
            raise ValueError("compress_gop_async needs a feature "
                             "reference (encode the first P-frame with "
                             "compress_async)")
        p = self.params
        enc = self.device_encoder
        xs = jnp.stack([jnp.asarray(x, self.dtype) for x in frames])
        qps_arr = jnp.asarray(np.asarray(qps, np.int32))
        qps_np = [int(q) for q in qps]

        H, W = xs.shape[2], xs.shape[3]
        lanes, n_total, k_total, bps, mw, cap, kyc, k_y, k_z = \
            self._plan_device_ec(H, W)

        fz = self.force_zero_thres
        feat_last, segs, feats_in = self._j_compress_gop(
            p, xs, self.dpb[0].feature, qps_arr, enc.cum_hl, lanes,
            mw, enc.n_y_rows, cap, _use_pallas_ec(), fz,
            kyc)
        fetch = self._slim_fetch(segs, lanes, cap)
        self.add_ref_frame(feat_last, None, increase_poc=False)
        self.curr_poc += len(frames)

        def finish_gop():
            arr = fetch()
            streams = []
            for i in range(len(frames)):
                def rerun(m, c, k, i=i):
                    return self._j_compress_frame(
                        p, jnp.asarray(frames[i], self.dtype),
                        feats_in[i], np.int32(qps_np[i]), enc.cum_hl,
                        True, lanes, m, enc.n_y_rows, c, False,
                        fz, k)[1]
                streams.append(self._finish_one_device(
                    arr[i], lanes, mw, cap, bps, n_total, k_total,
                    rerun, kyc, k_y, k_z, learn_key=(H, W)))
            return streams

        return finish_gop

    def compress_gop(self, frames, qps):
        return {"bit_streams": self.compress_gop_async(frames, qps)()}

    def compress(self, x, qp):
        finish = self.compress_async(x, qp)
        return {"bit_stream": finish()}

    # -- decompress ----------------------------------------------------------

    def _decompress_device(self, bit_stream, sps, qp):
        """Device-EC decode: one compact (~true-bpp) H2D upload and ONE
        execution per frame (device-side lane re-expansion + lane
        decoders + all NN stages fused)."""
        p = self.params
        qp_dev = np.int32(qp)
        dec = self.device_decoder

        metas, stagings = self._upload_stagings([bit_stream])
        m = metas[0]
        stream_dev = stagings[0]  # ONE (slimmed) upload per frame

        zh, zw = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        from_feature = self.dpb[0].feature is not None
        ref = self.dpb[0].feature if from_feature \
            else jnp.asarray(self.dpb[0].frame, self.dtype)
        fz = self.force_zero_thres
        feature_out, x_hat = self._j_decompress_frame(
            p, stream_dev, ref, qp_dev, dec.cum_hl, from_feature,
            zh, zw, m["L"], dec.n_y_rows, m["cap"], m["MW"],
            _use_pallas_ec(), fz, m["kyc"])
        self.add_ref_frame(feature_out, x_hat)
        return {"x_hat": x_hat}

    def decompress_gop(self, bit_streams, sps, qps):
        """GOP-batched device-EC decode: N frames' compact stagings in
        ONE upload + ONE execution.  Falls back to per-frame decode when
        the chunk's containers disagree on the lane configuration (a
        frame that hit the regrow ladder).  Returns
        {"x_hat": (N, 1, H, W, C)} with the DPB advanced past the whole
        chunk."""
        if not self.device_ec:
            raise ValueError("decompress_gop requires device-EC mode")
        if self.dpb[0].feature is None:
            raise ValueError("decompress_gop needs a feature reference "
                             "(decode the first P-frame with "
                             "decompress)")
        metas, stagings = self._upload_stagings(bit_streams)
        if stagings is None:
            outs = [self.decompress(s, sps, q)["x_hat"]
                    for s, q in zip(bit_streams, qps)]
            return {"x_hat": jnp.stack(outs)}
        qps_arr = jnp.asarray(np.asarray(qps, np.int32))
        return self._decompress_gop_uploaded(
            (metas[0], stagings, len(bit_streams)), sps, qps_arr)

    def upload_gop(self, bit_streams, sps):
        """Parse a chunk's containers and START its H2D upload (async),
        so a decoder pipeline can overlay the next chunk's transfer
        under the current chunk's execution (the decode mirror of
        compress_gop_async's fetch overlap; the reference overlaps
        entropy decode with NN compute on a side CUDA stream,
        video_model.py:364-371).  Returns an opaque handle for
        decompress_gop_uploaded, or None if the chunk needs the
        per-frame fallback (mixed ladder rungs)."""
        metas, stagings = self._upload_stagings(bit_streams)
        if stagings is None:
            return None
        return (metas[0], stagings, len(bit_streams))

    def decompress_gop_uploaded(self, uploaded, sps, qps):
        return self._decompress_gop_uploaded(
            uploaded, sps, jnp.asarray(np.asarray(qps, np.int32)))

    def _decompress_gop_uploaded(self, uploaded, sps, qps_arr):
        m, stagings, n = uploaded
        p = self.params
        dec = self.device_decoder
        zh, zw = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        fz = self.force_zero_thres
        feat_last, x_hats = self._j_decompress_gop(
            p, stagings, self.dpb[0].feature, qps_arr, dec.cum_hl, zh,
            zw, m["L"], dec.n_y_rows, m["cap"], m["MW"],
            _use_pallas_ec(), fz, m["kyc"])
        self.add_ref_frame(feat_last, x_hats[-1], increase_poc=False)
        self.curr_poc += n
        return {"x_hat": x_hats}

    def decompress(self, bit_stream, sps, qp):
        p = self.params
        fz = self.force_zero_thres
        if self.device_ec:
            return self._decompress_device(bit_stream, sps, qp)
        qp_dev = np.int32(qp)

        self.entropy_coder.set_use_two_entropy_coders(sps["ec_part"] == 1)
        self.entropy_coder.set_stream(bit_stream)
        z_size = C.get_downsampled_shape(sps["height"], sps["width"], 64)
        # start the host-side z decode immediately; it overlaps the
        # feature-extractor compute below (reference overlaps via CUDA
        # streams, video_model.py:353-362)
        self.bit_estimator_z.decode_z(z_size, qp)

        feature = self.apply_feature_adaptor()
        x1, ctx_t = self._j_fe_part1(p, feature, qp_dev)

        z_hat = jnp.asarray(self.bit_estimator_z.get_z(z_size),
                            dtype=self.dtype)
        params_prior = self._j_prior(p, z_hat, ctx_t)

        indexes0, skip0 = self._j_dec_index0(params_prior, fz)
        skip0_np = None if skip0 is None else np.asarray(skip0)
        self.gaussian_encoder.decode_y(np.asarray(indexes0), skip0_np)

        ctx = self._j_fe_part2(p, x1)

        y_q_r0 = self.gaussian_encoder.get_y(indexes0.shape, skip0_np)
        y_hat_0 = self._j_dec_restore(jnp.asarray(y_q_r0, self.dtype),
                                      params_prior, 0, True)
        scales1, means1 = self._j_spatial(p, y_hat_0, params_prior)
        indexes1, skip1 = self._j_fold_index(scales1, 1, fz)
        skip1_np = None if skip1 is None else np.asarray(skip1)
        self.gaussian_encoder.decode_y(np.asarray(indexes1), skip1_np)
        y_q_r1 = self.gaussian_encoder.get_y(indexes1.shape, skip1_np)
        y_hat_1 = self._j_dec_restore(jnp.asarray(y_q_r1, self.dtype),
                                      means1, 1, False)

        feature_out = self._j_feature_out(p, y_hat_0, y_hat_1,
                                          params_prior, ctx, qp_dev)
        x_hat = self._j_recon_x(p, feature_out, qp_dev)

        self.add_ref_frame(feature_out, x_hat)
        return {"x_hat": x_hat}
