"""Fused, eager-free checkerboard-prior stage functions shared by the
family codecs.

Every op that is not inside a jitted stage pays a full dispatch round
trip (large under remote-device tunnels), so the per-pass pipeline —
prior separation, masked quantization, index building, int16 symbol
packing, running y_hat accumulation — is fused into single jit calls.
The decoder-side index computation repeats the encoder's elementwise
math on identical inputs (bit-deterministic), while conv-bearing
subgraphs stay in their own shared stage functions.

Usage: `stages = make_pass_stages(cfg, nparts)` where cfg is the
(scale_min, scale_max, log_scale_min, log_step_recip) tuple of the
codec's GaussianEncoder and nparts is 2 or 4.
"""

import jax
import jax.numpy as jnp

from ..ops import fused as F
from . import common as C


def make_pass_stages(cfg, nparts):
    smin, smax, lsm, recip = cfg

    def indexes_of(scales_r):
        idx, _ = F.build_index_dec(scales_r, smin, smax, lsm, recip, None)
        return idx

    def masks_of(h, w, c, dtype):
        if nparts == 2:
            return F.checkerboard_masks_2x(h, w, c, dtype)
        return F.checkerboard_masks_4x(h, w, c, dtype)

    fold = F.fold_halves if nparts == 2 else F.fold_quarters
    restore = F.restore_y_2x if nparts == 2 else F.restore_y_4x

    def pass_core(y_div, scales, means, so_far, k):
        _, h, w, c = y_div.shape
        masks = masks_of(h, w, c, y_div.dtype)
        _, y_q, y_hat_k, _ = F.process_with_mask(y_div, scales, means,
                                                 masks[k], None)
        idx = indexes_of(fold(scales * masks[k]))
        packed = (fold(y_q).astype(jnp.int16) << 8) + idx.astype(jnp.int16)
        so_far = y_hat_k if so_far is None else so_far + y_hat_k
        return packed, so_far

    # --- video-style (chunk-3 prior) ---------------------------------------

    def enc_pass0_video(y, params_prior):
        y_div, _, scales, means = C.separate_prior_video_encoding(
            params_prior, y)
        packed, so_far = pass_core(y_div, scales, means, None, 0)
        return y_div, packed, so_far

    def enc_pass_k(y_div, scales, means, so_far, k):
        return pass_core(y_div, scales, means, so_far, k)

    def dec_index0_video(params_prior):
        _, scales, _ = C.separate_prior_video_decoding(params_prior)
        _, h, w, c = scales.shape
        masks = masks_of(h, w, c, scales.dtype)
        return indexes_of(fold(scales * masks[0]))

    def dec_index_k(scales, k):
        _, h, w, c = scales.shape
        masks = masks_of(h, w, c, scales.dtype)
        return indexes_of(fold(scales * masks[k]))

    def dec_restore0_video(y_q_r, params_prior):
        _, _, means = C.separate_prior_video_decoding(params_prior)
        _, h, w, c = means.shape
        masks = masks_of(h, w, c, means.dtype)
        return restore(y_q_r, means, masks[0])

    def dec_restore_acc(y_q_r, means, so_far, k):
        _, h, w, c = means.shape
        masks = masks_of(h, w, c, means.dtype)
        y_hat_k = restore(y_q_r, means, masks[k])
        return y_hat_k if so_far is None else so_far + y_hat_k

    def finalize_video(so_far, params_prior):
        c3 = params_prior.shape[-1] // 3
        q_dec = jnp.maximum(params_prior[..., :c3], 0.5)
        return so_far * q_dec

    # --- HEM/EVC-style (explicit q_step map, optional outer q) -------------

    def enc_pass0_qstep(y, q_step, scales, means):
        y_div = y / q_step
        packed, so_far = pass_core(y_div, scales, means, None, 0)
        return y_div, packed, so_far

    def finalize_qstep(y_hat_0, y_hat_1, q_step, outer_q):
        return (y_hat_0 + y_hat_1) * q_step * outer_q

    return {
        "enc_pass0_video": jax.jit(enc_pass0_video),
        "enc_pass_k": jax.jit(enc_pass_k, static_argnums=(4,)),
        "dec_index0_video": jax.jit(dec_index0_video),
        "dec_index_k": jax.jit(dec_index_k, static_argnums=(1,)),
        "dec_restore0_video": jax.jit(dec_restore0_video),
        "dec_restore_acc": jax.jit(dec_restore_acc, static_argnums=(3,)),
        "finalize_video": jax.jit(finalize_video),
        "enc_pass0_qstep": jax.jit(enc_pass0_qstep),
        "finalize_qstep": jax.jit(finalize_qstep),
    }
