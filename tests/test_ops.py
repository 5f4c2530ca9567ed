"""Fused-op semantics: pixel shuffle orders, masks, quantization ops."""

import numpy as np
import jax.numpy as jnp

from opendcvc_tpu.ops import fused as F


def test_space_to_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    d = F.space_to_depth(x, 8)
    assert d.shape == (2, 2, 3, 192)
    back = F.depth_to_space(d, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_space_to_depth_torch_order():
    """Channel ordering must match torch.pixel_unshuffle: c*r^2 + dy*r + dx."""
    import torch
    rng = np.random.default_rng(1)
    x = rng.random((1, 3, 8, 8)).astype(np.float32)
    t = torch.nn.functional.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    j = np.asarray(F.space_to_depth(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(j.transpose(0, 3, 1, 2), t, rtol=0, atol=0)


def test_depth_to_space_torch_order():
    import torch
    rng = np.random.default_rng(2)
    x = rng.random((1, 12, 4, 4)).astype(np.float32)
    t = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    j = np.asarray(F.depth_to_space(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(j.transpose(0, 3, 1, 2), t, rtol=0, atol=0)


def test_round_and_to_int8():
    z = jnp.asarray([[-200.3, -0.5, 0.5, 1.5, 300.7]])
    z_hat, z_int8 = F.round_and_to_int8(z)
    # round half-to-even then clamp
    np.testing.assert_array_equal(np.asarray(z_hat)[0],
                                  [-128.0, -0.0, 0.0, 2.0, 127.0])
    np.testing.assert_array_equal(np.asarray(z_int8)[0],
                                  [-128, 0, 0, 2, 127])


def test_masks_2x_partition():
    m0, m1 = F.checkerboard_masks_2x(6, 6, 8, jnp.float32)
    s = np.asarray(m0) + np.asarray(m1)
    np.testing.assert_array_equal(s, np.ones_like(s))
    # complementary checkerboard within each channel half
    m0 = np.asarray(m0)
    assert m0[0, 0, 0, 0] == 1 and m0[0, 0, 1, 0] == 0
    assert m0[0, 0, 0, 4] == 0 and m0[0, 0, 1, 4] == 1


def test_masks_4x_partition():
    masks = F.checkerboard_masks_4x(4, 4, 8, jnp.float32)
    s = sum(np.asarray(m) for m in masks)
    np.testing.assert_array_equal(s, np.ones_like(s))


def test_process_with_mask_roundtrip_via_fold():
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0, 3, (1, 4, 4, 8)), jnp.float32)
    scales = jnp.asarray(rng.random((1, 4, 4, 8)) + 0.2, jnp.float32)
    means = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 8)), jnp.float32)
    m0, m1 = F.checkerboard_masks_2x(4, 4, 8, jnp.float32)
    _, y_q, y_hat, s_hat = F.process_with_mask(y, scales, means, m0)
    # folded symbols restore to the same y_hat
    y_q_f = F.fold_halves(y_q)
    restored = F.restore_y_2x(y_q_f, means, m0)
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(y_hat))


def test_build_index_enc_dec_agree():
    rng = np.random.default_rng(4)
    scales = jnp.asarray(rng.random((1, 4, 4, 4)) * 20, jnp.float32)
    import math
    lo, hi, lev = 0.11, 16.0, 128
    lsm = math.log(lo)
    recip = (lev - 1) / (math.log(hi) - math.log(lo))
    idx_d, _ = F.build_index_dec(scales, lo, hi, lsm, recip)
    sym = jnp.zeros_like(scales)
    packed, _ = F.build_index_enc(sym, scales, lo, hi, lsm, recip)
    np.testing.assert_array_equal(np.asarray(packed) & 0xFF,
                                  np.asarray(idx_d))
    assert int(np.asarray(idx_d).max()) <= 127


def test_replicate_pad():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3, 1)
    p = F.replicate_pad(x, 1, 2)
    assert p.shape == (1, 3, 5, 1)
    np.testing.assert_array_equal(np.asarray(p)[0, :, :, 0],
                                  [[0, 1, 2, 2, 2],
                                   [3, 4, 5, 5, 5],
                                   [3, 4, 5, 5, 5]])
