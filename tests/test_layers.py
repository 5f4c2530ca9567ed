"""Layer library: conv arithmetic vs torch, block shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from opendcvc_tpu.layers import blocks as L


def test_conv_matches_torch():
    """Explicit-padding conv must reproduce torch conv arithmetic exactly
    (incl. stride-2 with padding=1 where XLA 'SAME' differs)."""
    import torch
    rng = np.random.default_rng(0)
    x = rng.random((1, 4, 10, 12)).astype(np.float32)
    w = rng.random((6, 4, 3, 3)).astype(np.float32) - 0.5
    b = rng.random(6).astype(np.float32)

    for stride, padding in ((1, 1), (2, 1), (2, 0), (1, 0)):
        if padding == 0 and stride == 1:
            continue
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=padding).numpy()
        p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
        j = L.conv_apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         stride=stride, padding=padding)
        np.testing.assert_allclose(np.asarray(j).transpose(0, 3, 1, 2), t,
                                   rtol=2e-5, atol=2e-5)


def test_depthwise_conv_matches_torch():
    import torch
    rng = np.random.default_rng(1)
    c = 8
    x = rng.random((1, c, 6, 6)).astype(np.float32)
    w = rng.random((c, 1, 3, 3)).astype(np.float32) - 0.5
    b = rng.random(c).astype(np.float32)
    t = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        padding=1, groups=c).numpy()
    # torch depthwise weight (C,1,kh,kw) -> HWIO (kh,kw,1,C)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    j = L.conv_apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     padding=1, groups=c)
    np.testing.assert_allclose(np.asarray(j).transpose(0, 3, 1, 2), t,
                               rtol=2e-5, atol=2e-5)


def test_depth_conv_block_shapes():
    key = jax.random.PRNGKey(0)
    p = L.depth_conv_block_init(key, 16, 32)
    x = jnp.zeros((1, 8, 8, 16))
    out = L.depth_conv_block_apply(p, x)
    assert out.shape == (1, 8, 8, 32)
    q = jnp.ones((1, 1, 1, 32))
    out = L.depth_conv_block_apply(p, x, quant_step=q)
    assert out.shape == (1, 8, 8, 32)
    cat = jnp.zeros((1, 8, 8, 4))
    out = L.depth_conv_block_apply(p, x, to_cat=cat, cat_at_front=True)
    assert out.shape == (1, 8, 8, 36)


def test_subpel_and_resblocks():
    key = jax.random.PRNGKey(1)
    p = L.subpel_conv2x_init(key, 8, 16, 3)
    out = L.subpel_conv2x_apply(p, jnp.zeros((1, 4, 4, 8)), padding=1)
    assert out.shape == (1, 8, 8, 16)

    p = L.res_block_stride2_init(key, 8, 16)
    out = L.res_block_stride2_apply(p, jnp.zeros((1, 8, 8, 8)))
    assert out.shape == (1, 4, 4, 16)

    p = L.res_block_upsample_init(key, 8, 16)
    out = L.res_block_upsample_apply(p, jnp.zeros((1, 4, 4, 8)))
    assert out.shape == (1, 8, 8, 16)


def test_wsilu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    out = np.asarray(L.wsilu(x))
    xn = np.asarray(x)
    expected = xn * (1 / (1 + np.exp(-4 * xn)))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)
