"""DCVC-FM-generation building blocks.

Functional NHWC re-design of the FM layer set (reference:
DCVC-family/DCVC-FM/src/models/layers.py, video_net.py).  The DepthConv
here activates only after its 1x1 (slope 0.01); three FFN variants exist:
ConvFFN (bounded width, lrelu 0.1), ConvFFN2 (gated: x1 * lrelu(x2)),
ConvFFN3 (two-slope sum).  DepthConvBlockN = DepthConv + ConvFFN{N}.
"""

import jax
import jax.numpy as jnp

from .blocks import conv_init, conv_apply
from .blocks_evc import (lrelu, res_block_stride_init, res_block_stride_apply,
                         res_block_upsample_init, res_block_upsample_apply,
                         subpel1x1_init, subpel1x1_apply)

__all__ = [
    "lrelu", "res_block_stride_init", "res_block_stride_apply",
    "res_block_upsample_init", "res_block_upsample_apply",
    "subpel1x1_init", "subpel1x1_apply",
]


def depth_conv_init(key, in_ch, out_ch):
    ks = jax.random.split(key, 4)
    p = {"conv1": conv_init(ks[0], in_ch, in_ch, 1),
         "dw": conv_init(ks[1], in_ch, in_ch, 3, groups=in_ch),
         "conv2": conv_init(ks[2], in_ch, out_ch, 1)}
    if in_ch != out_ch:
        p["adaptor"] = conv_init(ks[3], in_ch, out_ch, 1)
    return p


def depth_conv_apply(p, x, slope=0.01):
    identity = x
    if "adaptor" in p:
        identity = conv_apply(p["adaptor"], x)
    c = x.shape[-1]
    out = lrelu(conv_apply(p["conv1"], x), slope)
    out = conv_apply(p["dw"], out, padding=1, groups=c)
    out = conv_apply(p["conv2"], out)
    return out + identity


def conv_ffn_init(key, in_ch):
    internal = max(min(in_ch * 4, 1024), in_ch * 2)
    ks = jax.random.split(key, 2)
    return {"c1": conv_init(ks[0], in_ch, internal, 1),
            "c2": conv_init(ks[1], internal, in_ch, 1)}


def conv_ffn_apply(p, x, slope=0.1):
    out = lrelu(conv_apply(p["c1"], x), slope)
    out = lrelu(conv_apply(p["c2"], out), slope)
    return x + out


def conv_ffn2_init(key, in_ch):
    internal = in_ch * 2
    ks = jax.random.split(key, 2)
    return {"c": conv_init(ks[0], in_ch, internal * 2, 1),
            "out": conv_init(ks[1], internal, in_ch, 1)}


def conv_ffn2_apply(p, x):
    h = conv_apply(p["c"], x)
    c = h.shape[-1] // 2
    out = h[..., :c] * lrelu(h[..., c:], 0.1)
    return x + conv_apply(p["out"], out)


def conv_ffn3_init(key, in_ch):
    internal = in_ch * 2
    ks = jax.random.split(key, 2)
    return {"c": conv_init(ks[0], in_ch, internal * 2, 1),
            "out": conv_init(ks[1], internal, in_ch, 1)}


def conv_ffn3_apply(p, x):
    h = conv_apply(p["c"], x)
    c = h.shape[-1] // 2
    out = lrelu(h[..., :c], 0.1) + lrelu(h[..., c:], 0.01)
    return x + conv_apply(p["out"], out)


def dcb_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {"dc": depth_conv_init(k1, in_ch, out_ch),
            "ffn": conv_ffn_init(k2, out_ch)}


def dcb_apply(p, x):
    return conv_ffn_apply(p["ffn"], depth_conv_apply(p["dc"], x))


def dcb2_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {"dc": depth_conv_init(k1, in_ch, out_ch),
            "ffn": conv_ffn2_init(k2, out_ch)}


def dcb2_apply(p, x):
    return conv_ffn2_apply(p["ffn"], depth_conv_apply(p["dc"], x))


def dcb4_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {"dc": depth_conv_init(k1, in_ch, out_ch),
            "ffn": conv_ffn3_init(k2, out_ch)}


def dcb4_apply(p, x):
    return conv_ffn3_apply(p["ffn"], depth_conv_apply(p["dc"], x))


def depth_conv2_init(key, in_ch, out_ch):
    """Gated DepthConv (layers.py:180-202): out_conv(conv1(x) * conv2(x))."""
    ks = jax.random.split(key, 5)
    p = {"c1a": conv_init(ks[0], in_ch, out_ch, 1),
         "c1dw": conv_init(ks[1], out_ch, out_ch, 3, groups=out_ch),
         "c2": conv_init(ks[2], in_ch, out_ch, 1),
         "out": conv_init(ks[3], out_ch, out_ch, 1)}
    if in_ch != out_ch:
        p["adaptor"] = conv_init(ks[4], in_ch, out_ch, 1)
    return p


def depth_conv2_apply(p, x, slope=0.01):
    identity = x
    if "adaptor" in p:
        identity = conv_apply(p["adaptor"], x)
    c_out = p["c2"]["b"].shape[0]
    x1 = lrelu(conv_apply(p["c1a"], x), slope)
    x1 = conv_apply(p["c1dw"], x1, padding=1, groups=c_out)
    x2 = conv_apply(p["c2"], x)
    return identity + conv_apply(p["out"], x1 * x2)


def dcb3_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {"dc": depth_conv2_init(k1, in_ch, out_ch),
            "ffn": conv_ffn2_init(k2, out_ch)}


def dcb3_apply(p, x):
    return conv_ffn2_apply(p["ffn"], depth_conv2_apply(p["dc"], x))


def unet_init(key, in_ch, out_ch):
    """UNet (video_net.py:124-165): DCB2 blocks, strided-conv downsamples."""
    ks = jax.random.split(key, 11)
    return {
        "conv1": dcb2_init(ks[0], in_ch, 32),
        "down1": conv_init(ks[1], 32, 32, 2),
        "conv2": dcb2_init(ks[2], 32, 64),
        "down2": conv_init(ks[3], 64, 64, 2),
        "conv3": dcb2_init(ks[4], 64, 128),
        "refine": [dcb2_init(k, 128, 128) for k in ks[5:9]],
        "up3": subpel1x1_init(ks[9], 128, 64),
        "up_conv3": dcb2_init(ks[10], 128, 64),
        "up2": subpel1x1_init(jax.random.fold_in(key, 98), 64, 32),
        "up_conv2": dcb2_init(jax.random.fold_in(key, 99), 64, out_ch),
    }


def unet_apply(p, x):
    x1 = dcb2_apply(p["conv1"], x)
    x2 = conv_apply(p["down1"], x1, stride=2, padding=0)
    x2 = dcb2_apply(p["conv2"], x2)
    x3 = conv_apply(p["down2"], x2, stride=2, padding=0)
    x3 = dcb2_apply(p["conv3"], x3)
    for rp in p["refine"]:
        x3 = dcb2_apply(rp, x3)
    d3 = subpel1x1_apply(p["up3"], x3)
    d3 = dcb2_apply(p["up_conv3"], jnp.concatenate((x2, d3), axis=-1))
    d2 = subpel1x1_apply(p["up2"], d3)
    return dcb2_apply(p["up_conv2"], jnp.concatenate((x1, d2), axis=-1))


def res_block_init(key, in_ch, out_ch):
    """Pre-activation ResBlock (video_net.py:26-44)."""
    ks = jax.random.split(key, 3)
    p = {"conv1": conv_init(ks[0], in_ch, in_ch, 3),
         "conv2": conv_init(ks[1], in_ch, in_ch, 3)}
    return p


def res_block_apply(p, x, slope=0.01):
    out = lrelu(x, slope)
    out = conv_apply(p["conv1"], out, padding=1)
    out = lrelu(out, slope)
    out = conv_apply(p["conv2"], out, padding=1)
    return x + out


def rbs2_init(key, in_ch, out_ch):
    """ResidualBlockWithStride2 (layers.py:42-58)."""
    ks = jax.random.split(key, 3)
    return {"down": conv_init(ks[0], in_ch, out_ch, 2),
            "c1": conv_init(ks[1], out_ch, out_ch, 3),
            "c2": conv_init(ks[2], out_ch, out_ch, 1)}


def rbs2_apply(p, x):
    x = conv_apply(p["down"], x, stride=2, padding=0)
    out = lrelu(conv_apply(p["c1"], x, padding=1), 0.01)
    out = lrelu(conv_apply(p["c2"], out), 0.01)
    return x + out


# ---------------------------------------------------------------------------
# optical flow (video_net.py:47-121)
# ---------------------------------------------------------------------------

def me_basic_init(key, ksize):
    ks = jax.random.split(key, 5)
    pad = ksize // 2
    return {"c1": conv_init(ks[0], 8, 32, ksize),
            "c2": conv_init(ks[1], 32, 64, ksize),
            "c3": conv_init(ks[2], 64, 32, ksize),
            "c4": conv_init(ks[3], 32, 16, ksize),
            "c5": conv_init(ks[4], 16, 2, ksize),
            }


def me_basic_apply(p, x, ksize):
    pad = ksize // 2
    x = jax.nn.relu(conv_apply(p["c1"], x, padding=pad))
    x = jax.nn.relu(conv_apply(p["c2"], x, padding=pad))
    x = jax.nn.relu(conv_apply(p["c3"], x, padding=pad))
    x = jax.nn.relu(conv_apply(p["c4"], x, padding=pad))
    return conv_apply(p["c5"], x, padding=pad)


def spynet_init(key):
    ks = jax.random.split(key, 4)
    return {"me_8x": me_basic_init(ks[0], 7),
            "me_4x": me_basic_init(ks[1], 7),
            "me_2x": me_basic_init(ks[2], 5),
            "me_1x": me_basic_init(ks[3], 5)}


def _avg_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def spynet_apply(p, im1, im2):
    """4-level coarse-to-fine optical flow; flows in pixel units NHWC(2)."""
    from ..ops.warp import flow_warp, bilinear_resize_2x
    im1_levels = [im1]
    im2_levels = [im2]
    for _ in range(3):
        im1_levels.append(_avg_pool2(im1_levels[-1]))
        im2_levels.append(_avg_pool2(im2_levels[-1]))

    b, h8, w8, _ = im1_levels[3].shape
    zero = jnp.zeros((b, h8, w8, 2), im1.dtype)
    flow = me_basic_apply(p["me_8x"], jnp.concatenate(
        (im1_levels[3], im2_levels[3], zero), axis=-1), 7)

    for name, ksize, lvl in (("me_4x", 7, 2), ("me_2x", 5, 1),
                             ("me_1x", 5, 0)):
        flow = bilinear_resize_2x(flow, up=True) * 2.0
        warped = flow_warp(im2_levels[lvl], flow)
        flow = flow + me_basic_apply(
            p[name], jnp.concatenate((im1_levels[lvl], warped, flow),
                                     axis=-1), ksize)
    return flow


# ---------------------------------------------------------------------------
# UNet2 (video_net.py:168-209)
# ---------------------------------------------------------------------------

def unet2_init(key, in_ch, out_ch):
    ks = jax.random.split(key, 10)
    return {
        "conv1": dcb4_init(ks[0], in_ch, 32),
        "conv2": dcb4_init(ks[1], 32, 64),
        "conv3": dcb4_init(ks[2], 64, 128),
        "refine": [dcb4_init(k, 128, 128) for k in ks[3:7]],
        "up3": subpel1x1_init(ks[7], 128, 64),
        "up_conv3": dcb4_init(ks[8], 128, 64),
        "up2": subpel1x1_init(ks[9], 64, 32),
        "up_conv2": dcb4_init(jax.random.fold_in(key, 99), 64, out_ch),
    }


def _max_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def unet2_apply(p, x):
    x1 = dcb4_apply(p["conv1"], x)
    x2 = _max_pool2(x1)
    x2 = dcb4_apply(p["conv2"], x2)
    x3 = _max_pool2(x2)
    x3 = dcb4_apply(p["conv3"], x3)
    for rp in p["refine"]:
        x3 = dcb4_apply(rp, x3)
    d3 = subpel1x1_apply(p["up3"], x3)
    d3 = dcb4_apply(p["up_conv3"], jnp.concatenate((x2, d3), axis=-1))
    d2 = subpel1x1_apply(p["up2"], d3)
    return dcb4_apply(p["up_conv2"], jnp.concatenate((x1, d2), axis=-1))
