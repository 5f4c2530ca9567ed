"""DCVC-HEM/TCM-generation building blocks.

Functional NHWC re-design of the HEM layer set (reference:
DCVC-family/DCVC-HEM/src/models/video_net.py): configurable ResBlock
(slope / bottleneck / start/end relu), SELayer, ConvBlockResidual, UNet,
plain conv enc/dec towers and the 5-conv hyper towers.
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


def res_block_init(key, channel, bottleneck=False):
    mid = channel // 2 if bottleneck else channel
    k1, k2 = jax.random.split(key)
    return {"c1": conv_init(k1, channel, mid, 3),
            "c2": conv_init(k2, mid, channel, 3)}


def res_block_apply(p, x, slope=0.01, start_from_relu=True,
                    end_with_relu=False):
    def act(v):
        return jax.nn.relu(v) if slope < 1e-4 else lrelu(v, slope)
    out = act(x) if start_from_relu else x
    out = conv_apply(p["c1"], out, padding=1)
    out = act(out)
    out = conv_apply(p["c2"], out, padding=1)
    if end_with_relu:
        out = act(out)
    return x + out


def residual_block_init(key, in_ch, out_ch):
    """Two 3x3 convs with LeakyReLU(0.01) + optional 1x1 adaptor
    (video_net.py ResidualBlock used in mv enc/dec)."""
    ks = jax.random.split(key, 3)
    p = {"c1": conv_init(ks[0], in_ch, out_ch, 3),
         "c2": conv_init(ks[1], out_ch, out_ch, 3)}
    if in_ch != out_ch:
        p["adaptor"] = conv_init(ks[2], in_ch, out_ch, 1)
    return p


def residual_block_apply(p, x, slope=0.01):
    identity = x
    if "adaptor" in p:
        identity = conv_apply(p["adaptor"], x)
    out = lrelu(conv_apply(p["c1"], x, padding=1), slope)
    out = lrelu(conv_apply(p["c2"], out, padding=1), slope)
    return identity + out


def se_layer_init(key, channel, reduction=16):
    k1, k2 = jax.random.split(key)
    import math
    b1 = 1.0 / math.sqrt(channel)
    b2 = 1.0 / math.sqrt(channel // reduction)
    w1 = jax.random.uniform(k1, (channel, channel // reduction),
                            minval=-b1, maxval=b1)
    w2 = jax.random.uniform(k2, (channel // reduction, channel),
                            minval=-b2, maxval=b2)
    return {"w1": w1, "w2": w2}


def se_layer_apply(p, x):
    y = jnp.mean(x, axis=(1, 2))  # (B, C)
    y = jax.nn.relu(y @ p["w1"].astype(x.dtype))
    y = jax.nn.sigmoid(y @ p["w2"].astype(x.dtype))
    return x * y[:, None, None, :]


def conv_block_residual_init(key, ch_in, ch_out, se=True):
    ks = jax.random.split(key, 4)
    p = {"c1": conv_init(ks[0], ch_in, ch_out, 3),
         "c2": conv_init(ks[1], ch_out, ch_out, 3),
         "up_dim": conv_init(ks[2], ch_in, ch_out, 1)}
    if se:
        p["se"] = se_layer_init(ks[3], ch_out)
    return p


def conv_block_residual_apply(p, x):
    out = lrelu(conv_apply(p["c1"], x, padding=1), 0.01)
    out = conv_apply(p["c2"], out, padding=1)
    if "se" in p:
        out = se_layer_apply(p["se"], out)
    return out + conv_apply(p["up_dim"], x)


def _max_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def unet_init(key, in_ch=64, out_ch=64):
    ks = jax.random.split(key, 11)
    return {
        "conv1": conv_block_residual_init(ks[0], in_ch, 32),
        "conv2": conv_block_residual_init(ks[1], 32, 64),
        "conv3": conv_block_residual_init(ks[2], 64, 128),
        "refine": [res_block_init(k, 128) for k in ks[3:7]],
        "up3": subpel1x1_init(ks[7], 128, 64),
        "up_conv3": conv_block_residual_init(ks[8], 128, 64),
        "up2": subpel1x1_init(ks[9], 64, 32),
        "up_conv2": conv_block_residual_init(ks[10], 64, out_ch),
    }


def unet_apply(p, x):
    x1 = conv_block_residual_apply(p["conv1"], x)
    x2 = _max_pool2(x1)
    x2 = conv_block_residual_apply(p["conv2"], x2)
    x3 = _max_pool2(x2)
    x3 = conv_block_residual_apply(p["conv3"], x3)
    for rp in p["refine"]:
        x3 = res_block_apply(rp, x3, slope=0.0)  # ReLU variant
    d3 = subpel1x1_apply(p["up3"], x3)
    d3 = conv_block_residual_apply(p["up_conv3"],
                                   jnp.concatenate((x2, d3), axis=-1))
    d2 = subpel1x1_apply(p["up2"], d3)
    return conv_block_residual_apply(p["up_conv2"],
                                     jnp.concatenate((x1, d2), axis=-1))


# ---------------------------------------------------------------------------
# enc/dec towers (video_net.py:226-248) and hyper towers (:251-275)
# ---------------------------------------------------------------------------

def enc_tower_init(key, in_ch, channel):
    ks = jax.random.split(key, 7)
    return {
        "rbs1": res_block_stride_init(ks[0], in_ch, channel),
        "rb1": residual_block_init(ks[1], channel, channel),
        "rbs2": res_block_stride_init(ks[2], channel, channel),
        "rb2": residual_block_init(ks[3], channel, channel),
        "rbs3": res_block_stride_init(ks[4], channel, channel),
        "rb3": residual_block_init(ks[5], channel, channel),
        "down": conv_init(ks[6], channel, channel, 3),
    }


def enc_tower_apply(p, x):
    h = res_block_stride_apply(p["rbs1"], x)
    h = residual_block_apply(p["rb1"], h)
    h = res_block_stride_apply(p["rbs2"], h)
    h = residual_block_apply(p["rb2"], h)
    h = res_block_stride_apply(p["rbs3"], h)
    h = residual_block_apply(p["rb3"], h)
    return conv_apply(p["down"], h, stride=2, padding=1)


def dec_tower_init(key, out_ch, channel):
    ks = jax.random.split(key, 8)
    return {
        "rb1": residual_block_init(ks[0], channel, channel),
        "rbu1": res_block_upsample_init(ks[1], channel, channel),
        "rb2": residual_block_init(ks[2], channel, channel),
        "rbu2": res_block_upsample_init(ks[3], channel, channel),
        "rb3": residual_block_init(ks[4], channel, channel),
        "rbu3": res_block_upsample_init(ks[5], channel, channel),
        "rb4": residual_block_init(ks[6], channel, channel),
        "subpel": subpel1x1_init(ks[7], channel, out_ch),
    }


def dec_tower_apply(p, y):
    h = residual_block_apply(p["rb1"], y)
    h = res_block_upsample_apply(p["rbu1"], h)
    h = residual_block_apply(p["rb2"], h)
    h = res_block_upsample_apply(p["rbu2"], h)
    h = residual_block_apply(p["rb3"], h)
    h = res_block_upsample_apply(p["rbu3"], h)
    h = residual_block_apply(p["rb4"], h)
    return subpel1x1_apply(p["subpel"], h)


def hyper_enc_init(key, y_channel, z_channel):
    ks = jax.random.split(key, 5)
    return [conv_init(ks[0], y_channel, z_channel, 3),
            conv_init(ks[1], z_channel, z_channel, 3),
            conv_init(ks[2], z_channel, z_channel, 3),
            conv_init(ks[3], z_channel, z_channel, 3),
            conv_init(ks[4], z_channel, z_channel, 3)]


def hyper_enc_apply(p, y):
    h = lrelu(conv_apply(p[0], y, padding=1), 0.01)
    h = lrelu(conv_apply(p[1], h, padding=1), 0.01)
    h = lrelu(conv_apply(p[2], h, stride=2, padding=1), 0.01)
    h = lrelu(conv_apply(p[3], h, padding=1), 0.01)
    return conv_apply(p[4], h, stride=2, padding=1)


def hyper_dec_init(key, y_channel, z_channel, out_factor=2, mid=None):
    """mid defaults to the HEM generation's widening (y*3//2); the DC
    generation keeps the tower uniform (mid = y)."""
    ks = jax.random.split(key, 5)
    if mid is None:
        mid = y_channel * 3 // 2
    return {
        "c1": conv_init(ks[0], z_channel, y_channel, 3),
        "up1": subpel1x1_init(ks[1], y_channel, y_channel),
        "c2": conv_init(ks[2], y_channel, mid, 3),
        "up2": subpel1x1_init(ks[3], mid, mid),
        "c3": conv_init(ks[4], mid, y_channel * out_factor, 3),
    }


def hyper_dec_apply(p, z):
    h = lrelu(conv_apply(p["c1"], z, padding=1), 0.01)
    h = lrelu(subpel1x1_apply(p["up1"], h), 0.01)
    h = lrelu(conv_apply(p["c2"], h, padding=1), 0.01)
    h = lrelu(subpel1x1_apply(p["up2"], h), 0.01)
    return conv_apply(p["c3"], h, padding=1)


def hem_spynet_init(key):
    """HEM/TCM/DCVC-era ME_Spynet: 4 identical 7x7 MEBasic modules
    (`moduleBasic` ModuleList, reference DCVC-HEM video_net.py:118-147)
    — unlike FM's, which narrows to 5x5 at the finer levels."""
    from .blocks_fm import me_basic_init
    return {"moduleBasic": [me_basic_init(k, 7)
                            for k in jax.random.split(key, 4)]}


def hem_spynet_apply(p, im1, im2):
    """Coarse-to-fine flow; every level (including the coarsest) warps
    with the upsampled previous flow (zero at the start)."""
    from .blocks_fm import me_basic_apply, _avg_pool2
    from ..ops.warp import flow_warp, bilinear_resize_2x
    im1_list = [im1]
    im2_list = [im2]
    for _ in range(3):
        im1_list.append(_avg_pool2(im1_list[-1]))
        im2_list.append(_avg_pool2(im2_list[-1]))
    b, h8, w8, _ = im1_list[3].shape
    flow = jnp.zeros((b, h8 // 2, w8 // 2, 2), im1.dtype)
    for level in range(4):
        idx = 3 - level
        flow_up = bilinear_resize_2x(flow, up=True) * 2.0
        flow = flow_up + me_basic_apply(
            p["moduleBasic"][level],
            jnp.concatenate((im1_list[idx],
                             flow_warp(im2_list[idx], flow_up),
                             flow_up), axis=-1), 7)
    return flow


def conv_lrelu_stack_init(key, channels, ksize=3):
    """Plain [conv3x3 + LeakyReLU(0.2)]*n + conv3x3 stack used by the HEM
    prior fusion / spatial prior nets."""
    ks = jax.random.split(key, len(channels) - 1)
    return [conv_init(k, channels[i], channels[i + 1], ksize)
            for i, k in enumerate(ks)]


def conv_lrelu_stack_apply(plist, x, slope=0.2):
    for i, p in enumerate(plist):
        x = conv_apply(p, x, padding=1)
        if i != len(plist) - 1:
            x = lrelu(x, slope)
    return x
