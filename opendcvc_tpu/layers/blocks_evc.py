"""EVC-era building blocks (LeakyReLU generation).

Functional NHWC re-design of the EVC layer set (reference:
DCVC-family/EVC/src/models/layers.py and hyperprior.py).  Two DepthConv
variants exist in the reference: the encoder/decoder one activates after
every conv (layers.py:160-196), the hyperprior one activates only after
conv1 and uses a bounded FFN width (hyperprior.py:7-50); both are kept.
"""

import jax
import jax.numpy as jnp

from .blocks import conv_init, conv_apply


def lrelu(x, slope=0.01):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# residual blocks (layers.py:63-157)
# ---------------------------------------------------------------------------

def res_block_stride_init(key, in_ch, out_ch, stride=2):
    ks = jax.random.split(key, 3)
    p = {"conv1": conv_init(ks[0], in_ch, out_ch, 3),
         "conv2": conv_init(ks[1], out_ch, out_ch, 3)}
    if stride != 1:
        p["down"] = conv_init(ks[2], in_ch, out_ch, 1)
    return p


def res_block_stride_apply(p, x, stride=2):
    out = conv_apply(p["conv1"], x, stride=stride, padding=1)
    out = lrelu(out, 0.01)
    out = conv_apply(p["conv2"], out, padding=1)
    out = lrelu(out, 0.1)
    identity = x
    if "down" in p:
        identity = conv_apply(p["down"], x, stride=stride, padding=0)
    return out + identity


def subpel1x1_init(key, in_ch, out_ch, r=2):
    return conv_init(key, in_ch, out_ch * r * r, 1)


def subpel1x1_apply(p, x, r=2):
    from ..ops.fused import depth_to_space
    return depth_to_space(conv_apply(p, x), r)


def res_block_upsample_init(key, in_ch, out_ch):
    ks = jax.random.split(key, 3)
    return {"subpel": subpel1x1_init(ks[0], in_ch, out_ch),
            "conv": conv_init(ks[1], out_ch, out_ch, 3),
            "up": subpel1x1_init(ks[2], in_ch, out_ch)}


def res_block_upsample_apply(p, x):
    out = subpel1x1_apply(p["subpel"], x)
    out = lrelu(out, 0.01)
    out = conv_apply(p["conv"], out, padding=1)
    out = lrelu(out, 0.1)
    return out + subpel1x1_apply(p["up"], x)


# ---------------------------------------------------------------------------
# enc/dec DepthConvBlock (layers.py:160-224): act after every conv
# ---------------------------------------------------------------------------

def depth_conv_init(key, in_ch, out_ch, stride=1):
    ks = jax.random.split(key, 4)
    p = {"conv1": conv_init(ks[0], in_ch, in_ch, 1),
         "dw": conv_init(ks[1], in_ch, in_ch, 3, groups=in_ch),
         "conv2": conv_init(ks[2], in_ch, out_ch, 1)}
    if stride != 1:
        p["adaptor"] = conv_init(ks[3], in_ch, out_ch, 2)
    elif in_ch != out_ch:
        p["adaptor"] = conv_init(ks[3], in_ch, out_ch, 1)
    return p


def depth_conv_apply(p, x, stride=1):
    identity = x
    if "adaptor" in p:
        identity = conv_apply(p["adaptor"], x, stride=stride, padding=0)
    c = x.shape[-1]
    out = lrelu(conv_apply(p["conv1"], x, stride=stride), 0.01)
    out = lrelu(conv_apply(p["dw"], out, padding=1, groups=c), 0.01)
    out = lrelu(conv_apply(p["conv2"], out), 0.01)
    return out + identity


def conv_ffn_init(key, in_ch, internal_ch=None):
    if internal_ch is None:
        internal_ch = in_ch * 4
    ks = jax.random.split(key, 2)
    return {"c1": conv_init(ks[0], in_ch, internal_ch, 1),
            "c2": conv_init(ks[1], internal_ch, in_ch, 1)}


def conv_ffn_apply(p, x):
    out = jax.nn.relu(conv_apply(p["c1"], x))
    out = jax.nn.relu(conv_apply(p["c2"], out))
    return x + out


def dcb_init(key, in_ch, out_ch, stride=1):
    k1, k2 = jax.random.split(key)
    return {"dc": depth_conv_init(k1, in_ch, out_ch, stride),
            "ffn": conv_ffn_init(k2, out_ch)}


def dcb_apply(p, x, stride=1):
    return conv_ffn_apply(p["ffn"], depth_conv_apply(p["dc"], x, stride))


# ---------------------------------------------------------------------------
# hyperprior blocks (hyperprior.py:7-77): act only after conv1; FFN width
# clamped to [2C, min(4C, 1024)]; LReLU slopes 0.01 (dc) / 0.1 (ffn)
# ---------------------------------------------------------------------------

def hp_depth_conv_init(key, in_ch, out_ch, stride=1):
    ks = jax.random.split(key, 4)
    p = {"conv1": conv_init(ks[0], in_ch, in_ch, 1),
         "dw": conv_init(ks[1], in_ch, in_ch, 3, groups=in_ch),
         "conv2": conv_init(ks[2], in_ch, out_ch, 1)}
    if stride != 1:
        p["adaptor"] = conv_init(ks[3], in_ch, out_ch, 2)
    elif in_ch != out_ch:
        p["adaptor"] = conv_init(ks[3], in_ch, out_ch, 1)
    return p


def hp_depth_conv_apply(p, x, stride=1):
    identity = x
    if "adaptor" in p:
        identity = conv_apply(p["adaptor"], x, stride=stride, padding=0)
    c = x.shape[-1]
    out = lrelu(conv_apply(p["conv1"], x, stride=stride), 0.01)
    out = conv_apply(p["dw"], out, padding=1, groups=c)
    out = conv_apply(p["conv2"], out)
    return out + identity


def hp_ffn_init(key, in_ch):
    internal = max(min(in_ch * 4, 1024), in_ch * 2)
    ks = jax.random.split(key, 2)
    return {"c1": conv_init(ks[0], in_ch, internal, 1),
            "c2": conv_init(ks[1], internal, in_ch, 1)}


def hp_ffn_apply(p, x):
    out = lrelu(conv_apply(p["c1"], x), 0.1)
    out = lrelu(conv_apply(p["c2"], out), 0.1)
    return x + out


def hp_dcb_init(key, in_ch, out_ch, stride=1):
    k1, k2 = jax.random.split(key)
    return {"dc": hp_depth_conv_init(k1, in_ch, out_ch, stride),
            "ffn": hp_ffn_init(k2, out_ch)}


def hp_dcb_apply(p, x, stride=1):
    return hp_ffn_apply(p["ffn"], hp_depth_conv_apply(p["dc"], x, stride))


def hp_dcb_upsample_init(key, in_ch, out_ch):
    ks = jax.random.split(key, 3)
    return {"dcb": hp_dcb_init(ks[0], in_ch, out_ch),
            "subpel": conv_init(ks[1], out_ch, out_ch * 4, 1)}


def hp_dcb_upsample_apply(p, x):
    from ..ops.fused import depth_to_space
    out = hp_dcb_apply(p["dcb"], x)
    return depth_to_space(conv_apply(p["subpel"], out), 2)
