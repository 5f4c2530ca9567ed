"""NN building blocks, functional style (params pytree + pure apply fns).

TPU re-design of the reference block set (reference: src/layers/layers.py):
WSiLU, WSiLUChunkAdd, SubpelConv2x, DepthConvBlock,
ResidualBlockWithStride2, ResidualBlockUpsample.

Design choices (TPU-first):
  * NHWC layout; 1x1 convs lower to MXU matmuls, the 3x3 depthwise conv
    uses feature_group_count (VPU-friendly); XLA fuses the elementwise
    chains that the reference hand-fused in CUDA (impl.cpp:53-97).
  * Pure functions over a params dict — trivially jit/vmap/pjit-able and
    the checkpoint mapping is explicit.
  * Explicit conv padding tuples reproduce torch's conv arithmetic exactly
    (torch 'padding=1' != XLA 'SAME' for stride 2).
  * The reference's runtime weight-fusion tricks (adaptor folded into
    conv1, bias folded into depthwise bias; impl.cpp:18-44) are NOT
    replicated: they exist to cut CUDA kernel launches, which have no
    analogue under XLA — the adaptor and dc1 matmuls read the same
    operand from the same fusion and launch overhead is zero.  Keeping
    the reference's parameter layout keeps checkpoint porting 1:1.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# conv
# ---------------------------------------------------------------------------

def conv_init(key, in_ch, out_ch, ksize=1, groups=1):
    """Conv params {w:(kh,kw,in/groups,out), b:(out,)}; torch-default
    uniform init (kaiming_uniform a=sqrt(5) reduces to U(+-1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    fan_in = (in_ch // groups) * ksize * ksize
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (ksize, ksize, in_ch // groups, out_ch),
                           minval=-bound, maxval=bound, dtype=jnp.float32)
    b = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return {"w": w, "b": b}


def conv_transpose2x_apply(p, x, torch_padding=None):
    """Transpose conv matching torch ConvTranspose2d(k, s=2, p,
    output_padding=1): exact 2x upsample.  Implemented as an input-dilated
    conv with pads (k-1-p, k-p); the kernel orientation is a free
    convention since weights are trained in this framework."""
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    tp = torch_padding if torch_padding is not None else (k - 1) // 2
    lo = k - 1 - tp
    hi = k - tp  # = k - 1 - tp + output_padding(1)
    out = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
        lhs_dilation=(2, 2), dimension_numbers=_DIMNUMS,
        precision=lax.Precision.HIGHEST)
    return out + p["b"].astype(x.dtype)


def conv_apply(p, x, stride=1, padding=0, groups=1):
    """2D conv, NHWC, explicit symmetric padding (torch semantics)."""
    pad = ((padding, padding), (padding, padding))
    w = p["w"].astype(x.dtype)
    # Full input-dtype accumulation: fp32 runs must be exactly reproducible
    # between the encode and decode graphs (stream correctness), so never
    # let the backend silently drop conv inputs to bf16.
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=_DIMNUMS, feature_group_count=groups,
        precision=lax.Precision.HIGHEST)
    return out + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# activations (layers.py:11-26)
# ---------------------------------------------------------------------------

def wsilu(x):
    """WSiLU(x) = x * sigmoid(4x)."""
    return x * jax.nn.sigmoid(4.0 * x)


def wsilu_chunk_add(x):
    """WSiLU then sum of the two channel halves."""
    y = wsilu(x)
    c = y.shape[-1]
    return y[..., : c // 2] + y[..., c // 2:]


# ---------------------------------------------------------------------------
# SubpelConv2x (layers.py:29-62): conv -> PixelShuffle(2)
# ---------------------------------------------------------------------------

def subpel_conv2x_init(key, in_ch, out_ch, ksize):
    return {"conv": conv_init(key, in_ch, out_ch * 4, ksize)}


def subpel_conv2x_apply(p, x, padding=0, to_cat=None, cat_at_front=True):
    # `padding` is static (part of the architecture, not the params pytree).
    from ..ops.fused import depth_to_space
    out = conv_apply(p["conv"], x, padding=padding)
    out = depth_to_space(out, 2)
    if to_cat is None:
        return out
    if cat_at_front:
        return jnp.concatenate((to_cat, out), axis=-1)
    return jnp.concatenate((out, to_cat), axis=-1)


# ---------------------------------------------------------------------------
# DepthConvBlock (layers.py:65-132)
#   [optional 1x1 adaptor] ; dc = [1x1, WSiLU, 3x3 dw, 1x1] + x ;
#   ffn = [1x1 -> 4C, WSiLUChunkAdd, 1x1] + out ; optional shortcut/quant/cat
# ---------------------------------------------------------------------------

def depth_conv_block_init(key, in_ch, out_ch, force_adaptor=False):
    keys = jax.random.split(key, 6)
    p = {}
    if in_ch != out_ch or force_adaptor:
        p["adaptor"] = conv_init(keys[0], in_ch, out_ch, 1)
    p["dc1"] = conv_init(keys[1], out_ch, out_ch, 1)
    p["dc_dw"] = conv_init(keys[2], out_ch, out_ch, 3, groups=out_ch)
    p["dc2"] = conv_init(keys[3], out_ch, out_ch, 1)
    p["ffn1"] = conv_init(keys[4], out_ch, out_ch * 4, 1)
    p["ffn2"] = conv_init(keys[5], out_ch * 2, out_ch, 1)
    return p


def depth_conv_block_apply(p, x, quant_step=None, to_cat=None,
                           cat_at_front=True, shortcut=False):
    # `shortcut` is static (architecture config, not a pytree leaf).
    if "adaptor" in p:
        x = conv_apply(p["adaptor"], x)
    c = x.shape[-1]
    h = conv_apply(p["dc1"], x)
    h = wsilu(h)
    h = conv_apply(p["dc_dw"], h, padding=1, groups=c)
    h = conv_apply(p["dc2"], h)
    out = h + x
    f = conv_apply(p["ffn1"], out)
    f = wsilu_chunk_add(f)
    f = conv_apply(p["ffn2"], f)
    out = f + out
    if shortcut:
        out = out + x
    if quant_step is not None:
        out = out * quant_step
    if to_cat is not None:
        if cat_at_front:
            out = jnp.concatenate((to_cat, out), axis=-1)
        else:
            out = jnp.concatenate((out, to_cat), axis=-1)
    return out


# ---------------------------------------------------------------------------
# Residual blocks (layers.py:135-156)
# ---------------------------------------------------------------------------

def res_block_stride2_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {"down": conv_init(k1, in_ch, out_ch, 2),
            "conv": depth_conv_block_init(k2, out_ch, out_ch)}


def res_block_stride2_apply(p, x):
    x = conv_apply(p["down"], x, stride=2, padding=0)
    return depth_conv_block_apply(p["conv"], x, shortcut=True)


def res_block_upsample_init(key, in_ch, out_ch):
    k1, k2 = jax.random.split(key)
    return {"up": subpel_conv2x_init(k1, in_ch, out_ch, 1),
            "conv": depth_conv_block_init(k2, out_ch, out_ch)}


def res_block_upsample_apply(p, x):
    x = subpel_conv2x_apply(p["up"], x)
    return depth_conv_block_apply(p["conv"], x, shortcut=True)


# ---------------------------------------------------------------------------
# sequential helper
# ---------------------------------------------------------------------------

def sequential_init(key, specs):
    """specs: list of (init_fn, args...) tuples; returns list of params."""
    keys = jax.random.split(key, len(specs))
    return [spec[0](k, *spec[1:]) for k, spec in zip(keys, specs)]


def sequential_apply(params, apply_fns, x):
    for p, fn in zip(params, apply_fns):
        x = fn(p, x)
    return x
