"""Pallas TPU kernels for the fused hot ops.

The reference hand-fuses its elementwise chains in CUDA (reference:
src/layers/extensions/inference/kernel.cu).  On TPU, XLA already fuses
elementwise chains; the ops worth real kernels are the ones XLA can't
fuse across: the WSiLU -> 3x3 depthwise conv inside every DepthConvBlock
(reference kernel.cu:1006 bias_wsilu_depthwise_conv2d).

wsilu_dwconv3x3: computes  dwconv3x3(wsilu(x)) + bias  in one VMEM pass,
tiled over H with a 1-row halo.  Channel-last layout keeps the C=128..368
axis on the 128-lane dimension of the VPU.

Every kernel has a pure-jnp reference path (used on CPU, in tests, and as
the fallback); `use_pallas()` gates dispatch.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import blocks as L


def use_pallas():
    # opt-in while the kernel is being perf-qualified against XLA's
    # depthwise conv on this hardware
    v = os.environ.get("OPENDCVC_TPU_PALLAS")
    return v is not None and v not in ("0", "false", "False")


# ---------------------------------------------------------------------------
# reference path
# ---------------------------------------------------------------------------

def wsilu_dwconv3x3_ref(x, w, b):
    """x: (1,H,W,C); w: (3,3,1,C) HWIO depthwise; b: (C,)."""
    return _dw_ref(L.wsilu(x), w, b)


def _dw_ref(h, w, b):
    from jax import lax
    c = h.shape[-1]
    out = lax.conv_general_dilated(
        h, w.astype(h.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=lax.Precision.HIGHEST)
    return out + b.astype(h.dtype)


# ---------------------------------------------------------------------------
# pallas kernel
# ---------------------------------------------------------------------------

def _kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *, tile_h, width):
    """x_hbm: full padded array in ANY/HBM; per-tile halo rows are DMA'd
    into VMEM scratch (tile_h+2, W+2, C).  w (9, C); b (1, C);
    out block (tile_h, W, C)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_h, tile_h + 2), :, :], scratch, sem)
    dma.start()
    dma.wait()

    x = scratch[...]
    a = x * jax.nn.sigmoid(4.0 * x)  # WSiLU once over the halo block
    af = a.astype(jnp.float32)
    acc = jnp.broadcast_to(b_ref[0, :].astype(jnp.float32)[None, None, :],
                           (tile_h, width, af.shape[-1])).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = af[dy:dy + tile_h, dx:dx + width, :]
            k = w_ref[dy * 3 + dx, :].astype(jnp.float32)[None, None, :]
            acc = acc + win * k
    o_ref[...] = acc.astype(o_ref.dtype)


def _round_up(v, m):
    return (v + m - 1) // m * m


def wsilu_dwconv3x3_pallas(x, w, b, tile_h=8):
    """Fused WSiLU + depthwise 3x3 + bias, Pallas TPU path.

    Alignment: W and C sit on the (sublane, lane) dims, so both the
    output width and the haloed input width are padded to multiples of 8
    (zero padding is inert: wsilu(0)=0 and padded outputs are cropped).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, wd, c = x.shape
    assert n == 1, "batch handled by vmap"
    n_tiles = -(-h // tile_h)
    pad_h = n_tiles * tile_h - h
    w_out = _round_up(wd, 8)
    w_in = w_out + 8  # >= w_out + 2, multiple of 8
    xp = jnp.pad(x[0], ((1, 1 + pad_h), (1, w_in - wd - 1), (0, 0)))
    w9 = w.reshape(9, c)
    b2 = b.reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=w_out),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_h, w_out, c),
                                       x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, w_out, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w_in, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w9, b2)
    return out[None, :h, :wd]


def wsilu_dwconv3x3(x, w, b):
    """Dispatching entry: Pallas on TPU, jnp elsewhere."""
    if use_pallas():
        try:
            return wsilu_dwconv3x3_pallas(x, w, b)
        except Exception:
            pass
    return wsilu_dwconv3x3_ref(x, w, b)
