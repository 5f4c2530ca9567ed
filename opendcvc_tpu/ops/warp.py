"""Motion warping ops.

TPU re-design of the reference motion-compensation path (reference:
DCVC-family/DCVC-FM/src/models/block_mc.py: grid_sample fallback and the
block_mc CUDA kernel — a clamped bilinear warp with border padding,
align_corners=True).  Implemented as a gather-based bilinear sample in
pure JAX (XLA lowers the gathers well on TPU); flows are NHWC with 2
channels (dx, dy) in pixel units.
"""

import jax
import jax.numpy as jnp


def flow_warp(im, flow):
    """Bilinear backward warp with border clamping.

    im:   (B, H, W, C)
    flow: (B, H, W, 2) — (dx, dy) pixel offsets; sample position is
          (x + dx, y + dy), clamped to the image border.
    """
    b, h, w, c = im.shape
    orig_dtype = im.dtype
    imf = im.astype(jnp.float32)
    fl = flow.astype(jnp.float32)

    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    sx = jnp.clip(xs + fl[..., 0], 0.0, w - 1.0)
    sy = jnp.clip(ys + fl[..., 1], 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def gather(yy, xx):
        flat = imf.reshape(b, h * w, c)
        idx = yy * w + xx  # (B, H, W)
        return jnp.take_along_axis(flat, idx.reshape(b, h * w, 1),
                                   axis=1).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.astype(orig_dtype)


def bilinear_resize_2x(x, up=True):
    """Bilinear x2 up/down with half-pixel centers (align_corners=False,
    the reference's F.interpolate convention).

    Downsampling: torch's bilinear downscale-by-2 samples output pixel i
    at input position 2i + 0.5, i.e. the plain mean of each 2x2 block —
    NOT an anti-aliased resize (jax.image.resize widens the kernel when
    downscaling, which diverges from the reference)."""
    b, h, w, c = x.shape
    if up:
        return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
