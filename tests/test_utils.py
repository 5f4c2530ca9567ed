"""Transforms, metrics, IO, checkpointing."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.utils import transforms as T
from opendcvc_tpu.utils import metrics as M
from opendcvc_tpu.utils.io import PNGReader, PNGWriter, YUV420Reader, \
    YUV420Writer
from opendcvc_tpu.utils import checkpoint as ckpt


def test_rgb_ycbcr_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    ycbcr = T.rgb2ycbcr(rgb)
    back = T.ycbcr2rgb(ycbcr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def test_rgb2ycbcr_matches_reference_weights():
    # pure red through BT.709
    rgb = jnp.zeros((1, 2, 2, 3)).at[..., 0].set(1.0)
    y = np.asarray(T.rgb2ycbcr(rgb))[0, 0, 0]
    np.testing.assert_allclose(y[0], 0.2126, atol=1e-6)


def test_yuv420_444_conversions():
    rng = np.random.default_rng(1)
    y = rng.random((1, 8, 8)).astype(np.float32)
    uv = rng.random((2, 4, 4)).astype(np.float32)
    yuv = T.ycbcr420_to_444_np(y, uv)
    assert yuv.shape == (3, 8, 8)
    # nearest-neighbor upsample: each uv sample repeated 2x2
    np.testing.assert_allclose(yuv[1, 0, 0], uv[0, 0, 0])
    np.testing.assert_allclose(yuv[1, 1, 1], uv[0, 0, 0])

    x = jnp.asarray(yuv.transpose(1, 2, 0)[None])
    y2, uv2 = T.yuv_444_to_420(x)
    assert y2.shape == (1, 8, 8, 1)
    assert uv2.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(y2)[0, :, :, 0], y[0], atol=1e-6)


def test_psnr():
    a = np.zeros((32, 32))
    assert M.calc_psnr(a, a) == 99.9
    b = np.ones((32, 32)) * 10
    expected = 10 * np.log10(255 ** 2 / 100)
    np.testing.assert_allclose(M.calc_psnr(a, b), expected, rtol=1e-6)


def test_msssim_identical_is_one():
    rng = np.random.default_rng(2)
    img = rng.random((96, 96)) * 255
    val = M.calc_msssim(img, img)
    np.testing.assert_allclose(val, 1.0, atol=1e-9)


def test_png_io_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (3, 16, 24)).astype(np.uint8)
              for _ in range(3)]
    w = PNGWriter(str(tmp_path), 24, 16)
    for f in frames:
        w.write_one_frame(f)
    w.close()
    r = PNGReader(str(tmp_path), 24, 16)
    for f in frames:
        got = r.read_one_frame()
        np.testing.assert_array_equal(got, f)
    r.close()


def test_yuv_io_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    path = str(tmp_path / "test.yuv")
    ys = [rng.integers(0, 256, (1, 8, 8)).astype(np.uint8) for _ in range(2)]
    uvs = [rng.integers(0, 256, (2, 4, 4)).astype(np.uint8)
           for _ in range(2)]
    w = YUV420Writer(path, 8, 8)
    for y, uv in zip(ys, uvs):
        w.write_one_frame(y, uv)
    w.close()
    r = YUV420Reader(path, 8, 8)
    for y, uv in zip(ys, uvs):
        y2, uv2 = r.read_one_frame()
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(uv2, uv)
    r.close()


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "nested": {"b": jnp.ones((4,))},
              "lst": [jnp.zeros((2,)), jnp.ones((2,))]}
    path = str(tmp_path / "ckpt.msgpack")
    ckpt.save_params(path, params, extra={"step": np.int64(7)})
    loaded = ckpt.load_params(path)
    np.testing.assert_array_equal(loaded["a"], np.asarray(params["a"]))
    np.testing.assert_array_equal(loaded["nested"]["b"], np.ones((4,)))
    payload = ckpt.load_checkpoint(path)
    assert int(payload["extra"]["step"]) == 7
