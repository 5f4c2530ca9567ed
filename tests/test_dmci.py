"""DMCI image codec: bitstream roundtrip exactness with random weights."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmci import DMCI


@pytest.fixture(scope="module")
def codec():
    m = DMCI()
    m.init_params(seed=0)
    m.update()
    return m


def _sps(h, w, ec_part=0):
    return {"sps_id": 0, "height": h, "width": w, "ec_part": ec_part,
            "use_ada_i": 0}


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_roundtrip_exact(codec, hw):
    h, w = hw
    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    enc = codec.compress(jnp.asarray(x), qp=32)
    assert len(enc["bit_stream"]) > 0
    dec = codec.decompress(enc["bit_stream"], _sps(h, w), qp=32)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_roundtrip_two_coders(codec):
    h, w = 64, 64
    rng = np.random.default_rng(1)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    codec.set_use_two_entropy_coders(True)
    enc = codec.compress(jnp.asarray(x), qp=10)
    dec = codec.decompress(enc["bit_stream"], _sps(h, w, ec_part=1), qp=10)
    codec.set_use_two_entropy_coders(False)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_roundtrip_skip_mode():
    m = DMCI()
    m.init_params(seed=2)
    m.update(force_zero_thres=0.15)
    h, w = 64, 64
    rng = np.random.default_rng(2)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    enc = m.compress(jnp.asarray(x), qp=32)
    dec = m.decompress(enc["bit_stream"], _sps(h, w), qp=32)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_different_qp_changes_stream(codec):
    h, w = 64, 64
    rng = np.random.default_rng(3)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    s1 = codec.compress(jnp.asarray(x), qp=0)["bit_stream"]
    s2 = codec.compress(jnp.asarray(x), qp=63)["bit_stream"]
    assert s1 != s2
