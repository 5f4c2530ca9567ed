"""EVC image codec: bitstream roundtrip, variants, scalable encoder."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.evc import EVC, EVC_SS, ScalableEVC
from opendcvc_tpu.utils.stream_helper import (encode_i, decode_i,
                                              get_rounded_q,
                                              interpolate_log)


@pytest.fixture(scope="module")
def codec():
    m = EVC_SS()
    m.init_params(seed=0)
    m.update()
    return m


def test_roundtrip_exact(codec):
    h, w = 64, 64
    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    q_scale, q_index = get_rounded_q(1.2)
    enc = codec.compress(jnp.asarray(x), q_scale)
    assert len(enc["bit_stream"]) > 0
    dec = codec.decompress(enc["bit_stream"], h, w, q_index / 100)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_stream_container(tmp_path, codec):
    h, w = 64, 64
    rng = np.random.default_rng(1)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    q_scale, q_index = get_rounded_q(0.8)
    enc = codec.compress(jnp.asarray(x), q_scale)
    path = str(tmp_path / "img.bin")
    encode_i(h, w, q_index, enc["bit_stream"], path)
    h2, w2, qi2, stream = decode_i(path)
    assert (h2, w2, qi2) == (h, w, q_index)
    dec = codec.decompress(stream, h2, w2, qi2 / 100)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


def test_rate_ladder():
    vals = interpolate_log(0.5, 2.0, 4)
    assert len(vals) == 4
    assert vals[0] == pytest.approx(2.0)
    assert vals[-1] == pytest.approx(0.5)


def test_scalable_encoder():
    m = ScalableEVC(enc_num=2)
    m.init_params(seed=3)
    m.update()
    h, w = 64, 64
    rng = np.random.default_rng(4)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    streams = []
    for rate in range(2):
        m.set_rate(rate)
        enc = m.compress(jnp.asarray(x), 1.0)
        dec = m.decompress(enc["bit_stream"], h, w, 1.0)
        np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                      np.asarray(dec["x_hat"]))
        streams.append(enc["bit_stream"])
    assert streams[0] != streams[1]
