"""Entropy-coding runtime tests: native C++ vs pure-Python golden model,
roundtrips, dual-coder packing, CDF quantization invariants."""

import numpy as np
import pytest

from opendcvc_tpu.entropy.cdf import pmf_to_quantized_cdf, pmf_to_cdf
from opendcvc_tpu.entropy import rans_py
from opendcvc_tpu.entropy.rans import RansEncoder, RansDecoder
from opendcvc_tpu.native.build import library_available


def make_gaussian_cdfs(n_cdf, rng, max_center=8):
    """Small synthetic CDF table shaped like the codec's tables."""
    rows = []
    sizes = []
    offsets = []
    max_len = 2 * max_center + 1 + 2
    for i in range(n_cdf):
        center = int(rng.integers(1, max_center + 1))
        length = 2 * center + 1
        x = np.arange(length) - center
        sigma = float(rng.uniform(0.3, 5.0))
        pmf = np.exp(-0.5 * (x / sigma) ** 2)
        pmf = pmf / pmf.sum() * 0.999
        tail = 1.0 - pmf.sum()
        cdf = pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]))
        row = np.zeros(max_len + 1, dtype=np.int32)
        row[: cdf.size] = cdf
        rows.append(row)
        sizes.append(cdf.size)
        offsets.append(-center)
    return (np.stack(rows), np.array(sizes, dtype=np.int32),
            np.array(offsets, dtype=np.int32))


def test_pmf_to_quantized_cdf_invariants():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(2, 40))
        pmf = rng.random(n)
        pmf = pmf / pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)


def test_pmf_to_cdf_table():
    rng = np.random.default_rng(1)
    pmf = rng.random((4, 10))
    pmf /= pmf.sum(axis=1, keepdims=True) * 1.02
    tail = 1.0 - pmf.sum(axis=1, keepdims=True)
    lengths = np.array([10, 8, 6, 10])
    for i, ln in enumerate(lengths):
        pmf[i, ln:] = 0
    tail = 1.0 - pmf.sum(axis=1, keepdims=True)
    cdf = pmf_to_cdf(pmf, tail, lengths, 10)
    assert cdf.shape == (4, 12)
    for i, ln in enumerate(lengths):
        assert cdf[i, ln + 1] == 1 << 16


def _roundtrip(enc_cls, dec_cls, use_two, interleaved, seed=3):
    rng = np.random.default_rng(seed)
    cdfs, sizes, offsets = make_gaussian_cdfs(16, rng)

    enc = enc_cls()
    dec = dec_cls()
    g_e = enc.add_cdf(cdfs, sizes, offsets)
    g_d = dec.add_cdf(cdfs, sizes, offsets, build_lut=True)
    assert g_e == g_d == 0

    enc.set_use_two_encoders(use_two) if hasattr(enc, "set_use_two_encoders") \
        else enc.set_two(use_two)

    # y symbols: values in a range that exercises both in-range and escapes
    n_y = 1000
    y_idx = rng.integers(0, 16, n_y).astype(np.uint8)
    y_sym = rng.integers(-20, 21, n_y).astype(np.int16)
    packed = ((y_sym << 8) | y_idx.astype(np.int16)).astype(np.int16)

    # z symbols with per-channel cdf selection
    per_channel = 25
    n_z = 16 * per_channel
    z_sym = rng.integers(-6, 7, n_z).astype(np.int8)

    if hasattr(enc, "encode_y"):
        enc.reset()
        enc.encode_z(z_sym, 0, 0, per_channel if not interleaved else 16,
                     interleaved)
        enc.encode_y(packed, 0)
        enc.flush()
        stream = enc.get_encoded_stream() if hasattr(enc, "get_encoded_stream") \
            else enc.get_stream()

    dec.set_use_two_decoders(use_two) if hasattr(dec, "set_use_two_decoders") \
        else dec.set_two(use_two)
    dec.set_stream(stream)
    dec.decode_z(n_z, 0, 0, per_channel if not interleaved else 16,
                 interleaved)
    z_dec = dec.get_decoded_tensor() if hasattr(dec, "get_decoded_tensor") \
        else dec.get_decoded()
    np.testing.assert_array_equal(np.asarray(z_dec, dtype=np.int8), z_sym)

    dec.decode_y(y_idx, 0)
    y_dec = dec.get_decoded_tensor() if hasattr(dec, "get_decoded_tensor") \
        else dec.get_decoded()
    np.testing.assert_array_equal(np.asarray(y_dec, dtype=np.int16), y_sym)
    return stream


@pytest.mark.parametrize("use_two", [False, True])
@pytest.mark.parametrize("interleaved", [False, True])
def test_roundtrip_python(use_two, interleaved):
    _roundtrip(rans_py.PyEncoderPair, rans_py.PyDecoderPair, use_two,
               interleaved)


@pytest.mark.skipif(not library_available(), reason="native lib unavailable")
@pytest.mark.parametrize("use_two", [False, True])
@pytest.mark.parametrize("interleaved", [False, True])
def test_roundtrip_native(use_two, interleaved):
    _roundtrip(RansEncoder, RansDecoder, use_two, interleaved)


@pytest.mark.skipif(not library_available(), reason="native lib unavailable")
@pytest.mark.parametrize("use_two", [False, True])
def test_native_matches_python_stream(use_two):
    """The native and pure-Python encoders must emit identical bytes."""
    s_py = _roundtrip(rans_py.PyEncoderPair, rans_py.PyDecoderPair, use_two,
                      False, seed=7)
    s_nat = _roundtrip(RansEncoder, RansDecoder, use_two, False, seed=7)
    assert s_py == s_nat


@pytest.mark.skipif(not library_available(), reason="native lib unavailable")
def test_cross_decode():
    """Streams encoded natively decode with the Python decoder and
    vice versa."""
    rng = np.random.default_rng(11)
    cdfs, sizes, offsets = make_gaussian_cdfs(8, rng)
    sym = rng.integers(-10, 11, 500).astype(np.int16)
    idx = rng.integers(0, 8, 500).astype(np.uint8)
    packed = ((sym << 8) | idx.astype(np.int16)).astype(np.int16)

    enc = RansEncoder()
    enc.add_cdf(cdfs, sizes, offsets)
    enc.reset()
    enc.encode_y(packed, 0)
    enc.flush()
    stream = enc.get_encoded_stream()

    dec = rans_py.PyDecoderPair()
    dec.add_cdf(cdfs, sizes, offsets)
    dec.set_stream(stream)
    dec.decode_y(idx, 0)
    np.testing.assert_array_equal(dec.get_decoded().astype(np.int16), sym)
