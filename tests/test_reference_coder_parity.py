"""Cross-validation of the native rANS runtime against the REFERENCE's
own C++ coder (reference src/cpp/py_rans/, built here with the pybind11
headers torch bundles).

This converts "format-faithful by construction" into "proven": identical
(CDF, symbol) inputs must yield byte-identical streams in both single-
and dual-coder modes, in both directions (our decoder reads the
reference's bytes and vice versa), and the CDF quantizer (frequency
stealing included, reference py_rans.cpp:307-364) must match exactly.
"""

import hashlib
import pathlib
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

from opendcvc_tpu.entropy.cdf import pmf_to_quantized_cdf
from opendcvc_tpu.entropy.rans import RansDecoder, RansEncoder

REF_SRC = pathlib.Path("/root/reference/src/cpp/py_rans")


def _build_reference_module():
    """Compile the reference coder into a /tmp cache keyed by source
    hash and return the imported module (None if unbuildable)."""
    if not REF_SRC.is_dir():
        return None
    srcs = sorted(REF_SRC.glob("*.cpp"))
    hdrs = sorted(REF_SRC.glob("*.h"))
    tag = hashlib.sha256(
        b"".join(p.read_bytes() for p in srcs + hdrs)).hexdigest()[:16]
    build_dir = pathlib.Path("/tmp/opendcvc_ref_rans") / tag
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    so = build_dir / f"MLCodec_extensions_cpp{suffix}"
    if not so.exists():
        build_dir.mkdir(parents=True, exist_ok=True)
        py_inc = sysconfig.get_paths()["include"]
        pb_inc = None
        try:
            import torch
            cand = (pathlib.Path(torch.__file__).parent / "include")
            if (cand / "pybind11" / "pybind11.h").exists():
                pb_inc = str(cand)
        except Exception:
            pass
        if pb_inc is None:
            return None
        cmd = ["g++", "-std=c++17", "-O2", "-fPIC", "-shared",
               f"-I{py_inc}", f"-I{pb_inc}",
               *[str(s) for s in srcs], "-o", str(so)]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            return None
    sys.path.insert(0, str(build_dir))
    try:
        import MLCodec_extensions_cpp as mod
        return mod
    except Exception:
        return None
    finally:
        sys.path.remove(str(build_dir))


_REF = _build_reference_module()
pytestmark = pytest.mark.skipif(
    _REF is None, reason="reference py_rans module unbuildable here")


def _gaussian_cdf_table(n_cdf, rng, max_center=10):
    """CDF table shaped like the codec's (rows padded to max length)."""
    rows, sizes, offsets = [], [], []
    max_len = 2 * max_center + 3
    for _ in range(n_cdf):
        center = int(rng.integers(1, max_center + 1))
        x = np.arange(2 * center + 1) - center
        sigma = float(rng.uniform(0.2, 6.0))
        pmf = np.exp(-0.5 * (x / sigma) ** 2)
        pmf = pmf / pmf.sum() * float(rng.uniform(0.97, 0.9999))
        full = np.concatenate([pmf, [1.0 - pmf.sum()]])
        cdf = pmf_to_quantized_cdf(full)
        row = np.zeros(max_len + 1, dtype=np.int32)
        row[: cdf.size] = cdf
        rows.append(row)
        sizes.append(cdf.size)
        offsets.append(-center)
    return (np.stack(rows), np.asarray(sizes, np.int32),
            np.asarray(offsets, np.int32))


def test_pmf_quantizer_matches_reference():
    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(2, 64))
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        ours = pmf_to_quantized_cdf(pmf)
        theirs = np.asarray(_REF.pmf_to_quantized_cdf(pmf.tolist(), 16),
                            dtype=np.int64)
        np.testing.assert_array_equal(np.asarray(ours, np.int64), theirs)


def _symbols(rng, table, n_y=4000, n_z_per_ch=37, escape_frac=0.02):
    """Distribution-matched symbols (like real codec output) plus a
    small escape fraction.  The reference's flush() sizes its
    back-to-front output buffer at exactly 1 byte/symbol
    (rans.cpp:221, '// too much space ?'), so adversarial
    high-entropy/escape-heavy input overflows ITS heap — real latents
    never do, and parity only makes sense on inputs the reference
    itself handles."""
    cdfs, sizes, offsets = table
    n_cdf = len(sizes)
    y_idx = rng.integers(0, n_cdf, n_y).astype(np.uint8)
    y_sym = np.empty(n_y, np.int16)
    for i in range(n_y):
        r = y_idx[i]
        freqs = np.diff(cdfs[r, : sizes[r]])[:-1]  # drop tail bin
        if rng.random() < escape_frac:
            y_sym[i] = offsets[r] + len(freqs) + int(rng.integers(1, 40))
        else:
            y_sym[i] = offsets[r] + rng.choice(len(freqs),
                                               p=freqs / freqs.sum())
    packed = ((y_sym << 8) | y_idx.astype(np.int16)).astype(np.int16)
    n_z = n_cdf * n_z_per_ch
    z_sym = np.empty(n_z, np.int8)
    for i in range(n_z):
        r = i // n_z_per_ch
        freqs = np.diff(cdfs[r, : sizes[r]])[:-1]
        z_sym[i] = offsets[r] + rng.choice(len(freqs),
                                           p=freqs / freqs.sum())
    return y_idx, y_sym, packed, z_sym, n_z_per_ch


def _ref_encode(cdfs, sizes, offsets, packed, z_sym, per_ch, use_two):
    enc = _REF.RansEncoder()
    enc.add_cdf(cdfs, sizes, offsets)
    enc.set_use_two_encoders(use_two)
    enc.reset()
    enc.encode_z(z_sym, 0, 0, per_ch)
    enc.encode_y(packed, 0)
    enc.flush()
    return np.asarray(enc.get_encoded_stream(), np.uint8).tobytes()


def _our_encode(cdfs, sizes, offsets, packed, z_sym, per_ch, use_two):
    enc = RansEncoder()
    enc.add_cdf(cdfs, sizes, offsets)
    enc.set_use_two_encoders(use_two)
    enc.reset()
    enc.encode_z(z_sym, 0, 0, per_ch)
    enc.encode_y(packed, 0)
    enc.flush()
    return enc.get_encoded_stream()


@pytest.mark.parametrize("use_two", [False, True])
def test_streams_byte_identical(use_two):
    rng = np.random.default_rng(5)
    cdfs, sizes, offsets = _gaussian_cdf_table(16, rng)
    y_idx, y_sym, packed, z_sym, per_ch = _symbols(rng, (cdfs, sizes, offsets))
    ref_stream = _ref_encode(cdfs, sizes, offsets, packed, z_sym, per_ch,
                             use_two)
    our_stream = _our_encode(cdfs, sizes, offsets, packed, z_sym, per_ch,
                             use_two)
    assert ref_stream == our_stream


@pytest.mark.parametrize("use_two", [False, True])
def test_our_decoder_reads_reference_stream(use_two):
    rng = np.random.default_rng(6)
    cdfs, sizes, offsets = _gaussian_cdf_table(12, rng)
    y_idx, y_sym, packed, z_sym, per_ch = _symbols(rng, (cdfs, sizes, offsets))
    stream = _ref_encode(cdfs, sizes, offsets, packed, z_sym, per_ch,
                         use_two)

    dec = RansDecoder()
    dec.add_cdf(cdfs, sizes, offsets, build_lut=True)
    dec.set_use_two_decoders(use_two)
    dec.set_stream(stream)
    dec.decode_z(z_sym.size, 0, 0, per_ch)
    np.testing.assert_array_equal(dec.get_decoded_tensor(), z_sym)
    dec.decode_y(y_idx, 0)
    got = dec.get_decoded_tensor().astype(np.int16)
    np.testing.assert_array_equal(got, y_sym)


@pytest.mark.parametrize("use_two", [False, True])
def test_reference_decoder_reads_our_stream(use_two):
    rng = np.random.default_rng(7)
    cdfs, sizes, offsets = _gaussian_cdf_table(12, rng)
    y_idx, y_sym, packed, z_sym, per_ch = _symbols(rng, (cdfs, sizes, offsets))
    stream = _our_encode(cdfs, sizes, offsets, packed, z_sym, per_ch,
                         use_two)

    dec = _REF.RansDecoder()
    dec.add_cdf(cdfs, sizes, offsets)
    dec.set_use_two_decoders(use_two)
    dec.set_stream(np.frombuffer(stream, np.uint8))
    dec.decode_z(z_sym.size, 0, 0, per_ch)
    np.testing.assert_array_equal(
        np.asarray(dec.get_decoded_tensor(), np.int8), z_sym)
    dec.decode_y(y_idx, 0)
    got = np.asarray(dec.get_decoded_tensor(), np.int8).astype(np.int16)
    np.testing.assert_array_equal(got, y_sym)
