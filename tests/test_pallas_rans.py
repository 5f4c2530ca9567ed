"""Pallas rANS kernels vs the XLA lax.scan reference paths.

The kernels must be BIT-IDENTICAL to device_rans' scans (same staging
buffer, lens, and final states) — that is what lets the megastage flip
between them freely.  Runs only where a TPU backend is available
(Mosaic has no CPU lowering); the XLA paths themselves are covered by
the device-EC roundtrip tests on every platform.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU kernels need a TPU backend")

# MW covers the worst case (one u16 word per symbol + flush slack):
# uniform full-range symbols against skewed tables code ~1 word/symbol
L, K, NR, MW = 512, 96, 40, 104


def _valid_cum_hl(rng, nr):
    """Strictly-increasing cumulative rows (freq >= 1 everywhere),
    hi/lo bf16 split in device_rans layout."""
    rows = []
    for _ in range(nr):
        freqs = rng.integers(1, 600, 256).astype(np.int64)
        freqs = freqs * (65536 - 256) // freqs.sum() + 1  # each >= 1
        freqs[0] += 65536 - freqs.sum()  # deficit is non-negative
        assert freqs.min() >= 1 and freqs.sum() == 65536
        cum = np.concatenate([[0], np.cumsum(freqs)])
        rows.append(cum)
    t = np.stack(rows)
    hi = (t // 256).astype(np.float32)
    lo = (t % 256).astype(np.float32)
    return jnp.asarray(np.concatenate([hi, lo], 1), jnp.bfloat16)


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(0)
    cum_hl = _valid_cum_hl(rng, NR)
    sym = jnp.asarray(rng.integers(-128, 128, (L, K)), jnp.int32)
    rows = jnp.asarray(rng.integers(0, NR, (L, K)), jnp.int32)
    return cum_hl, sym, rows


def test_encode_kernel_bit_identical(payload):
    from opendcvc_tpu.entropy.device_rans import _encode_scan
    from opendcvc_tpu.ops.pallas_rans import encode_scan_pallas
    cum_hl, sym, rows = payload
    buf_x, lens_x, st_x = _encode_scan(sym, rows, cum_hl, MW)
    buf_p, lens_p, st_p = encode_scan_pallas(sym.T, rows.T, cum_hl, MW)
    np.testing.assert_array_equal(np.asarray(lens_x), np.asarray(lens_p))
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_array_equal(np.asarray(buf_x), np.asarray(buf_p))


def test_decode_kernel_bit_identical_and_roundtrip(payload):
    from opendcvc_tpu.entropy.device_rans import (_encode_scan,
                                                  _decode_scan_carry)
    from opendcvc_tpu.ops.pallas_rans import decode_scan_pallas
    cum_hl, sym, rows = payload
    buf, lens, states = _encode_scan(sym, rows, cum_hl, MW)

    bufn = np.asarray(buf).astype(np.int32)
    ln = np.asarray(lens)
    data = np.zeros((L, MW), np.int32)
    for lane in range(L):
        k = int(ln[lane])
        data[lane, :k] = bufn[lane, :k][::-1]
    data_j = jnp.asarray(data)
    rows_dec = rows[:, ::-1]

    carry0 = (jnp.asarray(np.asarray(states), jnp.uint32),
              jnp.zeros((L,), jnp.int32))
    syms_x, carry_x = _decode_scan_carry(data_j, rows_dec, cum_hl,
                                         carry0)
    syms_p, st_p, ptr_p = decode_scan_pallas(
        data_j, rows_dec.T, K, cum_hl, carry0[0], carry0[1])
    np.testing.assert_array_equal(np.asarray(syms_x),
                                  np.asarray(syms_p.T))
    np.testing.assert_array_equal(np.asarray(carry_x[0]),
                                  np.asarray(st_p))
    np.testing.assert_array_equal(np.asarray(carry_x[1]),
                                  np.asarray(ptr_p))
    # true roundtrip: decode(encode(sym)) == sym
    np.testing.assert_array_equal(np.asarray(syms_p.T),
                                  np.asarray(sym[:, ::-1]))
