"""Pallas rANS kernels vs the XLA scans in INTERPRET mode (CPU).

Mosaic has no CPU lowering, so the on-hardware gate
(OPENDCVC_TPU_TEST_PLATFORM=tpu tests/test_pallas_rans.py) is the
qualification run — but interpret mode executes the same kernel logic
on any backend, letting the fast CPU gate catch regressions in the
kernel math (packing, SKIP_ROW passthrough, carry semantics)
immediately instead of only when a device is attached.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

@pytest.fixture(autouse=True)
def _interpret_mode():
    """Per-test (not import-time): other modules save/restore this env
    var around their own Pallas runs, which would otherwise clobber an
    import-time setting depending on execution order."""
    prev = os.environ.get("OPENDCVC_TPU_PALLAS_INTERPRET")
    os.environ["OPENDCVC_TPU_PALLAS_INTERPRET"] = "1"
    yield
    if prev is None:
        os.environ.pop("OPENDCVC_TPU_PALLAS_INTERPRET", None)
    else:
        os.environ["OPENDCVC_TPU_PALLAS_INTERPRET"] = prev


L, K, NR, MW = 128, 40, 24, 96


def _valid_cum_hl(rng, nr):
    rows = []
    for _ in range(nr):
        freqs = rng.integers(1, 600, 256).astype(np.int64)
        freqs = freqs * (65536 - 256) // freqs.sum() + 1
        freqs[0] += 65536 - freqs.sum()
        cum = np.concatenate([[0], np.cumsum(freqs)])
        rows.append(cum)
    t = np.stack(rows)
    hi = (t // 256).astype(np.float32)
    lo = (t % 256).astype(np.float32)
    return jnp.asarray(np.concatenate([hi, lo], 1), jnp.bfloat16)


@pytest.fixture(scope="module", params=["plain", "skip"])
def payload(request):
    from opendcvc_tpu.entropy.device_rans import SKIP_ROW
    rng = np.random.default_rng(3)
    cum_hl = _valid_cum_hl(rng, NR)
    sym = rng.integers(-128, 128, (L, K)).astype(np.int32)
    rows = rng.integers(0, NR, (L, K)).astype(np.int32)
    if request.param == "skip":
        # ~60% skip slots, zero symbols — the compacted-tail shape
        skip = rng.random((L, K)) < 0.6
        rows = np.where(skip, SKIP_ROW, rows)
        sym = np.where(skip, 0, sym)
    return cum_hl, jnp.asarray(sym), jnp.asarray(rows)


def test_sentinel_constants_agree():
    from opendcvc_tpu.entropy.device_rans import SKIP_ROW as s_ref
    from opendcvc_tpu.ops.pallas_rans import SKIP_ROW as s_krn
    assert s_ref == s_krn


def test_encode_interpret_bit_identical(payload):
    from opendcvc_tpu.entropy.device_rans import _encode_scan
    from opendcvc_tpu.ops.pallas_rans import encode_scan_pallas
    cum_hl, sym, rows = payload
    buf_x, lens_x, st_x = _encode_scan(sym, rows, cum_hl, MW)
    buf_p, lens_p, st_p = encode_scan_pallas(sym.T, rows.T, cum_hl, MW)
    np.testing.assert_array_equal(np.asarray(lens_x), np.asarray(lens_p))
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_array_equal(np.asarray(buf_x), np.asarray(buf_p))


def test_decode_interpret_bit_identical_and_roundtrip(payload):
    from opendcvc_tpu.entropy.device_rans import (_encode_scan,
                                                  _decode_scan_carry,
                                                  SKIP_ROW)
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
    # roundtrip: skipped slots decode as 0, coded slots as themselves
    expect = np.where(np.asarray(rows_dec) == SKIP_ROW, 0,
                      np.asarray(sym[:, ::-1]))
    np.testing.assert_array_equal(np.asarray(syms_p.T), expect)
