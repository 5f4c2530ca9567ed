#!/usr/bin/env python3
"""Measure rANS encode/decode scan variants standalone on the TPU.

v0: current in-scan (row,sym)->(start,freq) one-hot lookup per step
v1: batched precompute of (start,freq) via one big one-hot matmul
    (the pair depends only on (row, symbol), both known pre-scan),
    then a lean scan that only updates state/cursor/buf
v2: precompute via jnp.take gather (XLA native gather path)
vl: the lean scan alone (floor)

Decode variants:
d0: current (row fetch + masked stack search per step)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import opendcvc_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from opendcvc_tpu.entropy.device_rans import (
    _encode_scan_carry, _encode_scan_stream, _decode_scan_carry,
    encode_carry_init, _row_cum_lookup_hl, _sel_pick_u16, SKIP_ROW)

L = int(os.environ.get("EXP_LANES", 4096))
K = int(os.environ.get("EXP_K", 268))
NR = int(os.environ.get("EXP_NR", 128))
MW = int(os.environ.get("EXP_MW", 71))


def make_table(nr, seed=0):
    """Random valid cumulative rows (nr, 257) i32, monotone, freq>=1."""
    rng = np.random.default_rng(seed)
    freqs = rng.integers(1, 600, size=(nr, 256)).astype(np.int64)
    freqs = (freqs * ((1 << 16) / freqs.sum(axis=1, keepdims=True))) \
        .astype(np.int64)
    freqs = np.maximum(freqs, 1)
    # fix sums to exactly 2^16
    for i in range(nr):
        d = (1 << 16) - freqs[i].sum()
        freqs[i, np.argmax(freqs[i])] += d
    cum = np.zeros((nr, 257), np.int32)
    cum[:, 1:] = np.cumsum(freqs, axis=1).astype(np.int32)
    return cum


def split_hl(cum):
    hi = (cum >> 8).astype(jnp.bfloat16)
    lo = (cum & 255).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=1)


def _sync(r):
    """Force completion: D2H a single element of the first leaf.
    (block_until_ready is unreliable over the axon tunnel — a jitted
    8k x 8k matmul 'blocks' in 0.035 ms; an in-order device + a tiny
    fetch of the last result is the sound throughput fence.)"""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def t_best(fn, n=10, reps=2):
    r = fn()  # warm/compile
    _sync(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


# ---------------------------------------------------------------------------
# encode variants
# ---------------------------------------------------------------------------

def precompute_onehot(symbols, rows, cum_hl):
    """(L,K) -> (start,freq,is_skip) each (L,K), via one-hot matmuls
    batched over all K steps (exact bf16 hi/lo picks, same math the
    in-scan lookup uses)."""
    Lv, Kv = symbols.shape
    n = Lv * Kv
    r = rows.reshape(n)
    s = symbols.reshape(n)
    is_skip = r == SKIP_ROW
    hi, lo = _row_cum_lookup_hl(r, cum_hl)
    sel = (jnp.arange(256, dtype=jnp.int32)[None, :]
           == (s + 128)[:, None]).astype(jnp.bfloat16)
    start = _sel_pick_u16(sel, hi[:, :256], lo[:, :256])
    nxt = _sel_pick_u16(sel, hi[:, 1:], lo[:, 1:])
    freq = jnp.maximum(nxt - start, 1)
    return (start.reshape(Lv, Kv), freq.reshape(Lv, Kv),
            is_skip.reshape(Lv, Kv))


def precompute_take(symbols, rows, cum_i32):
    """gather variant: cum_i32 (nr+1?, 257) int32 plain table."""
    Lv, Kv = symbols.shape
    r = rows.reshape(-1)
    s = symbols.reshape(-1) + 128
    is_skip = r == SKIP_ROW
    rr = jnp.where(is_skip, 0, r)
    flat = cum_i32.reshape(-1)
    idx = rr * 257 + s
    start = jnp.take(flat, idx)
    nxt = jnp.take(flat, idx + 1)
    freq = jnp.maximum(nxt - start, 1)
    return (start.reshape(Lv, Kv), freq.reshape(Lv, Kv),
            is_skip.reshape(Lv, Kv))


def lean_encode_scan(start_all, freq_all, skip_all, carry):
    max_words = carry[2].shape[1]
    col = jnp.arange(max_words, dtype=jnp.int32)[None, :]

    def body(carry, xs):
        state, cursors, buf = carry
        start_i, freq_i, is_skip = xs
        start = start_i.astype(jnp.uint32)
        freq = freq_i.astype(jnp.uint32)
        cond = (state >= (freq << 16)) & ~is_skip
        word = (state & 0xFFFF).astype(jnp.int32)
        emit = (col == cursors[:, None]) & cond[:, None]
        buf = buf + jnp.where(emit, word[:, None], 0)
        state1 = jnp.where(cond, state >> 16, state)
        cursors = cursors + cond.astype(jnp.int32)
        state2 = ((state1 // freq) << 16) + (state1 % freq) + start
        state = jnp.where(is_skip, state, state2)
        return (state, cursors, buf), None

    carry, _ = lax.scan(
        body, carry, (start_all.T, freq_all.T, skip_all.T), unroll=2)
    return carry


def main():
    rng = np.random.default_rng(0)
    cum = make_table(NR)
    cum_hl = jax.device_put(split_hl(jnp.asarray(cum)))
    cum_dev = jax.device_put(jnp.asarray(cum))
    symbols = jnp.asarray(rng.integers(-8, 8, size=(L, K)), jnp.int32)
    rows = jnp.asarray(rng.integers(0, NR, size=(L, K)), jnp.int32)

    j_v0 = jax.jit(lambda s, r, c: _encode_scan_carry(
        s, r, c, encode_carry_init(L, MW)))
    j_pre = jax.jit(precompute_onehot)
    j_take = jax.jit(precompute_take)
    j_lean = jax.jit(lambda st, fr, sk: lean_encode_scan(
        st, fr, sk, encode_carry_init(L, MW)))

    def v1(s, r):
        st, fr, sk = j_pre(s, r, cum_hl)
        return j_lean(st, fr, sk)

    j_v1 = jax.jit(lambda s, r: lean_encode_scan(
        *precompute_onehot(s, r, cum_hl), encode_carry_init(L, MW)))
    j_v2 = jax.jit(lambda s, r: lean_encode_scan(
        *precompute_take(s, r, cum_dev), encode_carry_init(L, MW)))

    j_stream = jax.jit(lambda s, r, c: _encode_scan_stream(
        s, r, c, encode_carry_init(L, MW)))

    out = {}
    out["enc_v0_ms"] = 1e3 * t_best(lambda: j_v0(symbols, rows, cum_hl))
    out["enc_stream_ms"] = 1e3 * t_best(
        lambda: j_stream(symbols, rows, cum_hl))
    cs = jax.device_get(j_stream(symbols, rows, cum_hl))
    out["enc_pre_ms"] = 1e3 * t_best(lambda: j_pre(symbols, rows, cum_hl))
    out["enc_take_ms"] = 1e3 * t_best(
        lambda: j_take(symbols, rows, cum_dev))
    st, fr, sk = j_pre(symbols, rows, cum_hl)
    out["enc_lean_ms"] = 1e3 * t_best(lambda: j_lean(st, fr, sk))
    out["enc_v1_ms"] = 1e3 * t_best(lambda: j_v1(symbols, rows))
    out["enc_v2_ms"] = 1e3 * t_best(lambda: j_v2(symbols, rows))

    # parity v0 vs v1 vs v2
    c0 = jax.device_get(j_v0(symbols, rows, cum_hl))
    c1 = jax.device_get(j_v1(symbols, rows))
    c2 = jax.device_get(j_v2(symbols, rows))
    out["v1_match"] = all(bool(np.array_equal(a, b))
                          for a, b in zip(c0, c1))
    out["v2_match"] = all(bool(np.array_equal(a, b))
                          for a, b in zip(c0, c2))
    out["stream_match"] = all(bool(np.array_equal(a, b))
                              for a, b in zip(c0, cs))

    # decode baseline
    states, cursors, buf = c0
    data = jnp.asarray(buf, jnp.int32)  # not true decode order; timing only
    carry = (jnp.asarray(states, jnp.uint32),
             jnp.zeros((L,), jnp.int32))
    j_d0 = jax.jit(lambda d, r, c: _decode_scan_carry(d, r, c, carry))
    out["dec_v0_ms"] = 1e3 * t_best(lambda: j_d0(data, rows, cum_hl))
    from opendcvc_tpu.entropy.device_rans import _decode_scan_blocked
    j_db = jax.jit(lambda d, r, c: _decode_scan_blocked(d, r, c, carry))
    out["dec_blocked_ms"] = 1e3 * t_best(
        lambda: j_db(data, rows, cum_hl))
    rd = jax.device_get(j_d0(data, rows, cum_hl))
    bd = jax.device_get(j_db(data, rows, cum_hl))
    out["dec_blocked_match"] = all(
        bool(np.array_equal(a, b))
        for a, b in zip(jax.tree_util.tree_leaves(rd),
                        jax.tree_util.tree_leaves(bd)))

    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in out.items()}
    out.update(L=L, K=K, NR=NR, MW=MW)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
