"""Device-side entropy coding: wide-interleaved rANS on the TPU.

The classic pipeline ships ~2 bytes/symbol of packed symbols to the host
and runs rANS there; on remote/tunneled devices the transfer dominates
the frame time.  This module encodes ON the device instead, as L
independent rANS lanes advanced in lockstep by a `lax.scan` (the VPU
processes all lanes per step), so only the compressed bytes (plus per-
lane lengths and final states) cross device->host.

Everything is built for the TPU's execution model: renormalisation is
16-bit (state in [2^16, 2^32)) so each scan step moves at most ONE u16
per lane, and CDF rows are fetched with one-hot matmuls on the MXU —
measured on v5e, XLA's gather runs ~9ns/element (a 512k-position
lookup costs ~5ms) while the equivalent one-hot contraction is
sub-millisecond.  The tables are split into hi/lo bytes so the matmul
runs in ONE bf16 pass yet stays exact: one-hot entries and byte values
(<= 256) are exactly representable in bf16, every output is a single
nonzero term accumulated in f32, and hi*256+lo reassembles the 16-bit
cumulative exactly (the round-1 design used 6-pass f32 HIGHEST
precision for the same guarantee at ~6x the cost).

Format ("tpu-lane" v2, self-contained, NOT the reference byte format):
  * symbols are coded against full-range 256-bin CDFs (no escape/bypass:
    every bin has frequency >= 1, precision 16) derived from the same
    probability models as the host tables;
  * the symbol sequence is split contiguously into L lanes, padded to
    lane length K with (symbol 0, cdf row 0 of the segment's subtable);
  * serialized stream: u32 N | u16 L | u16 K | per lane: u16 len (u16
    words) | u32 state | 2*len data bytes (words in decode order).

A vectorized numpy decoder (all lanes in lockstep) provides the host
decode path and the roundtrip tests; a native lane decoder can replace
it later.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _scan_unroll(side):
    """lax.scan unroll depth for the lane rANS scans, read at trace
    time.  The scans are per-step-overhead bound (~16-25 us/step on a
    tunneled v5e); unrolling amortizes it without changing the coded
    bytes (scan semantics are unchanged, only the compiled schedule).
    Standalone sweep (tools/exp_scan.py, v5e, 4096 lanes x 268 steps):
    encode 6.68 ms @u2 -> 6.10 @u8; decode 5.37 @u2 -> 5.12 @u4.
    Override with OPENDCVC_TPU_EC_UNROLL_ENC / _DEC.  Default stays 2:
    deeper unroll is a measured in-situ win only when the (server-side,
    on tunneled devices) recompile it forces is affordable."""
    return int(os.environ.get(f"OPENDCVC_TPU_EC_UNROLL_{side}", 2))


# ---------------------------------------------------------------------------
# full-range CDF construction (host, once per update)
# ---------------------------------------------------------------------------

def full_range_cdf_rows(cdfs, cdf_sizes, offsets):
    """Convert escape-format quantized CDF rows into full-range 256-bin
    rows (freq >= 1 everywhere, sum == 2^16).

    cdfs: (n, max_len) int32 rows; cdf_sizes: (n,); offsets: (n,).
    Returns (n, 257) int32 cumulative rows over symbols -128..127.
    """
    cdfs = np.asarray(cdfs, np.int64)
    sizes = np.asarray(cdf_sizes, np.int64).reshape(-1)
    offsets = np.asarray(offsets, np.int64).reshape(-1)
    n, w = cdfs.shape
    # per-row in-range frequencies, vectorized across rows
    in_f = cdfs[:, 1:] - cdfs[:, :-1]                    # (n, w-1)
    n_sym = sizes - 2              # in-range symbols (last bin = escape)
    col = np.arange(w - 1)[None, :]
    valid = col < n_sym[:, None]
    # scatter each row's in-range block at bin offset+128
    freqs = np.ones((n, 256), np.int64)
    lo = offsets + 128             # bin index of first in-range symbol
    dest = lo[:, None] + col                             # (n, w-1)
    valid &= (dest >= 0) & (dest < 256)
    in_f = np.where(valid, np.maximum(in_f, 1), 0)
    dest_c = np.clip(dest, 0, 255)
    rows_i = np.repeat(np.arange(n), w - 1)
    np.add.at(freqs, (rows_i, dest_c.reshape(-1)),
              (np.where(valid, in_f - 1, 0)).reshape(-1))
    excess = freqs.sum(axis=1) - (1 << 16)
    j = np.argmax(freqs, axis=1)
    assert np.all(freqs[np.arange(n), j] - excess >= 1), \
        "cannot normalize full-range cdf"
    freqs[np.arange(n), j] -= excess
    out = np.zeros((n, 257), np.int64)
    out[:, 1:] = np.cumsum(freqs, axis=1)
    assert np.all(out[:, -1] == (1 << 16))
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# device encoder
# ---------------------------------------------------------------------------

def _split_hi_lo_bf16(cum_rows):
    """(n, 257) int32 cumulative rows -> (n, 514) bf16 [hi | lo] bytes.
    hi = cum >> 8 (<= 256), lo = cum & 255 — both exact in bf16."""
    cum_rows = jnp.asarray(cum_rows, jnp.int32)
    hi = (cum_rows >> 8).astype(jnp.bfloat16)
    lo = (cum_rows & 255).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=1)


def _row_cum_lookup_hl(r_local, cum_hl):
    """(L,) local row ids -> ((L, 257), (L, 257)) exact cumulative hi
    and lo bytes as bf16.

    One-hot matmul on the MXU in a single bf16 pass: every output is
    one nonzero term (exact — hi <= 256 and lo <= 255 are integers
    representable in bf16).  Downstream comparisons and selections stay
    in bf16: the scan bodies are HBM-bound on their (L, 257)
    temporaries, so never widening to f32 halves the traffic."""
    nr = cum_hl.shape[0]
    onehot = (r_local[:, None] == jnp.arange(nr)[None, :]) \
        .astype(jnp.bfloat16)
    hl = jnp.matmul(onehot, cum_hl,
                    preferred_element_type=jnp.bfloat16)    # (L, 514)
    return hl[:, :257], hl[:, 257:]


def _row_cum_lookup(r_local, cum_hl):
    """(L,) local row ids -> (L, 257) exact cumulative values as f32."""
    hi, lo = _row_cum_lookup_hl(r_local, cum_hl)
    return hi.astype(jnp.float32) * 256.0 + lo.astype(jnp.float32)


def _sel_pick_u16(sel_b, hi, lo):
    """Sum-select exact 16-bit values through a bf16 one-hot mask:
    sel_b (L, n) bf16 one-hot, hi/lo (L, n) bf16 byte planes ->
    (L,) int32.  Each reduction has a single nonzero term, so the bf16
    arithmetic is exact."""
    h = jnp.sum(sel_b * hi, axis=1).astype(jnp.int32)
    l = jnp.sum(sel_b * lo, axis=1).astype(jnp.int32)
    return (h << 8) + l


def _encode_scan_carry(symbols, rows, cum_hl_sub, carry):
    """One encode sub-scan with rANS state continuation.

    symbols: (L, K) int32 in [-128,127], reversed (last symbol first);
    rows: (L, K) int32 LOCAL cdf-row ids into cum_hl_sub ((nr, 514)
    bf16 hi/lo split rows); carry: (state (L,) u32, cursors (L,) i32,
    buf (L, MW) i32) from the previous sub-scan (segments coded
    back-to-back share one lane state and one staging buffer).

    rANS with 16-bit renormalisation: state in [2^16, 2^32), at most ONE
    u16 emitted per symbol (freq >= 1 makes a second emission
    impossible).  Per step: one bf16 one-hot matmul fetches the lanes'
    cumulative rows as hi/lo byte planes, (start, next) come from exact
    bf16 one-hot reductions over the 256 bins (everything stays bf16 —
    the body is HBM-bound on its (L, 257) temporaries), and the emitted
    word goes through a small (L, MW) one-hot accumulate (cursor
    positions are strictly increasing, so add == set)."""
    from ..utils.common import env_flag
    if env_flag("OPENDCVC_TPU_EC_ENC_STREAM", default=False):
        return _encode_scan_stream(symbols, rows, cum_hl_sub, carry)
    max_words = carry[2].shape[1]
    col = jnp.arange(max_words, dtype=jnp.int32)[None, :]
    bins = jnp.arange(256, dtype=jnp.int32)[None, :]

    def body(carry, xs):
        state, cursors, buf = carry
        s, r = xs
        # SKIP_ROW (255) = zero-rate passthrough: force_zero_thres
        # positions keep their lane slot but leave state/cursor
        # untouched, mirroring the reference's skip mode where
        # sub-threshold symbols are never coded (reference
        # entropy_models.py:285-341).  The one-hot row fetch returns an
        # all-zero row for 255, so freq is clamped to dodge the
        # division; the garbage update is selected away.
        is_skip = r == SKIP_ROW
        hi, lo = _row_cum_lookup_hl(r, cum_hl_sub)     # (L, 257) bf16 x2
        sel = (bins == (s + 128)[:, None]).astype(jnp.bfloat16)
        start_i = _sel_pick_u16(sel, hi[:, :256], lo[:, :256])
        next_i = _sel_pick_u16(sel, hi[:, 1:], lo[:, 1:])
        start = start_i.astype(jnp.uint32)
        freq = jnp.maximum((next_i - start_i).astype(jnp.uint32), 1)
        cond = (state >= (freq << 16)) & ~is_skip
        word = (state & 0xFFFF).astype(jnp.int32)
        emit = (col == cursors[:, None]) & cond[:, None]
        buf = buf + jnp.where(emit, word[:, None], 0)
        state1 = jnp.where(cond, state >> 16, state)
        cursors = cursors + cond.astype(jnp.int32)
        state2 = ((state1 // freq) << 16) + (state1 % freq) + start
        state = jnp.where(is_skip, state, state2)
        return (state, cursors, buf), None

    carry, _ = lax.scan(body, carry, (symbols.T, rows.T),
                        unroll=_scan_unroll("ENC"))
    return carry


def _encode_scan_stream(symbols, rows, cum_hl_sub, carry):
    """Emission-streaming variant of _encode_scan_carry (same contract,
    bit-identical output; selected by OPENDCVC_TPU_EC_ENC_STREAM).

    The classic body carries the (L, MW) staging buffer through the
    scan and rewrites it every step — ~2·L·MW·4 bytes of HBM traffic
    PER STEP (the measured floor of the encode scan is this buffer, not
    the rANS math).  Here the scan carries only (state, cursors) and
    streams each step's (word, cond) out as ys; the staging rectangle
    is assembled afterwards with ONE scatter (unique destinations —
    cursor positions are strictly increasing per lane, and sub-scan
    positions are disjoint because the carried cursors only grow, so
    add == set into the shared buffer)."""
    state0, cursors0, buf = carry
    L, max_words = buf.shape
    bins = jnp.arange(256, dtype=jnp.int32)[None, :]

    def body(carry, xs):
        state, cursors = carry
        s, r = xs
        is_skip = r == SKIP_ROW
        hi, lo = _row_cum_lookup_hl(r, cum_hl_sub)     # (L, 257) bf16 x2
        sel = (bins == (s + 128)[:, None]).astype(jnp.bfloat16)
        start_i = _sel_pick_u16(sel, hi[:, :256], lo[:, :256])
        next_i = _sel_pick_u16(sel, hi[:, 1:], lo[:, 1:])
        start = start_i.astype(jnp.uint32)
        freq = jnp.maximum((next_i - start_i).astype(jnp.uint32), 1)
        cond = (state >= (freq << 16)) & ~is_skip
        word = (state & 0xFFFF).astype(jnp.int32)
        state1 = jnp.where(cond, state >> 16, state)
        cursors = cursors + cond.astype(jnp.int32)
        state2 = ((state1 // freq) << 16) + (state1 % freq) + start
        state = jnp.where(is_skip, state, state2)
        return (state, cursors), (word, cond)

    (state, cursors), (words, conds) = lax.scan(
        body, (state0, cursors0), (symbols.T, rows.T),
        unroll=_scan_unroll("ENC"))
    # words/conds are (K, L); emission position = cursor value BEFORE
    # the increment = entry cursor + (inclusive cumsum of cond) - 1
    pos = cursors0[None, :] + jnp.cumsum(
        conds.astype(jnp.int32), axis=0) - 1
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    # pos >= max_words happens only when a lane overflows its staging
    # budget (the regrow ladder detects this from cursors/lens); the
    # classic scan's one-hot emit silently drops such words — route
    # them to the dump slot so they can't corrupt the next lane's row
    dst = jnp.where(conds & (pos < max_words),
                    lane * max_words + pos, L * max_words)
    flat = jnp.zeros((L * max_words + 1,), jnp.int32).at[
        dst.reshape(-1)].set(words.reshape(-1), mode="drop",
                             unique_indices=True)
    buf = buf + flat[:L * max_words].reshape(L, max_words)
    return (state, cursors, buf)


def encode_carry_init(lanes, max_words):
    return (jnp.full((lanes,), 1 << 16, jnp.uint32),
            jnp.zeros((lanes,), jnp.int32),
            jnp.zeros((lanes, max_words), jnp.int32))


def _encode_scan(symbols, rows, cum_hl_sub, max_words):
    """Single-segment encode (fresh carry).  Returns
    (buf (L, max_words) u16 staging, lens, states)."""
    L, K = symbols.shape
    state, cursors, buf = _encode_scan_carry(
        symbols, rows, cum_hl_sub, encode_carry_init(L, max_words))
    # u16 staging: halves the D2H volume of the symbol fetch
    return buf.astype(jnp.uint16), cursors, state


def _slice_rows(cum_hl, rows, nr, row_base):
    """Carve the (nr, 514) subtable at traced row_base and localize the
    row ids (clamped so lane padding lands on a valid row).

    The optimization_barrier is load-bearing: without it XLA fuses the
    dynamic_slice into the consuming scan body, where the one-hot row
    lookup degenerates from an MXU matmul into a per-step gather fusion
    (measured 0.64 ms/step vs 13 us/step on a v5e — 8 ms/frame on the
    z plane alone).  The barrier materializes the subtable once, so the
    scan sees a plain (nr, 514) constant."""
    cum_sub = lax.dynamic_slice(cum_hl, (row_base, 0),
                                (nr, cum_hl.shape[1]))
    cum_sub = lax.optimization_barrier(cum_sub)
    rows_local = jnp.clip(rows - row_base, 0, nr - 1)
    return cum_sub, rows_local


class DeviceRansEncoder:
    """Holds device-side full-range CDF tables and the jitted lane
    encoder.  Table layout: rows [0..n_y) = gaussian scale rows, rows
    [n_y..) = z rows (row = n_y + qp*C + channel)."""

    def __init__(self, lanes=512, bytes_per_symbol=0.75):
        self.lanes = lanes
        self.bytes_per_symbol = bytes_per_symbol
        self.cum_hl = None
        self.n_y_rows = 0
        self._encode = jax.jit(_encode_scan, static_argnums=(3,))
        self._slice = jax.jit(_slice_rows, static_argnums=(2,))
        self._trim = jax.jit(
            lambda b, w: lax.slice(b, (0, 0), (b.shape[0], w)),
            static_argnums=(1,))

    def trim(self, buf, width):
        """Device-side slice of the staging buffer to a (bucketed) width
        before D2H — only ~actual compressed bytes cross the link."""
        return self._trim(buf, width)

    def set_tables(self, y_rows, z_rows):
        """y_rows/z_rows: (n, 257) int32 full-range cumulative rows."""
        table = np.concatenate([y_rows, z_rows], axis=0)
        self.n_y_rows = y_rows.shape[0]
        self.cum_hl = jax.device_put(_split_hi_lo_bf16(table))

    def encode_jit_args(self, symbols_flat, rows_flat):
        """Device-side prep: pad + reshape + reverse into lane layout.
        Call INSIDE a jit stage.  symbols_flat int32 [-128,127];
        rows_flat int32 row ids."""
        L = self.lanes
        n = symbols_flat.shape[0]
        K = -(-n // L)
        pad = L * K - n
        s = jnp.concatenate([symbols_flat,
                             jnp.zeros((pad,), symbols_flat.dtype)])
        r = jnp.concatenate([rows_flat, jnp.zeros((pad,), rows_flat.dtype)])
        s = s.reshape(L, K)[:, ::-1]
        r = r.reshape(L, K)[:, ::-1]
        return s, r

    def encode(self, symbols_lanes, rows_lanes, bytes_per_symbol=None,
               row_base=0, nr=None):
        """Runs the scan encoder; returns device arrays
        (buf, lens, states).

        row_base/nr select the CDF subtable the segment codes against
        (nr static, row_base traced): keeping the one-hot lookup narrow
        is what makes the MXU path cheap.  Lane-padding rows are clamped
        into the subtable; the decoder clamps identically."""
        L, K = symbols_lanes.shape
        bps = bytes_per_symbol or self.bytes_per_symbol
        max_words = max(32, int(K * bps / 2)) + 4
        if nr is None:
            nr = self.n_y_rows
        cum_sub, rows_local = self._slice(self.cum_hl, rows_lanes, nr,
                                          np.int32(row_base))
        return self._encode(symbols_lanes, rows_local, cum_sub,
                            max_words)

    def serialize(self, buf_np, lens_np, states_np, n_symbols):
        """Assemble the v2 container from fetched arrays.  buf_np holds
        u16 words (as int32); lane lengths are word counts."""
        L, MW = buf_np.shape
        K = -(-n_symbols // L)
        if int(lens_np.max()) >= MW - 2:
            raise OverflowError("device rANS lane buffer overflow")
        parts = [np.uint32(n_symbols).tobytes(),
                 np.uint16(L).tobytes(), np.uint16(K).tobytes()]
        for l in range(L):
            ln = int(lens_np[l])
            parts.append(np.uint16(ln).tobytes())
            parts.append(np.uint32(states_np[l]).tobytes())
            parts.append(buf_np[l, :ln][::-1].astype(np.uint16)
                         .tobytes())
        return b"".join(parts)


# ---------------------------------------------------------------------------
# frame container (v3): all segments in one buffer, vectorized host side,
# device-side unpacking — one H2D per frame on decode
# ---------------------------------------------------------------------------

def densify_segment(buf, lens, states, cap):
    """Device-side compaction of the encode staging: scatter each lane's
    emitted words (reversed into decode order) back-to-back, lane-major —
    the exact data layout of the v3 container.  The D2H fetch then
    carries ~true-bpp bytes instead of the (L, MW) staging rectangle
    (the tunnel link is bandwidth-bound at these sizes).

    Returns ONE u16 vector: [dense words (cap) | lens (L) | state hi (L)
    | state lo (L)].  Overflow (sum(lens) > cap) leaves the tail
    truncated; the host detects it from the lens section and re-runs at
    the next ladder step."""
    L, MW = buf.shape
    lens32 = lens.astype(jnp.int32)
    offs = jnp.cumsum(lens32) - lens32  # exclusive, lane-major
    col = jnp.arange(MW, dtype=jnp.int32)[None, :]
    valid = col < lens32[:, None]
    dst = offs[:, None] + (lens32[:, None] - 1 - col)
    dst = jnp.where(valid, dst, cap)  # park invalid/overflow in the pad
    dense = jnp.zeros((cap + 1,), jnp.int32)
    dense = dense.at[dst.reshape(-1)].set(
        buf.astype(jnp.int32).reshape(-1), mode="drop",
        unique_indices=False)
    return jnp.concatenate([
        dense[:cap].astype(jnp.uint16),
        lens.astype(jnp.uint16),
        (states >> 16).astype(jnp.uint16),
        (states & 0xFFFF).astype(jnp.uint16)])


def undensify_packed(packed, cap, L):
    """Host-side split of densify_segment's output (numpy)."""
    dense = packed[:cap]
    lens = packed[cap:cap + L].astype(np.int32)
    states = (packed[cap + L:cap + 2 * L].astype(np.uint32) << 16) \
        | packed[cap + 2 * L:cap + 3 * L].astype(np.uint32)
    return dense, lens, states


def effective_lanes(max_lanes, n_symbols, min_lanes=256,
                    min_steps=64):
    """Scale the lane count to the frame's symbol count.

    The container carries ~6 bytes of per-lane state (u16 len + u32
    rANS state), so small frames at the full configured lane count
    drown in fixed overhead (measured 64 bpp at 48x64 with 4096 lanes).
    Halving lanes costs almost nothing in scan time — the scan bodies
    are bound by total (n x 257) traffic, not step count — so shrink
    until each lane has >= min_steps symbols.  The decoder needs no
    configuration: every container records its own L."""
    lanes = max_lanes
    while lanes > min_lanes and lanes * min_steps > n_symbols:
        lanes //= 2
    return max(lanes, min_lanes)


#: sentinel CDF-row id marking a force-zero-thres SKIPPED symbol: the
#: scans pass it through at zero rate (no emission, no state change) and
#: decode it as 0.  Real local row ids stay < 255 (y rows <= 127, z rows
#: < channel count <= 128).
SKIP_ROW = 255

FRAME_MAGIC = 0xD6  # container format/version marker (v6: adds the
# kyc skip-compaction rung; v5 = channel-major symbol-to-lane mapping,
# models/dmc.py _cm_flat)


# ---------------------------------------------------------------------------
# skip-lane compaction (force_zero_thres fast path)
#
# The reference's skip mode never codes sub-threshold symbols at all
# (src/models/entropy_models.py:330-341) — at its recommended eval
# threshold MOST symbols are skipped, and its decode speed comes from
# doing proportionally less work.  Zero-rate SKIP_ROW passthrough lanes
# are bit-exact but still burn a scan step per skipped symbol; these
# helpers compact the SURVIVING symbols into a fixed L*K_c-slot prefix
# (K_c the static "compaction rung") so the scans run K_c steps instead
# of K.  Encoder and decoder derive the identical mapping from the
# shared keep mask (both sides compute it from the same jitted scale
# stages), so no side information crosses the link beyond the rung in
# the container header.  Everything is integer cumsum + scatter — no
# gathers (XLA:TPU gathers run ~9 ns/element; scatters into dense
# targets and cumsums stay on the VPU).
# ---------------------------------------------------------------------------


def compact_skip_enc(sym, rows, keep, n_c):
    """Compact a flat plane's surviving symbols into n_c slots.

    sym/rows/keep: (n,) flat plane in channel-major order; n_c: static
    slot count (lanes * K_c).  Survivors keep their relative order; tail
    slots ride SKIP_ROW at zero rate; survivors beyond n_c (overflow)
    park in a dropped pad slot — the caller re-runs at a larger rung
    when m > n_c.  Returns (sym_c, rows_c, m)."""
    k = keep.astype(jnp.int32)
    idx = jnp.cumsum(k) - k                      # exclusive prefix sum
    dst = jnp.minimum(jnp.where(keep, idx, n_c), n_c)
    sym_c = jnp.zeros((n_c + 1,), sym.dtype).at[dst].set(
        sym, mode="drop")
    rows_c = jnp.full((n_c + 1,), SKIP_ROW, rows.dtype).at[dst].set(
        jnp.where(keep, rows, SKIP_ROW), mode="drop")
    return sym_c[:n_c], rows_c[:n_c], jnp.sum(k)


def compact_skip_dec(rows, keep, n_c):
    """Decoder mirror of compact_skip_enc: compact the survivors' row
    ids and remember each slot's original position (park = n for tail /
    overflow slots).  Returns (rows_c (n_c,), orig (n_c,) int32)."""
    n = rows.shape[0]
    k = keep.astype(jnp.int32)
    idx = jnp.cumsum(k) - k
    dst = jnp.minimum(jnp.where(keep, idx, n_c), n_c)
    rows_c = jnp.full((n_c + 1,), SKIP_ROW, rows.dtype).at[dst].set(
        jnp.where(keep, rows, SKIP_ROW), mode="drop")
    orig = jnp.full((n_c + 1,), n, jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return rows_c[:n_c], orig[:n_c]


def expand_compact_syms(sym_c, orig, n):
    """Scatter decoded compact symbols back to their full-plane
    positions; skipped positions decode as 0 (the reference decodes
    skipped symbols as zero, entropy_models.py:330-341)."""
    out = jnp.zeros((n + 1,), sym_c.dtype).at[orig].set(sym_c,
                                                        mode="drop")
    return out[:n]


def serialize_frame_dense(dense, lens, states, n_symbols, K, MW, cap,
                          kyc=0):
    """v6 container from an already-dense (decode-order, lane-major)
    word vector.  Layout:
      u8 FRAME_MAGIC | u32 n | u16 L | u16 K | u16 MW | u32 cap |
      u16 kyc | u32 data_len | lens u16*L | states u32*L | dense
      u16*total
    The magic byte versions the container: streams written by an
    incompatible lane layout / format fail loudly at parse instead of
    mis-decoding.  `cap` records the encoder's dense staging capacity so
    the decoder can rebuild the exact compact staging layout the encoder
    produced (one static shape per ladder rung); `kyc` is the
    skip-compaction rung (steps per lane per compacted y plane; 0 = no
    compaction)."""
    L = lens.shape[0]
    total = int(lens.sum())
    head = [np.uint8(FRAME_MAGIC).tobytes(),
            np.uint32(n_symbols).tobytes(),
            np.uint16(L).tobytes(), np.uint16(K).tobytes(),
            np.uint16(MW).tobytes(),
            np.uint32(cap).tobytes(),
            np.uint16(kyc).tobytes(),
            np.uint32(2 * total).tobytes()]
    return b"".join(head + [lens.astype(np.uint16).tobytes(),
                            states.astype(np.uint32).tobytes(),
                            np.ascontiguousarray(dense[:total])
                            .astype(np.uint16).tobytes()])


def parse_frame_parts(stream, offset=0):
    """Parse one v6 container into its raw parts.

    Returns (meta, dense (total,) u16, lens (L,) u16, states (L,) u32,
    next_offset); meta carries n/L/K/MW/cap/kyc/total."""
    if stream[offset] != FRAME_MAGIC:
        raise ValueError(
            f"bad container magic 0x{stream[offset]:02x} (expected "
            f"0x{FRAME_MAGIC:02x}): stream written by an incompatible "
            "format version")
    off = offset + 1
    n = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
    L = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
    K = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
    mw = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
    cap = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
    kyc = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
    dlen = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
    lens = np.frombuffer(stream, np.uint16, L, off); off += 2 * L
    states = np.frombuffer(stream, np.uint32, L, off); off += 4 * L
    total = dlen // 2
    dense = np.frombuffer(stream, np.uint16, total, off); off += dlen
    meta = {"n": n, "L": L, "K": K, "MW": mw, "cap": cap, "kyc": kyc,
            "total": total}
    return meta, dense, lens, states, off


def staging_from_parts(dense, lens, states, cap, width=None):
    """Assemble the host-side staging vector [dense padded to `width` |
    lens | st_hi | st_lo] (u16).  width defaults to cap (the megastage's
    native layout); a smaller quantized width is the BUCKETED upload
    form — expand_staging() re-pads it to cap on the device, so the H2D
    volume scales with the frame's true bits instead of the staging
    capacity."""
    L = lens.shape[0]
    w = cap if width is None else width
    staging = np.zeros(w + 3 * L, np.uint16)
    staging[:dense.shape[0]] = dense
    staging[w:w + L] = lens
    staging[w + L:w + 2 * L] = (states >> 16).astype(np.uint16)
    staging[w + 2 * L:] = (states & 0xFFFF).astype(np.uint16)
    return staging


def parse_frame(stream, offset=0):
    """Parse one v6 container into the COMPACT device staging vector:
    [dense words padded to cap | lens (L) | state hi (L) | state lo (L)]
    — exactly the layout densify_segment produced on the encoder, so
    only ~true-bpp bytes cross host->device and the device re-expands
    lanes itself (_undensify_device).

    Returns (meta, staging_u16, next_offset); meta carries
    n/L/K/MW/cap/kyc/total."""
    meta, dense, lens, states, off = parse_frame_parts(stream, offset)
    staging = staging_from_parts(dense, lens, states, meta["cap"])
    return meta, staging, off


# ---------------------------------------------------------------------------
# transfer slimming: the staging rectangle's capacity is sized for
# worst-case content, but the tunneled link is bandwidth-bound, so both
# directions move only a quantized window around the TRUE payload:
#   decode: upload [dense padded to bucket | lens | hi | lo] and zero-
#           extend to cap on-device (expand_staging) — exact, since the
#           host knows total;
#   encode: fetch [dense window w | lens | states | m] (fetch_window)
#           and rebuild the cap layout on the host (restore_window) —
#           sum(lens) > w is detected from the fetched lens and falls
#           back to one full fetch, and the window adapts upward.
# Windows/buckets quantize to WINDOW_STEP so mixed content reuses a
# handful of compiled slice/pad programs (each is a trivial compile,
# but executable churn is still worth bounding).
# ---------------------------------------------------------------------------

WINDOW_STEP = 8192  # u16 words = 16 KiB


def quantize_window(words, cap, step=None):
    step = WINDOW_STEP if step is None else step
    return int(min(-(-max(int(words), 1) // step) * step, cap))


@functools.partial(jax.jit, static_argnums=(1, 2))
def expand_staging(win, bucket, cap):
    """(…, bucket+3L) u16 -> (…, cap+3L): zero-extend the dense section
    to cap on-device so the decode megastage keeps its single static
    shape while the upload scales with true bits."""
    dense = win[..., :bucket]
    tail = win[..., bucket:]
    pad = [(0, 0)] * (win.ndim - 1) + [(0, cap - bucket)]
    return jnp.concatenate([jnp.pad(dense, pad), tail], axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fetch_window(packed, w, cap, tail):
    """[dense(cap) | tail…] -> [dense(:w) | tail…] along the last axis
    (leading batch dims preserved): the D2H fetch form."""
    nd = packed.ndim - 1
    lo = [0] * nd
    hi = list(packed.shape[:-1])
    a = lax.slice(packed, lo + [0], hi + [w])
    b = lax.slice(packed, lo + [cap], hi + [cap + tail])
    return jnp.concatenate([a, b], axis=-1)


def slim_enabled():
    from ..utils.common import env_flag
    return env_flag("OPENDCVC_TPU_EC_SLIM", default=True)


# observability: window misses cost one full staging fetch each (the
# documented fallback) — sustained misses mean the adaptive window is
# being defeated (e.g. per-scene content changes) and show up here
# instead of silently doubling link traffic
SLIM_STATS = {"fetches": 0, "misses": 0}


def fetch_w_for(windows, cap):
    """Current adaptive D2H window width for a staging capacity:
    starts at cap/4 (quantized), grows to fit observed payloads
    (grow_fetch_w), never shrinks.  `windows` is the caller's per-
    instance {cap: w} dict."""
    if not slim_enabled():
        return cap
    w = windows.get(cap)
    if w is None:
        w = quantize_window(cap // 4, cap)
        windows[cap] = w
    return w


def grow_fetch_w(windows, cap, total):
    """Grow the window to observed payload + 25% headroom."""
    want = quantize_window(total + total // 4, cap)
    if want > windows.get(cap, 0):
        windows[cap] = want


def slim_fetch(windows, packed, lanes, cap, tail_extra=2):
    """Start the (windowed) D2H of encode staging(s) and return a
    zero-arg finisher producing the full [dense(cap) | lens | states |
    m] host vector(s) (leading batch dim preserved).  With slimming on,
    only an adaptive dense window crosses the link; a window miss
    (sum(lens) > w, detected from the fetched lens) falls back to ONE
    full fetch of the kept-alive device array and grows the caller's
    window for subsequent frames."""
    import jax as _jax
    tail = 3 * lanes + tail_extra
    w = fetch_w_for(windows, cap)
    fetched = packed if w >= cap else fetch_window(packed, w, cap, tail)
    try:
        fetched.copy_to_host_async()
    except Exception:
        pass

    def finish():
        arr = np.asarray(_jax.device_get(fetched))
        if w >= cap:
            return arr
        batched = arr.ndim == 2
        rows = arr if batched else arr[None]
        SLIM_STATS["fetches"] += 1
        out, full = [], None
        for i in range(rows.shape[0]):
            r = restore_window(rows[i], w, cap, lanes, tail)
            if r is None:
                if full is None:
                    SLIM_STATS["misses"] += 1
                    full = np.asarray(_jax.device_get(packed))
                    if not batched:
                        full = full[None]
                    tot = int(full[:, cap:cap + lanes]
                              .astype(np.int64).sum(axis=1).max())
                    grow_fetch_w(windows, cap, tot)
                r = full[i]
            out.append(r)
        return np.stack(out) if batched else out[0]

    return finish


def upload_stagings(bit_streams):
    """Parse a chunk's containers and upload their compact decode
    stagings.  With slimming on, only a quantized bucket around the
    chunk's largest TRUE payload crosses the link; the device re-pads
    it to the staging capacity (expand_staging) so the decode megastage
    keeps its single static shape.  Returns (metas, stagings_dev) —
    stagings_dev is None when the chunk mixes ladder rungs (the
    caller's per-frame fallback case)."""
    import jax as _jax
    parts = [parse_frame_parts(s) for s in bit_streams]
    metas = [pp[0] for pp in parts]
    if len({(mm["L"], mm["MW"], mm["cap"], mm["kyc"])
            for mm in metas}) != 1:
        return metas, None
    cap = metas[0]["cap"]
    bucket = cap
    if slim_enabled():
        bucket = quantize_window(max(mm["total"] for mm in metas), cap)
    st = np.stack([staging_from_parts(d, ln, s, cap, width=bucket)
                   for _, d, ln, s, _ in parts])
    dev = _jax.device_put(st)
    if bucket < cap:
        dev = expand_staging(dev, bucket, cap)
    return metas, dev


def restore_window(arr_w, w, cap, L, tail):
    """np inverse of fetch_window for ONE frame: rebuild the
    [dense(cap) | tail] vector.  Returns None when sum(lens) > w — the
    window missed payload; the caller refetches the full packed vector
    (kept alive on device) and grows its window."""
    lens = arr_w[w:w + L]
    if int(lens.astype(np.int64).sum()) > w:
        return None
    out = np.zeros(cap + tail, np.uint16)
    out[:w] = arr_w[:w]
    out[cap:] = arr_w[w:]
    return out


def _undensify_device(staging, cap, L, MW):
    """jit (cap/L/MW static): compact staging [dense | lens | st_hi |
    st_lo] -> ((L, MW) int32 decode-order lane words, (L,) uint32
    states).  Inverse of densify_segment, run ON the device so decode
    uploads only ~true-bpp bytes instead of the (L, MW) rectangle.

    The lane id of each dense position is piecewise constant, so it
    (and the lane's start offset) come from scattering the L lane
    boundaries into a (cap,) marker and taking a cumsum — two tiny
    scatters plus two dense cumsums.  A searchsorted formulation is
    ~13x slower here: XLA lowers it to log2(L) binary-search passes,
    each a cap-sized element gather at ~9 ns/element (measured 0.64 ms
    x 13 per frame on a v5e — more than the decode scans themselves).
    The words then scatter into the padded rectangle (positions beyond
    a lane's length stay 0, never read by the decode scan)."""
    dense = lax.slice(staging, (0,), (cap,)).astype(jnp.int32)
    lens = lax.slice(staging, (cap,), (cap + L,)).astype(jnp.int32)
    hi = lax.slice(staging, (cap + L,),
                   (cap + 2 * L,)).astype(jnp.uint32)
    lo = lax.slice(staging, (cap + 2 * L,),
                   (cap + 3 * L,)).astype(jnp.uint32)
    states = (hi << 16) | lo
    ends = jnp.cumsum(lens)
    pos = jnp.arange(cap, dtype=jnp.int32)
    # lane[p] = #{l: ends[l] <= p}; offs[lane[p]] = sum of those lens
    ends_c = jnp.minimum(ends, cap)
    bnd = jnp.zeros((cap + 1,), jnp.int32).at[ends_c].add(1)
    wts = jnp.zeros((cap + 1,), jnp.int32).at[ends_c].add(lens)
    lane = jnp.cumsum(bnd[:cap])
    offs_pp = jnp.cumsum(wts[:cap])
    lane_c = jnp.minimum(lane, L - 1)
    j = pos - offs_pp
    dst = jnp.where(lane < L, lane_c * MW + j, L * MW)
    data = jnp.zeros((L * MW + 1,), jnp.int32).at[dst].set(
        dense, mode="drop", unique_indices=True)
    return data[:L * MW].reshape(L, MW), states


def _unpack_static(stream, states_off, data_off, L, MW):
    """jit (all offsets static): carve one segment's states and lane
    u16 words out of the staging buffer with plain slices/reshapes."""
    s4 = lax.slice(stream, (states_off,),
                   (states_off + 4 * L,)).reshape(L, 4).astype(jnp.uint32)
    states = s4[:, 0] | (s4[:, 1] << 8) | (s4[:, 2] << 16) | \
        (s4[:, 3] << 24)
    d2 = lax.slice(stream, (data_off,),
                   (data_off + 2 * L * MW,)).reshape(L, MW, 2) \
        .astype(jnp.int32)
    data = d2[:, :, 0] | (d2[:, :, 1] << 8)
    return data, states


# ---------------------------------------------------------------------------
# device decoder (lax.scan; one-hot matmul row lookup, masked reductions)
# ---------------------------------------------------------------------------

def _decode_scan_carry(data, rows, cum_hl_sub, carry):
    """One decode sub-scan with rANS state continuation.

    data: (L, MW) int32 lane u16 words in decode order; rows: (L, K)
    int32 LOCAL row ids in decode (original) order; cum_hl_sub:
    (nr, 514) bf16 hi/lo split rows; carry: (state (L,) u32, ptr (L,)
    i32) — segments decoded back-to-back share one lane state/pointer.
    Returns (symbols (L, K) int32 in [-128, 127], carry).

    u16-renorm mirror of _encode_scan: the symbol search is a masked
    count over the 257 cumulative bins (rows are strictly increasing,
    so the last bin <= f IS the symbol), (start, next) come from one
    stacked masked reduction, and the single renorm word fetch is a
    one-hot reduction over the lane's word row (XLA's per-element
    gather is far slower than these dense VPU reductions on TPU).
    Measured on a v5e: the bf16-matmul + f32-combine + stacked-max
    shape here is the fastest of four search formulations (5.7 vs
    6.9-7.0 ms for 272 steps at 4096 lanes); a pure-bf16 predicate
    search ties standalone but fuses pathologically inside the decode
    megastages (50 vs 24 ms/frame)."""
    from ..utils.common import env_flag
    if env_flag("OPENDCVC_TPU_EC_DEC_BLOCKED", default=False):
        return _decode_scan_blocked(data, rows, cum_hl_sub, carry)
    L, MW = data.shape
    col = jnp.arange(MW, dtype=jnp.int32)[None, :]
    big = jnp.float32(1 << 17)

    def body(carry, r):
        state, ptr = carry
        # SKIP_ROW (255): zero-rate passthrough — decode symbol 0 with
        # state/pointer untouched (mirror of the encoder's skip lanes)
        is_skip = r == SKIP_ROW
        hi, lo = _row_cum_lookup_hl(r, cum_hl_sub)     # (L, 257) bf16 x2
        row_cum = hi.astype(jnp.float32) * 256.0 \
            + lo.astype(jnp.float32)                   # (L, 257) exact
        f = (state & 0xFFFF).astype(jnp.int32)
        ff = f.astype(jnp.float32)[:, None]
        le = row_cum <= ff
        sym = jnp.sum(le, axis=1).astype(jnp.int32) - 1
        # one reduction for both ends: max(masked cum) = cum[sym],
        # -max(masked -cum) = cum[sym+1]
        packed = jnp.max(jnp.stack(
            [jnp.where(le, row_cum, 0.0),
             jnp.where(le, -big, -row_cum)], axis=1), axis=2)  # (L, 2)
        start = packed[:, 0].astype(jnp.int32).astype(jnp.uint32)
        freq = (-packed[:, 1] - packed[:, 0]).astype(jnp.int32) \
            .astype(jnp.uint32)
        state1 = jnp.where(
            is_skip, state,
            freq * (state >> 16) + f.astype(jnp.uint32) - start)
        need = state1 < (1 << 16)
        word = jnp.sum(jnp.where(col == ptr[:, None], data, 0), axis=1)
        state = jnp.where(need,
                          (state1 << 16) | word.astype(jnp.uint32),
                          state1)
        ptr = ptr + need.astype(jnp.int32)
        return (state, ptr), jnp.where(is_skip, 0, sym - 128)

    carry, out = lax.scan(body, carry, rows.T,
                          unroll=_scan_unroll("DEC"))
    return out.T, carry  # (L, K)


def _decode_scan_blocked(data, rows, cum_hl_sub, carry, block=8):
    """Block-refill variant of _decode_scan_carry (same contract,
    bit-identical symbols; selected by OPENDCVC_TPU_EC_DEC_BLOCKED).

    The classic body re-reads the full (L, MW) word rectangle every
    step to pick ONE word per lane — the dominant HBM traffic of the
    decode scan.  A lane consumes at most one word per step, so over a
    `block` of steps it reads only from the window
    [ptr_at_block_start, +block).  The outer scan walks blocks: one
    fused pass over `data` refills a (L, block) chunk (all `block`
    masked reductions share the single read), then `block` unrolled
    inner steps pick words from the chunk with (L, block) selects —
    (K/block)·L·MW reads instead of K·L·MW."""
    L, MW = data.shape
    K = rows.shape[1]
    n_blocks = -(-K // block)
    kp = n_blocks * block
    rows_p = jnp.pad(rows, ((0, 0), (0, kp - K)),
                     constant_values=SKIP_ROW)
    rblocks = rows_p.T.reshape(n_blocks, block, L)
    col = jnp.arange(MW, dtype=jnp.int32)[None, :]
    jj = jnp.arange(block, dtype=jnp.int32)[None, :]
    big = jnp.float32(1 << 17)

    def step(state, ptr, ptr0, chunk, r):
        is_skip = r == SKIP_ROW
        hi, lo = _row_cum_lookup_hl(r, cum_hl_sub)
        row_cum = hi.astype(jnp.float32) * 256.0 \
            + lo.astype(jnp.float32)
        f = (state & 0xFFFF).astype(jnp.int32)
        ff = f.astype(jnp.float32)[:, None]
        le = row_cum <= ff
        sym = jnp.sum(le, axis=1).astype(jnp.int32) - 1
        packed = jnp.max(jnp.stack(
            [jnp.where(le, row_cum, 0.0),
             jnp.where(le, -big, -row_cum)], axis=1), axis=2)
        start = packed[:, 0].astype(jnp.int32).astype(jnp.uint32)
        freq = (-packed[:, 1] - packed[:, 0]).astype(jnp.int32) \
            .astype(jnp.uint32)
        state1 = jnp.where(
            is_skip, state,
            freq * (state >> 16) + f.astype(jnp.uint32) - start)
        need = state1 < (1 << 16)
        word = jnp.sum(jnp.where(jj == (ptr - ptr0)[:, None],
                                 chunk, 0), axis=1)
        state = jnp.where(need,
                          (state1 << 16) | word.astype(jnp.uint32),
                          state1)
        ptr = ptr + need.astype(jnp.int32)
        return state, ptr, jnp.where(is_skip, 0, sym - 128)

    def body(carry, rblk):
        state, ptr = carry
        ptr0 = ptr
        rel = col - ptr0[:, None]                       # (L, MW)
        # one fused pass over data fills the whole window
        chunk = jnp.concatenate(
            [jnp.sum(jnp.where(rel == j, data, 0), axis=1,
                     keepdims=True) for j in range(block)], axis=1)
        syms = []
        for j in range(block):
            state, ptr, s = step(state, ptr, ptr0, chunk, rblk[j])
            syms.append(s)
        return (state, ptr), jnp.stack(syms)

    carry, out = lax.scan(body, carry, rblocks)
    out = out.reshape(kp, L)[:K]
    return out.T, carry


def _decode_scan(data, states, rows, cum_hl_sub):
    """Single-segment decode (fresh carry).  Returns (L, K) symbols."""
    L = data.shape[0]
    init = (states.astype(jnp.uint32), jnp.zeros((L,), jnp.int32))
    out, _ = _decode_scan_carry(data, rows, cum_hl_sub, init)
    return out


class DeviceRansDecoder:
    """Device-side lane decoder: upload the (padded) lane byte streams
    once, then decode entirely on the device — the decoded symbols stay
    on-device for the following restore stages."""

    def __init__(self):
        self.cum_hl = None
        self._decode = jax.jit(_decode_scan)
        self._unpack = jax.jit(_unpack_static,
                               static_argnums=(1, 2, 3, 4))
        self._slice = jax.jit(_slice_rows, static_argnums=(2,))

    def decode_segment(self, stream_dev, meta, rows_lanes, row_base=0,
                       nr=None):
        """Unpack one segment from the single uploaded staging buffer and
        lane-decode it on the device.  row_base/nr select the CDF
        subtable exactly as the encoder did."""
        data, states = self._unpack(stream_dev, meta["states_off"],
                                    meta["data_off"], meta["L"],
                                    meta["MW"])
        if nr is None:
            nr = self.n_y_rows
        cum_sub, rows_local = self._slice(self.cum_hl, rows_lanes, nr,
                                          np.int32(row_base))
        return self._decode(data, states, rows_local, cum_sub)

    def set_tables(self, y_rows, z_rows):
        table = np.concatenate([y_rows, z_rows], axis=0)
        self.n_y_rows = y_rows.shape[0]
        self.cum_hl = jax.device_put(_split_hi_lo_bf16(table))

    def parse(self, stream):
        """Host-side v2 container parse -> padded numpy arrays ready for
        one H2D upload: (data (L,MW) int32 u16 words, states (L,) uint32,
        n, K)."""
        off = 0
        n = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
        L = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        K = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        lane_data = []
        states = np.zeros(L, np.uint32)
        for l in range(L):
            ln = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
            states[l] = np.frombuffer(stream, np.uint32, 1, off)[0]
            off += 4
            lane_data.append(np.frombuffer(stream, np.uint16, ln, off))
            off += 2 * ln
        # bucket the padded width so the decode scan compiles once per
        # bucket, not once per frame
        mw = max((d.size for d in lane_data), default=0) + 1
        mw = -(-mw // 128) * 128
        data = np.zeros((L, mw), np.int32)
        for l, d in enumerate(lane_data):
            data[l, :d.size] = d
        return data, states, n, K

    def decode(self, data_dev, states_dev, rows_lanes, K, row_base=0,
               nr=None):
        """rows_lanes: (L, K) int32 device array of row ids in original
        symbol order.  Returns (L, K) int32 device symbols."""
        if nr is None:
            nr = self.n_y_rows
        cum_sub, rows_local = self._slice(self.cum_hl, rows_lanes, nr,
                                          np.int32(row_base))
        return self._decode(data_dev, states_dev, rows_local, cum_sub)


# ---------------------------------------------------------------------------
# host decoder (vectorized across lanes; reference implementation)
# ---------------------------------------------------------------------------

def decode_device_stream(stream, rows_flat, table_rows):
    """Decode a v2 container (u16-renorm lanes).  rows_flat: (N,) int32
    row ids in symbol order (the decoder-side model supplies them);
    table_rows: (n, 257) full-range cumulative rows.  Returns int32
    symbols (N,)."""
    off = 0
    n = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
    L = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
    K = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2

    lane_data = []
    states = np.zeros(L, np.uint64)
    for l in range(L):
        ln = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        states[l] = np.frombuffer(stream, np.uint32, 1, off)[0]; off += 4
        lane_data.append(np.frombuffer(stream, np.uint16, ln, off))
        off += 2 * ln

    pad = L * K - n
    rows = np.concatenate([np.asarray(rows_flat, np.int64),
                           np.zeros(pad, np.int64)]).reshape(L, K)
    table = np.asarray(table_rows, np.int64)

    max_len = max((d.size for d in lane_data), default=0)
    data = np.zeros((L, max_len + 1), np.uint16)
    for l, d in enumerate(lane_data):
        data[l, :d.size] = d
    ptr = np.zeros(L, np.int64)

    out = np.zeros((L, K), np.int64)
    lane_ids = np.arange(L)
    for t in range(K):
        r = rows[:, t]
        cdf_rows = table[r]                       # (L, 257)
        f = (states & 0xFFFF).astype(np.int64)
        sym = (cdf_rows[:, 1:] <= f[:, None]).sum(axis=1)  # (L,)
        start = cdf_rows[lane_ids, sym]
        freq = cdf_rows[lane_ids, sym + 1] - start
        states = freq.astype(np.uint64) * (states >> np.uint64(16)) \
            + (states & np.uint64(0xFFFF)) - start.astype(np.uint64)
        need = states < (1 << 16)
        word = data[lane_ids, np.minimum(ptr, max_len)]
        states = np.where(need, (states << np.uint64(16))
                          | word.astype(np.uint64), states)
        ptr = ptr + need
        out[:, t] = sym - 128
    return out.reshape(-1)[:n].astype(np.int32)
