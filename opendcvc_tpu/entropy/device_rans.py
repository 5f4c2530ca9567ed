"""Device-side entropy coding: wide-interleaved rANS on the TPU.

The classic pipeline ships ~2 bytes/symbol of packed symbols to the host
and runs rANS there; on remote/tunneled devices the transfer dominates
the frame time.  This module encodes ON the device instead, as L
independent rANS lanes advanced in lockstep by a `lax.scan` (the VPU
processes all lanes per step), so only the compressed bytes (plus per-
lane lengths and final states) cross device->host.

Format ("tpu-lane" v2, self-contained, NOT the reference byte format):
  * symbols are coded against full-range 256-bin CDFs (no escape/bypass:
    every bin has frequency >= 1, precision 16) derived from the same
    probability models as the host tables;
  * the symbol sequence is split contiguously into L lanes, padded to
    lane length K with (symbol 0, cdf row 0);
  * serialized stream: u32 N | u16 L | u16 K | per lane: u16 len |
    u32 state | len data bytes (in decode order).

A vectorized numpy decoder (all lanes in lockstep) provides the host
decode path and the roundtrip tests; a native lane decoder can replace
it later.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


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
    n = cdfs.shape[0]
    out = np.zeros((n, 257), np.int64)
    for i in range(n):
        sz = int(sizes[i])
        n_sym = sz - 2            # in-range symbols (last bin = escape)
        off = int(offsets[i])     # symbol value of bin 0
        freqs = np.ones(256, np.int64)
        in_f = cdfs[i, 1:n_sym + 1] - cdfs[i, :n_sym]
        lo = off + 128            # bin index of first in-range symbol
        freqs[lo:lo + n_sym] = np.maximum(in_f, 1)
        excess = int(freqs.sum()) - (1 << 16)
        # absorb the excess in the largest bin (it is >> excess)
        j = int(np.argmax(freqs))
        assert freqs[j] - excess >= 1, "cannot normalize full-range cdf"
        freqs[j] -= excess
        out[i, 1:] = np.cumsum(freqs)
    assert np.all(out[:, -1] == (1 << 16))
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# device encoder
# ---------------------------------------------------------------------------

def _encode_scan(symbols, rows, starts_tab, freqs_tab, lanes, max_bytes):
    """symbols: (L, K) int32 in [-128,127], reversed (last symbol first);
    rows: (L, K) int32 cdf-row ids.  Returns (buf, lens, states)."""
    L, K = symbols.shape
    lane_ids = jnp.arange(L)

    def body(carry, t):
        state, cursors, buf = carry
        s = symbols[:, t] + 128
        r = rows[:, t]
        start = starts_tab[r, s].astype(jnp.uint32)
        freq = freqs_tab[r, s].astype(jnp.uint32)
        x_max = freq << 15
        for _ in range(3):  # renorm emits at most 3 bytes (freq >= 1)
            cond = state >= x_max
            byte = (state & 0xFF).astype(jnp.uint8)
            pos = jnp.where(cond, cursors, max_bytes)
            buf = buf.at[lane_ids, pos].set(byte, mode="drop")
            state = jnp.where(cond, state >> 8, state)
            cursors = cursors + cond.astype(jnp.int32)
        state = ((state // freq) << 16) + (state % freq) + start
        return (state, cursors, buf), None

    init = (jnp.full((L,), 1 << 23, jnp.uint32),
            jnp.zeros((L,), jnp.int32),
            jnp.zeros((L, max_bytes), jnp.uint8))
    (state, cursors, buf), _ = lax.scan(body, init, jnp.arange(K))
    return buf, cursors, state


class DeviceRansEncoder:
    """Holds device-side full-range CDF tables and the jitted lane
    encoder.  Table layout: rows [0..n_y) = gaussian scale rows, rows
    [n_y..) = z rows (row = n_y + qp*C + channel)."""

    def __init__(self, lanes=512, bytes_per_symbol=0.75):
        self.lanes = lanes
        self.bytes_per_symbol = bytes_per_symbol
        self.starts = None
        self.freqs = None
        self.n_y_rows = 0
        self._encode = jax.jit(_encode_scan, static_argnums=(4, 5))

    def set_tables(self, y_rows, z_rows):
        """y_rows/z_rows: (n, 257) int32 full-range cumulative rows."""
        table = np.concatenate([y_rows, z_rows], axis=0)
        self.n_y_rows = y_rows.shape[0]
        starts = table[:, :256]
        freqs = table[:, 1:] - table[:, :256]
        self.starts = jnp.asarray(starts, jnp.int32)
        self.freqs = jnp.asarray(freqs, jnp.int32)

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

    def encode(self, symbols_lanes, rows_lanes, bytes_per_symbol=None):
        """Runs the scan encoder; returns device arrays
        (buf, lens, states)."""
        L, K = symbols_lanes.shape
        bps = bytes_per_symbol or self.bytes_per_symbol
        max_bytes = max(64, int(K * bps)) + 8
        return self._encode(symbols_lanes, rows_lanes, self.starts,
                            self.freqs, self.lanes, max_bytes)

    def serialize(self, buf_np, lens_np, states_np, n_symbols):
        """Assemble the v2 container from fetched arrays."""
        L, MB = buf_np.shape
        K = -(-n_symbols // L)
        if int(lens_np.max()) >= MB - 4:
            raise OverflowError("device rANS lane buffer overflow")
        parts = [np.uint32(n_symbols).tobytes(),
                 np.uint16(L).tobytes(), np.uint16(K).tobytes()]
        for l in range(L):
            ln = int(lens_np[l])
            parts.append(np.uint16(ln).tobytes())
            parts.append(np.uint32(states_np[l]).tobytes())
            parts.append(buf_np[l, :ln][::-1].tobytes())
        return b"".join(parts)


# ---------------------------------------------------------------------------
# frame container (v3): all segments in one buffer, vectorized host side,
# device-side unpacking — one H2D per frame on decode
# ---------------------------------------------------------------------------

def serialize_frame(segments):
    """segments: list of (buf_np (L,MB) uint8, lens_np (L,), states_np
    (L,), n_symbols, K).  Layout:
      u8 n_seg | per seg: u32 n, u16 L, u16 K, u32 data_len |
      lens_all u16 | states_all u32 | data (lane-major, decode order)
    Raises OverflowError if any lane hit its staging buffer."""
    head = [np.uint8(len(segments)).tobytes()]
    lens_parts, states_parts, data_parts = [], [], []
    for buf, lens, states, n, K in segments:
        L, MB = buf.shape
        if int(lens.max(initial=0)) >= MB - 4:
            raise OverflowError("device rANS lane buffer overflow")
        lens16 = lens.astype(np.uint16)
        # decode-order bytes per lane = reversed emitted prefix
        buf_rev = buf[:, ::-1]
        mask = np.arange(MB)[None, :] >= (MB - lens[:, None])
        data = buf_rev[mask]  # 1D, lane-major
        head.append(np.uint32(n).tobytes())
        head.append(np.uint16(L).tobytes())
        head.append(np.uint16(K).tobytes())
        # the encoder's static staging width: the decoder reuses it as
        # its (static) gather width so decode graphs compile once per
        # lane configuration, never per frame
        head.append(np.uint16(MB).tobytes())
        head.append(np.uint32(data.size).tobytes())
        lens_parts.append(lens16.tobytes())
        states_parts.append(states.astype(np.uint32).tobytes())
        data_parts.append(data.tobytes())
    return b"".join(head + lens_parts + states_parts + data_parts)


def parse_frame(stream):
    """Vectorized parse of the v3 container.  Returns (metas, stream_np):
    metas carry static shape info plus the STATIC byte offsets of each
    segment's lens/states tables and a per-frame data offset; stream_np
    is the whole container (bucket-padded) for ONE device upload — the
    device derives lens/states itself via byte gathers."""
    n_seg = stream[0]
    off = 1
    metas = []
    for _ in range(n_seg):
        n = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
        L = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        K = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        mb = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        dlen = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
        metas.append({"n": n, "L": L, "K": K, "MB": mb, "dlen": dlen})
    for m in metas:
        m["lens_off"] = off
        off += 2 * m["L"]
    for m in metas:
        m["states_off"] = off
        off += 4 * m["L"]
    data_off = off
    for m in metas:
        m["data_off"] = data_off
        data_off += m["dlen"]
    buf = np.frombuffer(stream, np.uint8)
    # pad the upload to the STATIC capacity implied by the header (lane
    # config + staging widths), so every decode graph is shape-stable
    # across frames
    capacity = off + sum(m["L"] * m["MB"] for m in metas)
    stream_np = np.zeros(capacity, np.uint8)
    stream_np[:buf.size] = buf
    return metas, stream_np


def _read_u16_vec(buf, off, n):
    base = off + 2 * jnp.arange(n)
    return buf[base].astype(jnp.int32) | \
        (buf[base + 1].astype(jnp.int32) << 8)


def _read_u32_vec(buf, off, n):
    base = off + 4 * jnp.arange(n)
    v = buf[base].astype(jnp.uint32)
    v |= buf[base + 1].astype(jnp.uint32) << 8
    v |= buf[base + 2].astype(jnp.uint32) << 16
    v |= buf[base + 3].astype(jnp.uint32) << 24
    return v


def _unpack_segment(stream, lens_off, states_off, data_off, L, MB):
    """jit: derive lens/states from the uploaded container and gather the
    segment's lane bytes into (L, MB).  lens_off/states_off static;
    data_off traced scalar."""
    lens = _read_u16_vec(stream, lens_off, L)
    states = _read_u32_vec(stream, states_off, L)
    lane_off = data_off + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens)[:-1]])
    idx = lane_off[:, None] + jnp.arange(MB)[None, :]
    idx = jnp.clip(idx, 0, stream.shape[0] - 1)
    return stream[idx], states


# ---------------------------------------------------------------------------
# device decoder (lax.scan, binary search over full-range rows)
# ---------------------------------------------------------------------------

def _decode_scan(data, states, rows, cum_tab, K):
    """data: (L, MB) uint8 lane byte streams in decode order;
    states: (L,) uint32 initial states; rows: (L, K) int32 row ids in
    decode (original) order; cum_tab: (n, 257) int32.
    Returns (L, K) int32 symbols in [-128, 127]."""
    L = data.shape[0]
    mb = data.shape[1]
    lane_ids = jnp.arange(L)

    def body(carry, t):
        state, ptr = carry
        r = rows[:, t]
        f = (state & 0xFFFF).astype(jnp.int32)
        # binary search: largest s in [0,255] with cum[r, s] <= f
        lo = jnp.zeros((L,), jnp.int32)
        hi = jnp.full((L,), 256, jnp.int32)
        for _ in range(8):
            mid = (lo + hi + 1) >> 1
            cm = cum_tab[r, mid]
            go = cm <= f
            lo = jnp.where(go, mid, lo)
            hi = jnp.where(go, hi, mid - 1)
        sym = lo
        start = cum_tab[r, sym].astype(jnp.uint32)
        freq = (cum_tab[r, sym + 1] - cum_tab[r, sym]).astype(jnp.uint32)
        state = freq * (state >> 16) + f.astype(jnp.uint32) - start
        for _ in range(3):
            need = state < (1 << 23)
            byte = data[lane_ids, jnp.minimum(ptr, mb - 1)]
            state = jnp.where(need,
                              (state << 8) | byte.astype(jnp.uint32),
                              state)
            ptr = ptr + need.astype(jnp.int32)
        return (state, ptr), sym - 128

    init = (states.astype(jnp.uint32), jnp.zeros((L,), jnp.int32))
    _, out = lax.scan(body, init, jnp.arange(K))
    return out.T  # (L, K)


class DeviceRansDecoder:
    """Device-side lane decoder: upload the (padded) lane byte streams
    once, then decode entirely on the device — the decoded symbols stay
    on-device for the following restore stages."""

    def __init__(self):
        self.cum = None
        self._decode = jax.jit(_decode_scan, static_argnums=(4,))
        self._unpack = jax.jit(_unpack_segment,
                               static_argnums=(1, 2, 4, 5))

    def decode_segment(self, stream_dev, meta, rows_lanes):
        """Unpack one segment from the single uploaded container and
        lane-decode it on the device."""
        data, states = self._unpack(stream_dev, meta["lens_off"],
                                    meta["states_off"],
                                    np.int32(meta["data_off"]), meta["L"],
                                    meta["MB"])
        return self._decode(data, states, rows_lanes, self.cum, meta["K"])

    def set_tables(self, y_rows, z_rows):
        table = np.concatenate([y_rows, z_rows], axis=0)
        self.cum = jnp.asarray(table, jnp.int32)

    def parse(self, stream):
        """Host-side container parse -> padded numpy arrays ready for one
        H2D upload: (data (L,MB) uint8, states (L,) uint32, n, K)."""
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
            lane_data.append(np.frombuffer(stream, np.uint8, ln, off))
            off += ln
        # bucket the padded width so the decode scan compiles once per
        # bucket, not once per frame
        mb = max((d.size for d in lane_data), default=0) + 1
        mb = -(-mb // 256) * 256
        data = np.zeros((L, mb), np.uint8)
        for l, d in enumerate(lane_data):
            data[l, :d.size] = d
        return data, states, n, K

    def decode(self, data_dev, states_dev, rows_lanes, K):
        """rows_lanes: (L, K) int32 device array of row ids in original
        symbol order.  Returns (L, K) int32 device symbols."""
        return self._decode(data_dev, states_dev, rows_lanes, self.cum, K)


# ---------------------------------------------------------------------------
# host decoder (vectorized across lanes; reference implementation)
# ---------------------------------------------------------------------------

def decode_device_stream(stream, rows_flat, table_rows):
    """Decode a v2 container.  rows_flat: (N,) int32 row ids in symbol
    order (the decoder-side model supplies them); table_rows: (n, 257)
    full-range cumulative rows.  Returns int32 symbols (N,)."""
    off = 0
    n = int(np.frombuffer(stream, np.uint32, 1, off)[0]); off += 4
    L = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
    K = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2

    lane_data = []
    states = np.zeros(L, np.uint64)
    for l in range(L):
        ln = int(np.frombuffer(stream, np.uint16, 1, off)[0]); off += 2
        states[l] = np.frombuffer(stream, np.uint32, 1, off)[0]; off += 4
        lane_data.append(np.frombuffer(stream, np.uint8, ln, off))
        off += ln

    pad = L * K - n
    rows = np.concatenate([np.asarray(rows_flat, np.int64),
                           np.zeros(pad, np.int64)]).reshape(L, K)
    table = np.asarray(table_rows, np.int64)

    max_len = max((d.size for d in lane_data), default=0)
    data = np.zeros((L, max_len + 1), np.uint8)
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
        for _ in range(3):
            need = states < (1 << 23)
            byte = data[lane_ids, np.minimum(ptr, max_len)]
            states = np.where(need, (states << np.uint64(8))
                              | byte.astype(np.uint64), states)
            ptr = ptr + need
        out[:, t] = sym - 128
    return out.reshape(-1)[:n].astype(np.int32)
