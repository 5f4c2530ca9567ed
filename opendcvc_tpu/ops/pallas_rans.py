"""Pallas TPU kernels for the device-side lane rANS scans.

The XLA lax.scan encoder (entropy/device_rans.py) is HBM-bound: every
step materializes (lanes, 257) temporaries for the bin selection, ~4 MB
of HBM traffic per symbol step (measured ~39 us/step, ~11 ms for a
1080p frame's 272 steps).  This kernel keeps the whole scan state —
rANS states, cursors, the staging buffer, and the per-step temporaries
— in VMEM, so each step touches only on-chip memory.

Layout: lanes ride the LANE dimension everywhere — per-lane scalars are
(1, L) rows, the staging buffer is (MW, L) — so nothing pays the 128x
padding of an (L, 1) layout and no relayouts occur in the hot loop.
The (row, bin) table lookup factors through the MXU as

    V = T_all (4*NR, 256) @ onehot_bin (256, L)     [bf16, f32 accum]

where T_all stacks [start_hi; start_lo; next_hi; next_lo] rows (each
value < 256, exactly representable in bf16), followed by four masked
SUBLANE reduces over NR rows selected by onehot_row — outputs stay
(1, L).

rANS states live as two int16-range int32 limbs (hi, lo), making the
32-bit state update exact in int32:

  renorm:  emit lane word lo when hi >= freq; state >>= 16
  encode:  q = state // freq, r = state % freq via two 8-bit long-
           division steps (all intermediates < 2^24)
           state' = q * 2^16 + (r + start)   [r + start < 2^16]

Encode order, symbol packing, and the staging layout are identical to
the XLA path (device_rans._encode_scan_carry), so the two paths emit
byte-identical streams; tests cross-check them.
"""

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas needs a capable backend at trace time
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

SUB = 8  # symbols per grid step (sublane block of the (K, L) inputs)

#: sentinel local row id for force_zero_thres-skipped symbols — the
#: kernels pass these through at zero rate (no emission, no state
#: change), mirroring device_rans.SKIP_ROW semantics.  Kept as a copy
#: (not an import) so the kernel module has no package-load
#: dependencies; test_device_rans cross-checks the two constants.
SKIP_ROW = 255

#: the PACKED encode operand carries rows in a 9-bit field (combined
#: per-frame tables can reach 256 rows — e.g. DMC's 128 y + 128 z —
#: where an 8-bit sentinel would collide with a real row id), so its
#: skip sentinel is the 9-bit maximum.
ENC_ROW_BITS = 9
ENC_ROW_MASK = (1 << ENC_ROW_BITS) - 1
ENC_SKIP = ENC_ROW_MASK


def _interpret():
    """OPENDCVC_TPU_PALLAS_INTERPRET=1 runs the kernels in the TPU
    Pallas interpreter — Mosaic has no CPU lowering, but interpret mode
    lets the CPU test gate exercise the kernel logic bit-for-bit.
    Returns an InterpretParams (truthy) or False (the plain bool enables
    the generic HLO interpreter, which lacks program_id on CPU)."""
    if os.environ.get("OPENDCVC_TPU_PALLAS_INTERPRET") in ("1", "true"):
        return pltpu.InterpretParams()
    return False


def _round_up(v, m):
    return (v + m - 1) // m * m


def _tables_from_cum(cum_hl):
    """cum_hl: (NR, 514) bf16 hi/lo split rows (device_rans layout) ->
    T_all (4*NRp, 256) bf16 stacking [start_hi; start_lo; next_hi;
    next_lo] (start = cum[:, b], next = cum[:, b+1])."""
    nr = cum_hl.shape[0]
    nrp = _round_up(nr, 8)
    hi = cum_hl[:, :257].astype(jnp.float32)
    lo = cum_hl[:, 257:].astype(jnp.float32)

    def pad(a):  # (NR, 256) -> (NRp, 256)
        return jnp.pad(a, ((0, nrp - nr), (0, 0)))

    t = jnp.concatenate([pad(hi[:, :256]), pad(lo[:, :256]),
                         pad(hi[:, 1:257]), pad(lo[:, 1:257])])
    return t.astype(jnp.bfloat16), nrp


def _enc_kernel(packed_ref, t_ref,
                buf_ref, lens_ref, shi_ref, slo_ref,
                hi_s, lo_s, cur_s, buf_s, *, k_total, lanes, nrp, mwp):
    """Grid step g processes SUB symbols (sublane rows g*SUB..g*SUB+7)
    for every lane.  The single data operand is PACKED — (sym+128) << 8
    | local_row — halving the custom call's operand materialization vs
    separate sym/row arrays.  row == SKIP_ROW is a zero-rate
    passthrough (state/cursor/staging untouched), mirroring
    device_rans._encode_scan_carry's force_zero_thres skip lanes.
    Scratch (persisting across the sequential grid): hi/lo/cur (1, L)
    int32; buf (mwp, L) int32."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        hi_s[:, :] = jnp.ones((1, lanes), jnp.int32)
        lo_s[:, :] = jnp.zeros((1, lanes), jnp.int32)
        cur_s[:, :] = jnp.zeros((1, lanes), jnp.int32)
        buf_s[:, :] = jnp.zeros((mwp, lanes), jnp.int32)

    bins = jax.lax.broadcasted_iota(jnp.int32, (256, lanes), 0)
    nrs = jax.lax.broadcasted_iota(jnp.int32, (nrp, lanes), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mwp, lanes), 0)
    subs = jax.lax.broadcasted_iota(jnp.int32, (SUB, lanes), 0)

    packed_blk = packed_ref[:, :]         # (SUB, L) int32 sym<<8 | row
    t_all = t_ref[:, :]                   # (4*NRp, 256) bf16

    def body(j, carry):
        hi, lo, cur, buf = carry
        valid = pl.program_id(0) * SUB + j < k_total
        jsel = subs == j
        pk = jnp.sum(jnp.where(jsel, packed_blk, 0), axis=0,
                     keepdims=True)
        s = pk >> ENC_ROW_BITS                           # in [0, 256)
        r = pk & ENC_ROW_MASK                            # local row id
        keep = jnp.logical_and(valid, r != ENC_SKIP)     # (1, L)

        onehot_b = (bins == s).astype(jnp.bfloat16)      # (256, L)
        onehot_r = nrs == r                              # (NRp, L)

        v = jax.lax.dot_general(
            t_all, onehot_b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (4*NRp, L)

        def pick(block):
            sel = jnp.where(onehot_r,
                            v[block * nrp:(block + 1) * nrp, :], 0.0)
            return jnp.sum(sel, axis=0, keepdims=True)   # (1, L) f32

        start = (pick(0) * 256.0 + pick(1)).astype(jnp.int32)
        nxt = (pick(2) * 256.0 + pick(3)).astype(jnp.int32)
        freq = jnp.maximum(nxt - start, 1)

        # renorm: state = hi*2^16 + lo; emit low 16 bits when hi >= freq
        emit = (hi >= freq) & keep
        word = lo
        lo = jnp.where(emit, hi, lo)
        hi = jnp.where(emit, 0, hi)

        # staging write (cursor strictly increases: add == set); rows
        # broadcast along sublanes of the (mwp, L) buffer
        oh = (cols == cur) & emit
        buf = buf + jnp.where(oh, word, 0)
        cur = cur + emit.astype(jnp.int32)

        # encode: q = state // freq, rem = state % freq by 8-bit limbs
        u = hi * 256 + (lo >> 8)                         # < 2^24
        q1 = u // freq
        r1 = u - q1 * freq
        v2 = r1 * 256 + (lo & 255)                       # < 2^24
        q2 = v2 // freq
        rem = v2 - q2 * freq
        q = q1 * 256 + q2
        hi0, lo0, _, _ = carry
        return (jnp.where(keep, q, hi0),
                jnp.where(keep, rem + start, lo0),
                cur, buf)

    hi, lo, cur, buf = jax.lax.fori_loop(
        0, SUB, body,
        (hi_s[:, :], lo_s[:, :], cur_s[:, :], buf_s[:, :]))
    hi_s[:, :] = hi
    lo_s[:, :] = lo
    cur_s[:, :] = cur
    buf_s[:, :] = buf

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        buf_ref[:, :] = buf_s[:, :]
        lens_ref[:, :] = cur_s[:, :]
        shi_ref[:, :] = hi_s[:, :]
        slo_ref[:, :] = lo_s[:, :]


@functools.partial(jax.jit, static_argnums=(2,))
def encode_scan_pallas_packed(packed_t, cum_hl, mw):
    """Pallas encode scan over ONE combined segment, packed operand.

    packed_t: (K, L) int32 with (sym+128) << ENC_ROW_BITS | local_row,
    step-major (encode order along axis 0 — the kernel's native layout:
    steps on sublanes, lanes on lanes); local_row == ENC_SKIP rides
    through at zero rate; cum_hl: (NR, 514) bf16 hi/lo rows; mw:
    staging width.  Returns (buf (L, mw) uint16 emit-order staging,
    lens (L,) int32, states (L,) uint32) — bit-identical to
    device_rans._encode_scan_carry from a fresh carry."""
    K, L = packed_t.shape
    assert cum_hl.shape[0] < ENC_SKIP, \
        "local row ids must stay below the ENC_SKIP sentinel"
    mwp = _round_up(mw, 8)
    kp = _round_up(K, SUB)
    t_all, nrp = _tables_from_cum(cum_hl)
    # pad steps ride the skip sentinel: zero-rate passthrough
    pad_val = jnp.int32((128 << ENC_ROW_BITS) | ENC_SKIP)
    packed_t = jnp.pad(packed_t.astype(jnp.int32),
                       ((0, kp - K), (0, 0)), constant_values=pad_val)
    n_steps = kp // SUB

    buf, lens, shi, slo = pl.pallas_call(
        functools.partial(_enc_kernel, k_total=K, lanes=L, nrp=nrp,
                          mwp=mwp),
        grid=(n_steps,),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((SUB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * nrp, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mwp, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mwp, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((mwp, L), jnp.int32),
        ],
    )(packed_t, t_all)

    states = (shi[0].astype(jnp.uint32) << 16) | slo[0].astype(jnp.uint32)
    return buf[:mw].T.astype(jnp.uint16), lens[0], states


def encode_scan_pallas(sym_t, rows_t, cum_hl, mw):
    """Convenience wrapper: separate sym/row operands -> packed form.
    rows use the 8-bit SKIP_ROW (255) sentinel convention of the XLA
    scans, so the table must stay below 255 rows for 255 to be
    unambiguous; callers with larger combined tables pack ENC_SKIP
    themselves (see models/dmc._compress_frame_core)."""
    assert cum_hl.shape[0] < SKIP_ROW
    rows9 = jnp.where(rows_t == SKIP_ROW, ENC_SKIP,
                      rows_t.astype(jnp.int32))
    packed = ((sym_t.astype(jnp.int32) + 128) << ENC_ROW_BITS) | rows9
    return encode_scan_pallas_packed(packed, cum_hl, mw)


def _dec_kernel(rows_ref, data_ref, t_ref, shi_ref, slo_ref, ptr_ref,
                sym_ref, ohi_ref, olo_ref, optr_ref,
                hi_s, lo_s, ptr_s, *, k_total, lanes, nrp, mwp):
    """Decode grid step: SUB symbols per lane.  The full cumulative row
    is fetched transposed — U = [T_hi; T_lo] (2*264, NR) @ onehot_row
    (NR, L) — bins on sublanes, so the symbol search (count of bins <=
    f), start (max of bins <= f) and next (min of bins > f) are three
    sublane reduces.  State rides as (hi, lo) int32 limbs; the state
    update freq*hi + (lo - start) is carried out in 8-bit limb products
    so every intermediate stays below 2^25."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        hi_s[:, :] = shi_ref[:, :]
        lo_s[:, :] = slo_ref[:, :]
        ptr_s[:, :] = ptr_ref[:, :]

    nrs = jax.lax.broadcasted_iota(jnp.int32, (nrp, lanes), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mwp, lanes), 0)
    subs = jax.lax.broadcasted_iota(jnp.int32, (SUB, lanes), 0)
    bin_rows = jax.lax.broadcasted_iota(jnp.int32, (264, lanes), 0)
    pad_row = bin_rows >= 257

    rows_blk = rows_ref[:, :]
    data = data_ref[:, :]
    t_all = t_ref[:, :]          # (2*264, NRp) bf16: [U_hi; U_lo]
    big = jnp.int32(1 << 17)

    def body(j, carry):
        hi, lo, ptr, out = carry
        valid = pl.program_id(0) * SUB + j < k_total
        jsel = subs == j
        r = jnp.sum(jnp.where(jsel, rows_blk, 0), axis=0, keepdims=True)
        # SKIP_ROW: zero-rate passthrough — decode 0, state/ptr untouched
        keep = jnp.logical_and(valid, r != SKIP_ROW)     # (1, L)
        onehot_r = (nrs == r).astype(jnp.bfloat16)       # (NRp, L)

        u = jax.lax.dot_general(
            t_all, onehot_r,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (528, L)
        cum = (u[:264, :] * 256.0 + u[264:, :]).astype(jnp.int32)
        cum = jnp.where(pad_row, big, cum)               # (264, L)

        f = lo                                           # (1, L)
        le = cum <= f                                    # (264, L)
        sym = jnp.sum(le.astype(jnp.int32), axis=0,
                      keepdims=True) - 1                 # (1, L)
        start = jnp.max(jnp.where(le, cum, 0), axis=0, keepdims=True)
        nxt = jnp.min(jnp.where(le, big, cum), axis=0, keepdims=True)
        freq = jnp.maximum(nxt - start, 1)

        # state' = freq * (state >> 16) + f - start, in 8-bit limbs
        d = lo - start                                   # in [0, freq)
        p1 = freq * (hi >> 8)                            # < 2^24
        p2 = freq * (hi & 255)                           # < 2^24
        low_part = (p1 & 255) * 256 + p2 + d             # < 2^25
        nhi = (p1 >> 8) + (low_part >> 16)
        nlo = low_part & 0xFFFF

        # renorm: pull one u16 word when state < 2^16
        need = nhi == 0
        word = jnp.sum(jnp.where(cols == ptr, data, 0), axis=0,
                       keepdims=True)                    # (1, L)
        hi2 = jnp.where(need, nlo, nhi)
        lo2 = jnp.where(need, word, nlo)
        ptr2 = ptr + need.astype(jnp.int32)

        skip = jnp.logical_not(keep)
        out2 = jnp.where(jsel & valid,
                         jnp.where(skip, 0, sym - 128), out)
        hi0, lo0, ptr0, _ = carry
        return (jnp.where(keep, hi2, hi0),
                jnp.where(keep, lo2, lo0),
                jnp.where(keep, ptr2, ptr0),
                out2)

    hi, lo, ptr, out = jax.lax.fori_loop(
        0, SUB, body,
        (hi_s[:, :], lo_s[:, :], ptr_s[:, :],
         jnp.zeros((SUB, lanes), jnp.int32)))
    hi_s[:, :] = hi
    lo_s[:, :] = lo
    ptr_s[:, :] = ptr
    sym_ref[:, :] = out

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        ohi_ref[:, :] = hi_s[:, :]
        olo_ref[:, :] = lo_s[:, :]
        optr_ref[:, :] = ptr_s[:, :]


def _dec_tables_from_cum(cum_hl):
    """(NR, 514) bf16 hi/lo rows -> T_all (2*264, NRp) bf16 stacking
    the TRANSPOSED hi and lo tables (bins on sublanes, rows on lanes),
    bins padded 257 -> 264."""
    nr = cum_hl.shape[0]
    nrp = _round_up(nr, 128)
    hi = cum_hl[:, :257].astype(jnp.float32).T   # (257, NR)
    lo = cum_hl[:, 257:].astype(jnp.float32).T

    def pad(a):
        return jnp.pad(a, ((0, 264 - 257), (0, nrp - nr)))

    return (jnp.concatenate([pad(hi), pad(lo)]).astype(jnp.bfloat16),
            nrp)


@functools.partial(jax.jit, static_argnums=(2,))
def decode_scan_pallas(data, rows_t, k_total, cum_hl, state, ptr):
    """Pallas decode scan over one segment with carry.

    data: (L, MW) int32 u16 words (decode order); rows_t: (K, L) int32
    LOCAL row ids, step-major (decode order along axis 0); cum_hl:
    (NR, 514) bf16; state: (L,) uint32; ptr: (L,) int32.  Returns
    (symbols (K, L) int32 in [-128, 127] step-major, state', ptr') —
    bit-identical to device_rans._decode_scan_carry."""
    L, MW = data.shape
    K = k_total
    assert cum_hl.shape[0] < SKIP_ROW, \
        "local row ids must stay below the SKIP_ROW sentinel"
    mwp = _round_up(MW, 8)
    kp = _round_up(K, SUB)
    t_all, nrp = _dec_tables_from_cum(cum_hl)
    rows_t = jnp.pad(rows_t.astype(jnp.int32), ((0, kp - K), (0, 0)),
                     constant_values=SKIP_ROW)
    data_t = jnp.pad(data.astype(jnp.int32).T, ((0, mwp - MW), (0, 0)))
    shi = (state >> 16).astype(jnp.int32)[None, :]
    slo = (state & 0xFFFF).astype(jnp.int32)[None, :]
    ptr2 = ptr.astype(jnp.int32)[None, :]
    n_steps = kp // SUB

    syms, ohi, olo, optr = pl.pallas_call(
        functools.partial(_dec_kernel, k_total=K, lanes=L, nrp=nrp,
                          mwp=mwp),
        grid=(n_steps,),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((SUB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mwp, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * 264, nrp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
            jax.ShapeDtypeStruct((1, L), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
            pltpu.VMEM((1, L), jnp.int32),
        ],
    )(rows_t, data_t, t_all, shi, slo, ptr2)

    state_out = (ohi[0].astype(jnp.uint32) << 16) \
        | olo[0].astype(jnp.uint32)
    return syms[:K], state_out, optr[0]
