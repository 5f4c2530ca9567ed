"""Device-side (wide-interleaved lane) rANS: roundtrip vs the host
reference decoder, full-range CDF construction, DMC integration."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.entropy.device_rans import (
    DeviceRansEncoder, full_range_cdf_rows, decode_device_stream)
from tests.test_rans import make_gaussian_cdfs


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(0)
    cdfs, sizes, offsets = make_gaussian_cdfs(16, rng)
    rows = full_range_cdf_rows(cdfs, sizes, offsets)
    return rows


def test_full_range_rows(tables):
    rows = tables
    assert rows.shape == (16, 257)
    freqs = rows[:, 1:] - rows[:, :-1]
    assert np.all(freqs >= 1)
    assert np.all(rows[:, -1] == 1 << 16)
    assert np.all(rows[:, 0] == 0)


@pytest.mark.parametrize("n,lanes", [(1000, 8), (5000, 64), (333, 16)])
def test_device_encode_host_decode(tables, n, lanes):
    rows_tab = tables
    rng = np.random.default_rng(n)
    sym = rng.integers(-40, 41, n).astype(np.int32)
    row_ids = rng.integers(0, 16, n).astype(np.int32)

    enc = DeviceRansEncoder(lanes=lanes, bytes_per_symbol=3.0)
    enc.set_tables(rows_tab, rows_tab[:1])  # second table unused here
    sym_l, row_l = enc.encode_jit_args(jnp.asarray(sym),
                                       jnp.asarray(row_ids))
    buf, lens, states = enc.encode(sym_l, row_l)
    stream = enc.serialize(np.asarray(buf), np.asarray(lens),
                           np.asarray(states), n)
    assert len(stream) > 0

    decoded = decode_device_stream(stream, row_ids, rows_tab)
    np.testing.assert_array_equal(decoded, sym)


def test_device_decode_matches(tables):
    """Device lane decoder reproduces the encoded symbols on-device."""
    import jax.numpy as jnp2
    from opendcvc_tpu.entropy.device_rans import DeviceRansDecoder
    rows_tab = tables
    rng = np.random.default_rng(5)
    n, lanes = 2000, 32
    sym = rng.integers(-30, 31, n).astype(np.int32)
    row_ids = rng.integers(0, 16, n).astype(np.int32)

    enc = DeviceRansEncoder(lanes=lanes, bytes_per_symbol=3.0)
    enc.set_tables(rows_tab, rows_tab[:1])
    sym_l, row_l = enc.encode_jit_args(jnp.asarray(sym),
                                       jnp.asarray(row_ids))
    buf, lens, states = enc.encode(sym_l, row_l)
    stream = enc.serialize(np.asarray(buf), np.asarray(lens),
                           np.asarray(states), n)

    dec = DeviceRansDecoder()
    dec.set_tables(rows_tab, rows_tab[:1])
    data, st, n2, K = dec.parse(stream)
    assert n2 == n
    pad = lanes * K - n
    rows_dec = np.concatenate([row_ids,
                               np.zeros(pad, np.int32)]).reshape(lanes, K)
    out = dec.decode(jnp2.asarray(data), jnp2.asarray(st),
                     jnp2.asarray(rows_dec), K)
    decoded = np.asarray(out).reshape(-1)[:n]
    np.testing.assert_array_equal(decoded, sym)


def test_undensify_device_inverts_densify():
    """Device-side lane re-expansion must invert densify_segment."""
    import jax
    from opendcvc_tpu.entropy.device_rans import (densify_segment,
                                                  _undensify_device)
    rng = np.random.default_rng(7)
    L, MW, cap = 16, 12, 96
    lens = rng.integers(0, MW - 2, L).astype(np.int32)
    while lens.sum() > cap:
        lens = rng.integers(0, MW - 2, L).astype(np.int32)
    buf = np.zeros((L, MW), np.int32)
    for l in range(L):
        buf[l, :lens[l]] = rng.integers(0, 1 << 16, lens[l])
    states = rng.integers(1 << 16, 1 << 32, L, dtype=np.uint64) \
        .astype(np.uint32)
    packed = densify_segment(jnp.asarray(buf), jnp.asarray(lens),
                             jnp.asarray(states), cap)
    data, st = jax.jit(_undensify_device,
                       static_argnums=(1, 2, 3))(packed, cap, L, MW)
    np.testing.assert_array_equal(np.asarray(st), states)
    data = np.asarray(data)
    for l in range(L):
        # dense words are stored in decode order; staging was emitted
        # in encode order -> the rectangle holds the reversed prefix
        np.testing.assert_array_equal(data[l, :lens[l]],
                                      buf[l, :lens[l]][::-1])
        assert np.all(data[l, lens[l]:] == 0)


def test_parse_frame_rejects_unknown_magic():
    from opendcvc_tpu.entropy.device_rans import parse_frame
    with pytest.raises(ValueError, match="magic"):
        parse_frame(b"\x01" + b"\x00" * 32)


@pytest.mark.slow
def test_dmc_gop_roundtrip_matches_single():
    """GOP-batched megastages must produce the SAME per-frame bit
    streams as the single-frame megastage path, and decode them to the
    same frames both batched and frame-by-frame (the overflow re-run
    path depends on single/GOP interchangeability)."""
    from opendcvc_tpu.models.dmc import DMC
    os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1"
    try:
        rng = np.random.default_rng(11)
        x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        frames = []
        prev = np.asarray(x0)
        for _ in range(4):
            prev = np.clip(prev + rng.normal(0, 0.02, prev.shape)
                           .astype(np.float32), 0, 1)
            frames.append(jnp.asarray(prev))
        qps = [21, 29, 25, 29]

        def fresh(seed_params):
            net = DMC()
            if seed_params is None:
                net.init_params(seed=0)
            else:
                net.load_params(seed_params)
            net.update()
            net.clear_dpb()
            net.set_curr_poc(0)
            net.add_ref_frame(None, x0)
            return net

        enc = fresh(None)
        s_single = [enc.compress(x, q)["bit_stream"]
                    for x, q in zip(frames, qps)]

        enc2 = fresh(enc.params)
        s_first = enc2.compress(frames[0], qps[0])["bit_stream"]
        s_gop = enc2.compress_gop(frames[1:], qps[1:])["bit_streams"]
        assert s_first == s_single[0]
        for a, b in zip(s_gop, s_single[1:]):
            assert a == b
        np.testing.assert_array_equal(
            np.asarray(enc.dpb[0].feature, np.float32),
            np.asarray(enc2.dpb[0].feature, np.float32))

        sps = {"sps_id": 0, "height": 64, "width": 64, "ec_part": 0,
               "use_ada_i": 0}
        dec1 = fresh(enc.params)
        outs_single = [np.asarray(dec1.decompress(s, sps, q)["x_hat"])
                       for s, q in zip(s_single, qps)]
        dec2 = fresh(enc.params)
        dec2.decompress(s_single[0], sps, qps[0])
        out_gop = dec2.decompress_gop(s_single[1:], sps, qps[1:])
        x_hats = np.asarray(out_gop["x_hat"])
        for i in range(3):
            np.testing.assert_array_equal(x_hats[i],
                                          outs_single[i + 1])
        np.testing.assert_array_equal(
            np.asarray(dec1.dpb[0].feature, np.float32),
            np.asarray(dec2.dpb[0].feature, np.float32))
        # the temporal-chain contract across enc/dec
        np.testing.assert_array_equal(
            np.asarray(enc.dpb[0].feature, np.float32),
            np.asarray(dec1.dpb[0].feature, np.float32))
    finally:
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"


@pytest.mark.slow
def test_dmc_device_ec_roundtrip_matches_classic():
    """Device-EC compress+decompress must reproduce exactly the frames
    the classic host-rANS path produces (same symbols, different
    container)."""
    from opendcvc_tpu.models.dmc import DMC
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    x1 = jnp.asarray(np.clip(np.asarray(x0)
                             + rng.normal(0, 0.02, (1, 64, 64, 3))
                             .astype(np.float32), 0, 1))

    def run(device_ec):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        try:
            enc = DMC()
            enc.init_params(seed=0)
            enc.update()
            enc.clear_dpb()
            enc.set_curr_poc(0)
            enc.add_ref_frame(None, x0)
            s1 = enc.compress(x1, 21)["bit_stream"]
            s2 = enc.compress(x1, 25)["bit_stream"]

            dec = DMC()
            dec.load_params(enc.params)
            dec.update()
            dec.clear_dpb()
            dec.set_curr_poc(0)
            dec.add_ref_frame(None, x0)
            sps = {"sps_id": 0, "height": 64, "width": 64, "ec_part": 0,
                   "use_ada_i": 0}
            r1 = dec.decompress(s1, sps, 21)["x_hat"]
            r2 = dec.decompress(s2, sps, 25)["x_hat"]
            return np.asarray(r1), np.asarray(r2)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"

    d1, d2 = run(True)
    c1, c2 = run(False)
    np.testing.assert_array_equal(d1, c1)
    np.testing.assert_array_equal(d2, c2)


@pytest.mark.slow
def test_dmc_device_ec_skip_mode_matches_classic():
    """force_zero_thres in device-EC mode (SKIP_ROW zero-rate
    passthrough lanes) must reproduce exactly the frames the classic
    host path's skip mode produces, and the skip must actually save
    rate vs coding everything."""
    from opendcvc_tpu.models.dmc import DMC
    thres = 0.3
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    x1 = jnp.asarray(np.clip(np.asarray(x0)
                             + rng.normal(0, 0.02, (1, 64, 64, 3))
                             .astype(np.float32), 0, 1))

    def run(device_ec, fz):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        try:
            enc = DMC()
            enc.init_params(seed=0)
            enc.update(force_zero_thres=fz)
            enc.clear_dpb()
            enc.set_curr_poc(0)
            enc.add_ref_frame(None, x0)
            s1 = enc.compress(x1, 21)["bit_stream"]
            s2 = enc.compress(x1, 25)["bit_stream"]

            dec = DMC()
            dec.load_params(enc.params)
            dec.update(force_zero_thres=fz)
            dec.clear_dpb()
            dec.set_curr_poc(0)
            dec.add_ref_frame(None, x0)
            sps = {"sps_id": 0, "height": 64, "width": 64, "ec_part": 0,
                   "use_ada_i": 0}
            r1 = dec.decompress(s1, sps, 21)["x_hat"]
            r2 = dec.decompress(s2, sps, 25)["x_hat"]
            return (np.asarray(r1), np.asarray(r2), len(s1) + len(s2),
                    np.asarray(dec.dpb[0].feature, np.float32))
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"

    d1, d2, d_bytes, d_feat = run(True, thres)
    c1, c2, _, c_feat = run(False, thres)
    np.testing.assert_array_equal(d1, c1)
    np.testing.assert_array_equal(d2, c2)
    np.testing.assert_array_equal(d_feat, c_feat)
    _, _, full_bytes, _ = run(True, None)
    assert d_bytes < full_bytes, (d_bytes, full_bytes)

    # GOP megastage with skip: chunked encode/decode must agree with
    # the single-frame device path exactly
    os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1"
    try:
        enc = DMC()
        enc.init_params(seed=0)
        enc.update(force_zero_thres=thres)
        enc.clear_dpb()
        enc.set_curr_poc(0)
        enc.add_ref_frame(None, x0)
        s_first = enc.compress(x1, 21)["bit_stream"]
        x2 = jnp.asarray(np.clip(np.asarray(x1)
                                 + rng.normal(0, 0.02, x1.shape)
                                 .astype(np.float32), 0, 1))
        x3 = jnp.asarray(np.roll(np.asarray(x2), 2, axis=2))
        gop = enc.compress_gop([x2, x3], [21, 25])["bit_streams"]

        dec = DMC()
        dec.load_params(enc.params)
        dec.update(force_zero_thres=thres)
        dec.clear_dpb()
        dec.set_curr_poc(0)
        dec.add_ref_frame(None, x0)
        sps = {"sps_id": 0, "height": 64, "width": 64, "ec_part": 0,
               "use_ada_i": 0}
        r1 = np.asarray(dec.decompress(s_first, sps, 21)["x_hat"])
        np.testing.assert_array_equal(r1, d1)
        out = dec.decompress_gop(gop, sps, [21, 25])["x_hat"]

        dec2 = DMC()
        dec2.load_params(enc.params)
        dec2.update(force_zero_thres=thres)
        dec2.clear_dpb()
        dec2.set_curr_poc(0)
        dec2.add_ref_frame(None, x0)
        dec2.decompress(s_first, sps, 21)
        for i, (s, q) in enumerate(zip(gop, [21, 25])):
            np.testing.assert_array_equal(
                np.asarray(out[i]),
                np.asarray(dec2.decompress(s, sps, q)["x_hat"]))
    finally:
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"


@pytest.mark.slow
@pytest.mark.parametrize("fz", [None, 0.3])
def test_dmc_device_ec_pallas_matches_xla(fz):
    """The Pallas megastage path (OPENDCVC_TPU_PALLAS_EC=1) must emit
    byte-identical streams and decode to identical frames as the XLA
    lax.scan path — with and without force_zero_thres (skip-lane
    compaction rides SKIP_ROW through the kernels).  Interpret mode is
    forced UNCONDITIONALLY (also on the hardware gate): Mosaic
    compilation of the kernels fused inside the megastage hangs the
    v5e compiler (>10 min, docs/hw_gate_r4.md) and the fused path is
    not a production configuration — the XLA scan measured faster
    in-situ (models/dmc.py _use_pallas_ec docstring).  The kernels'
    Mosaic compilation stays qualified STANDALONE on hardware via
    tests/test_pallas_rans.py; this test pins the byte-parity contract
    of the fused wiring."""
    from opendcvc_tpu.models.dmc import DMC
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    x1 = jnp.asarray(np.clip(np.asarray(x0)
                             + rng.normal(0, 0.02, (1, 64, 64, 3))
                             .astype(np.float32), 0, 1))

    def run(pallas):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1"
        if pallas:
            os.environ["OPENDCVC_TPU_PALLAS_EC"] = "1"
            os.environ["OPENDCVC_TPU_PALLAS_INTERPRET"] = "1"
        try:
            enc = DMC()
            enc.init_params(seed=0)
            enc.update(force_zero_thres=fz)
            enc.clear_dpb()
            enc.set_curr_poc(0)
            enc.add_ref_frame(None, x0)
            s = enc.compress(x1, 21)["bit_stream"]

            dec = DMC()
            dec.load_params(enc.params)
            dec.update(force_zero_thres=fz)
            dec.clear_dpb()
            dec.set_curr_poc(0)
            dec.add_ref_frame(None, x0)
            sps = {"sps_id": 0, "height": 64, "width": 64, "ec_part": 0,
                   "use_ada_i": 0}
            r = dec.decompress(s, sps, 21)["x_hat"]
            return s, np.asarray(r), np.asarray(dec.dpb[0].feature,
                                                np.float32)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"
            os.environ.pop("OPENDCVC_TPU_PALLAS_EC", None)
            os.environ.pop("OPENDCVC_TPU_PALLAS_INTERPRET", None)

    s_p, r_p, f_p = run(True)
    s_x, r_x, f_x = run(False)
    assert s_p == s_x
    np.testing.assert_array_equal(r_p, r_x)
    np.testing.assert_array_equal(f_p, f_x)


@pytest.mark.slow
@pytest.mark.parametrize("fz", [None, 0.3])
def test_dmci_device_ec_pallas_matches_xla(fz):
    """Intra megastage: the Pallas path (all five planes in one fused
    kernel) must emit byte-identical streams and frames as the XLA
    scans, with and without skip-lane compaction.  Interpret-only by
    design, including on the hardware gate — see
    test_dmc_device_ec_pallas_matches_xla."""
    from opendcvc_tpu.models.dmci import DMCI
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    def run(pallas):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1"
        if pallas:
            os.environ["OPENDCVC_TPU_PALLAS_EC"] = "1"
            os.environ["OPENDCVC_TPU_PALLAS_INTERPRET"] = "1"
        try:
            enc = DMCI()
            enc.init_params(seed=0)
            enc.update(force_zero_thres=fz)
            s = enc.compress(x, 21)["bit_stream"]
            dec = DMCI()
            dec.load_params(enc.params)
            dec.update(force_zero_thres=fz)
            sps = {"sps_id": 0, "height": 64, "width": 64, "ec_part": 0,
                   "use_ada_i": 0}
            r = dec.decompress(s, sps, 21)["x_hat"]
            return s, np.asarray(r)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"
            os.environ.pop("OPENDCVC_TPU_PALLAS_EC", None)
            os.environ.pop("OPENDCVC_TPU_PALLAS_INTERPRET", None)

    s_p, r_p = run(True)
    s_x, r_x = run(False)
    assert s_p == s_x
    np.testing.assert_array_equal(r_p, r_x)


@pytest.mark.slow
def test_dmci_device_ec_skip_mode_matches_classic():
    """Intra 4-pass skip mode: device-EC vs classic host path, exact
    reconstruction equality at two QPs."""
    from opendcvc_tpu.models.dmci import DMCI
    thres = 0.3
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))

    def run(device_ec):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        try:
            net = DMCI()
            net.init_params(seed=0)
            net.update(force_zero_thres=thres)
            s1 = net.compress(x, 12)["bit_stream"]
            s2 = net.compress(x, 40)["bit_stream"]

            dec = DMCI()
            dec.load_params(net.params)
            dec.update(force_zero_thres=thres)
            sps = {"sps_id": 0, "height": 64, "width": 96, "ec_part": 0,
                   "use_ada_i": 0}
            r1 = dec.decompress(s1, sps, 12)["x_hat"]
            r2 = dec.decompress(s2, sps, 40)["x_hat"]
            return np.asarray(r1), np.asarray(r2)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"

    d1, d2 = run(True)
    c1, c2 = run(False)
    np.testing.assert_array_equal(d1, c1)
    np.testing.assert_array_equal(d2, c2)


@pytest.mark.slow
def test_dmci_device_ec_roundtrip_matches_classic():
    """Device-EC image compress+decompress must reproduce exactly the
    frames the classic host-rANS path produces."""
    from opendcvc_tpu.models.dmci import DMCI
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))

    def run(device_ec):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        try:
            net = DMCI()
            net.init_params(seed=0)
            net.update()
            s1 = net.compress(x, 12)["bit_stream"]
            s2 = net.compress(x, 40)["bit_stream"]

            dec = DMCI()
            dec.load_params(net.params)
            dec.update()
            sps = {"sps_id": 0, "height": 64, "width": 96, "ec_part": 0,
                   "use_ada_i": 0}
            r1 = dec.decompress(s1, sps, 12)["x_hat"]
            r2 = dec.decompress(s2, sps, 40)["x_hat"]
            return np.asarray(r1), np.asarray(r2)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"

    d1, d2 = run(True)
    c1, c2 = run(False)
    np.testing.assert_array_equal(d1, c1)
    np.testing.assert_array_equal(d2, c2)


@pytest.mark.slow
def test_dmci_batch_matches_single():
    """Batched intra megastages (one execution + one transfer for B
    independent frames) must emit byte-identical streams and decode to
    exactly the frames the single-frame device-EC path produces —
    including per-frame QPs."""
    from opendcvc_tpu.models.dmci import DMCI
    rng = np.random.default_rng(3)
    frames = [jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
              for _ in range(3)]
    qps = [12, 28, 40]
    os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1"
    try:
        net = DMCI()
        net.init_params(seed=0)
        net.update()
        singles = [net.compress(x, q) for x, q in zip(frames, qps)]
        out = net.compress_batch(frames, qps)
        for i, s in enumerate(singles):
            assert out["bit_streams"][i] == s["bit_stream"]
            np.testing.assert_array_equal(
                np.asarray(out["x_hat"][i]), np.asarray(s["x_hat"]))

        dec = DMCI()
        dec.load_params(net.params)
        dec.update()
        sps = {"sps_id": 0, "height": 64, "width": 96, "ec_part": 0,
               "use_ada_i": 0}
        xb = dec.decompress_batch(out["bit_streams"], sps, qps)["x_hat"]
        for i, s in enumerate(singles):
            np.testing.assert_array_equal(
                np.asarray(xb[i]),
                np.asarray(dec.decompress(out["bit_streams"][i], sps,
                                          qps[i])["x_hat"]))
    finally:
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"


@pytest.mark.slow
def test_dmci_fm_device_ec_roundtrip_matches_classic():
    """FM intra device-EC (fused megastage pair, five planes in one
    lane segment) must reproduce exactly the frames the classic
    host-rANS path produces."""
    from opendcvc_tpu.models.dmci_fm import DMCIFM
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))

    def run(device_ec):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        os.environ["OPENDCVC_TPU_EC_LANES"] = "256"
        try:
            net = DMCIFM()
            net.init_params(seed=0)
            net.update()
            s1 = net.compress(x, 12)["bit_stream"]
            s2 = net.compress(x, 40)["bit_stream"]

            dec = DMCIFM()
            dec.load_params(net.params)
            dec.update()
            r1 = dec.decompress(s1, {"height": 64, "width": 96,
                                     "qp": 12})["x_hat"]
            r2 = dec.decompress(s2, {"height": 64, "width": 96,
                                     "qp": 40})["x_hat"]
            return np.asarray(r1, np.float32), np.asarray(r2, np.float32)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"
            del os.environ["OPENDCVC_TPU_EC_LANES"]

    d1, d2 = run(True)
    c1, c2 = run(False)
    # device megastages fuse differently from the split host stages;
    # exact on CPU (declared-precision backend), float-rounding-level
    # anywhere else
    np.testing.assert_allclose(d1, c1, atol=2e-6)
    np.testing.assert_allclose(d2, c2, atol=2e-6)


@pytest.mark.slow
def test_fm_device_ec_roundtrip_matches_classic():
    """FM device-EC (fused megastage pair, all ten planes in one lane
    segment) must reproduce exactly the frames the classic host-rANS
    path produces."""
    from opendcvc_tpu.models.dmc_fm import DMCFM
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    x1 = jnp.asarray(np.clip(np.asarray(x0)
                             + rng.normal(0, 0.02, (1, 64, 64, 3))
                             .astype(np.float32), 0, 1))
    x2 = jnp.asarray(np.clip(np.asarray(x1)
                             + rng.normal(0, 0.02, (1, 64, 64, 3))
                             .astype(np.float32), 0, 1))

    def run(device_ec):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        os.environ["OPENDCVC_TPU_EC_LANES"] = "256"
        try:
            enc = DMCFM()
            enc.init_params(seed=0)
            enc.update()
            dpb = {"ref_frame": x0, "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None,
                   "ref_mv_y": None}
            out1 = enc.compress(x1, dpb, 32, 0)
            out2 = enc.compress(x2, out1["dpb"], 32, 1)

            dec = DMCFM()
            dec.load_params(enc.params)
            dec.update()
            dpb_d = {"ref_frame": x0, "ref_feature": None,
                     "ref_mv_feature": None, "ref_y": None,
                     "ref_mv_y": None}
            sps = {"height": 64, "width": 64, "qp": 32, "fa_idx": 0}
            r1 = dec.decompress(out1["bit_stream"], dpb_d, sps)
            sps2 = {"height": 64, "width": 64, "qp": 32, "fa_idx": 1}
            r2 = dec.decompress(out2["bit_stream"], r1["dpb"], sps2)
            if device_ec:
                # the temporal-chain contract: the decoder megastage
                # must track the encoder megastage EXACTLY
                for k in ("ref_frame", "ref_feature", "ref_y",
                          "ref_mv_y", "ref_mv_feature"):
                    np.testing.assert_array_equal(
                        np.asarray(out2["dpb"][k], np.float32),
                        np.asarray(r2["dpb"][k], np.float32))
            return (np.asarray(r1["dpb"]["ref_frame"], np.float32),
                    np.asarray(r2["dpb"]["ref_frame"], np.float32))
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"
            del os.environ["OPENDCVC_TPU_EC_LANES"]

    d1, d2 = run(True)
    c1, c2 = run(False)
    # device megastages fuse differently from the split host stages, so
    # recon agrees to float rounding, not bit-exactly (the bit-exact
    # requirement is WITHIN each path's enc/dec pair, asserted above)
    np.testing.assert_allclose(d1, c1, atol=2e-6)
    np.testing.assert_allclose(d2, c2, atol=2e-6)


def test_compact_skip_helpers_roundtrip():
    """compact_skip_enc / compact_skip_dec / expand_compact_syms agree
    on the survivor mapping and invert exactly (incl. tail SKIP_ROW
    slots and the overflow park slot)."""
    from opendcvc_tpu.entropy.device_rans import (
        SKIP_ROW, compact_skip_enc, compact_skip_dec,
        expand_compact_syms)
    rng = np.random.default_rng(3)
    n, n_c = 500, 256
    sym = jnp.asarray(rng.integers(-50, 51, n).astype(np.int32))
    rows = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    keep = jnp.asarray(rng.random(n) < 0.4)

    sym_c, rows_c, m = compact_skip_enc(sym, rows, keep, n_c)
    m = int(m)
    assert m == int(np.sum(np.asarray(keep)))
    assert m <= n_c
    rows_c_np = np.asarray(rows_c)
    assert np.all(rows_c_np[m:] == SKIP_ROW)
    # survivors keep relative order
    np.testing.assert_array_equal(
        np.asarray(sym_c)[:m], np.asarray(sym)[np.asarray(keep)])
    np.testing.assert_array_equal(
        rows_c_np[:m], np.asarray(rows)[np.asarray(keep)])

    rows_c2, orig = compact_skip_dec(rows, keep, n_c)
    np.testing.assert_array_equal(np.asarray(rows_c2), rows_c_np)
    full = expand_compact_syms(sym_c, orig, n)
    expect = np.where(np.asarray(keep), np.asarray(sym), 0)
    np.testing.assert_array_equal(np.asarray(full), expect)

    # overflow: more survivors than slots -> extras park (dropped),
    # count still reports the true total for the regrow ladder
    sym_c3, _, m3 = compact_skip_enc(sym, rows, keep, 64)
    assert int(m3) == m and sym_c3.shape[0] == 64


@pytest.mark.slow
def test_dmc_skip_compaction_rung_and_regrow():
    """With a compaction rung below the full K the stream stays exact
    vs the classic host skip path, the container records the rung, and
    a survivor overflow regrows the rung instead of corrupting."""
    from opendcvc_tpu.models.dmc import DMC
    from opendcvc_tpu.entropy.device_rans import parse_frame
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.random((1, 96, 96, 3), dtype=np.float32))
    x1 = jnp.asarray(np.clip(np.asarray(x0)
                             + rng.normal(0, 0.03, (1, 96, 96, 3))
                             .astype(np.float32), 0, 1))

    def run(device_ec, fz, frac=None):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1" if device_ec else "0"
        if frac is not None:
            # compaction is opt-in (a measured device-time loss at
            # 1080p survivor statistics; see DMC._kyc_for)
            os.environ["OPENDCVC_TPU_EC_SKIP_COMPACT"] = "1"
            os.environ["OPENDCVC_TPU_EC_SKIP_FRAC"] = str(frac)
        try:
            enc = DMC()
            enc.init_params(seed=0)
            enc.update(force_zero_thres=fz)
            enc.clear_dpb()
            enc.set_curr_poc(0)
            enc.add_ref_frame(None, x0)
            s = enc.compress(x1, 21)["bit_stream"]
            dec = DMC()
            dec.load_params(enc.params)
            dec.update(force_zero_thres=fz)
            dec.clear_dpb()
            dec.set_curr_poc(0)
            dec.add_ref_frame(None, x0)
            sps = {"sps_id": 0, "height": 96, "width": 96, "ec_part": 0,
                   "use_ada_i": 0}
            r = dec.decompress(s, sps, 21)["x_hat"]
            return s, np.asarray(r), \
                np.asarray(dec.dpb[0].feature, np.float32)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"
            os.environ.pop("OPENDCVC_TPU_EC_SKIP_FRAC", None)
            os.environ.pop("OPENDCVC_TPU_EC_SKIP_COMPACT", None)

    # 96x96: k_y = 9; frac 0.25 -> first rung kyc=8 < k_y
    s_dev, r_dev, f_dev = run(True, 0.3, frac=0.25)
    m = parse_frame(s_dev)[0]
    assert 0 < m["kyc"] < 9, m
    _, r_cls, f_cls = run(False, 0.3)
    np.testing.assert_array_equal(r_dev, r_cls)
    np.testing.assert_array_equal(f_dev, f_cls)

    # near-zero threshold keeps ~every symbol: survivors overflow the
    # first rung (8 steps), the in-graph count pushes the ladder to the
    # full K (9), and the stream still decodes exactly
    s_ov, r_ov, f_ov = run(True, 1e-6, frac=0.01)
    assert parse_frame(s_ov)[0]["kyc"] == 9
    _, r_cls2, f_cls2 = run(False, 1e-6)
    np.testing.assert_array_equal(r_ov, r_cls2)
    np.testing.assert_array_equal(f_ov, f_cls2)


def test_transfer_slimming_primitives():
    """fetch_window/restore_window (D2H) and staging_from_parts +
    expand_staging (H2D) are exact inverses of the full-rectangle
    staging forms, including the window-miss signal (sum(lens) > w)."""
    from opendcvc_tpu.entropy import device_rans as dr
    rng = np.random.default_rng(3)
    L, cap = 8, 64
    tail = 3 * L + 2

    # --- D2H window: the dense section is zero beyond the true payload
    # (densify_segment scatters into a zero buffer), so a window that
    # covers sum(lens) restores the staging exactly
    lens = rng.integers(0, 5, L).astype(np.uint16)
    total = int(lens.sum())
    packed = np.zeros(cap + tail, np.uint16)
    packed[:total] = rng.integers(1, 1 << 16, total, np.uint16)
    packed[cap:cap + L] = lens
    packed[cap + L:] = rng.integers(0, 1 << 16, 2 * L + 2, np.uint16)
    w = 32
    win = np.asarray(dr.fetch_window(jnp.asarray(packed), w, cap, tail))
    rest = dr.restore_window(win, w, cap, L, tail)
    np.testing.assert_array_equal(rest, packed)

    # window miss: lens sum > w must signal the full-fetch fallback
    packed[cap:cap + L] = 40
    win = np.asarray(dr.fetch_window(jnp.asarray(packed), w, cap, tail))
    assert dr.restore_window(win, w, cap, L, tail) is None

    # batched fetch keeps the leading axis
    batch = jnp.stack([jnp.asarray(packed)] * 3)
    winb = np.asarray(dr.fetch_window(batch, w, cap, tail))
    assert winb.shape == (3, w + tail)

    # --- H2D bucket: bucketed staging + on-device re-pad == the full
    # cap-wide staging parse_frame builds
    dense = np.zeros(cap, np.uint16)
    dense[:20] = rng.integers(1, 1 << 16, 20, np.uint16)
    lens16 = lens
    states = rng.integers(1, 1 << 32, L).astype(np.uint32)
    st_full = dr.staging_from_parts(dense, lens16, states, cap)
    bucket = 32
    st_b = dr.staging_from_parts(dense[:20], lens16, states, cap,
                                 width=bucket)
    out = np.asarray(dr.expand_staging(jnp.asarray(st_b), bucket, cap))
    np.testing.assert_array_equal(out, st_full)


def test_dmc_slim_window_miss_falls_back(monkeypatch):
    """A too-small adaptive D2H window must fall back to ONE full fetch
    (bit stream unchanged vs the full-rectangle path), grow the window,
    and the bucketed decode upload must reproduce the same frame."""
    from opendcvc_tpu.models.dmc import DMC
    from opendcvc_tpu.entropy import device_rans as dr
    os.environ["OPENDCVC_TPU_DEVICE_EC"] = "1"
    try:
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        x1 = jnp.asarray(np.clip(
            np.asarray(x0) + rng.normal(0, 0.02, x0.shape)
            .astype(np.float32), 0, 1))
        net = DMC()
        net.init_params(seed=0)
        net.update()
        net.clear_dpb()
        net.set_curr_poc(0)
        net.add_ref_frame(None, x0)
        ref_stream = net.compress(x1, 25)["bit_stream"]

        net2 = DMC()
        net2.load_params(net.params)
        net2.update()
        net2.clear_dpb()
        net2.set_curr_poc(0)
        net2.add_ref_frame(None, x0)
        cap = net2._plan_device_ec(64, 64)[5]
        net2._fetch_windows[cap] = 8  # guaranteed miss
        out_stream = net2.compress(x1, 25)["bit_stream"]
        assert out_stream == ref_stream
        assert net2._fetch_windows[cap] > 8  # grew from the observed payload

        # decode with a tiny bucket step so the H2D really is bucketed
        # (tiny test frames otherwise quantize straight to cap)
        def run_dec():
            dec = DMC()
            dec.load_params(net.params)
            dec.update()
            dec.clear_dpb()
            dec.set_curr_poc(0)
            dec.add_ref_frame(None, x0)
            sps = {"sps_id": 0, "height": 64, "width": 64,
                   "ec_part": 0, "use_ada_i": 0}
            return np.asarray(dec.decompress(ref_stream, sps, 25)
                              ["x_hat"])

        full = run_dec()
        monkeypatch.setattr(dr, "WINDOW_STEP", 64)
        m = dr.parse_frame_parts(ref_stream)[0]
        assert dr.quantize_window(m["total"], m["cap"]) < m["cap"]
        bucketed = run_dec()
        np.testing.assert_array_equal(full, bucketed)
    finally:
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"


def test_encode_scan_stream_bit_parity(tables, monkeypatch):
    """The emission-streaming encode scan (OPENDCVC_TPU_EC_ENC_STREAM)
    is bit-identical to the classic carried-buffer scan, including
    sub-scan carry continuation and SKIP_ROW passthrough lanes — the
    post-scan scatter compaction must reproduce the exact staging
    rectangle the serializer reads."""
    import jax
    from opendcvc_tpu.entropy import device_rans as dr

    rng = np.random.default_rng(7)
    L, K, NR, MW = 64, 37, 16, 31
    cum_hl = dr._split_hi_lo_bf16(jnp.asarray(
        np.pad(tables, ((0, 0), (0, 0)))))
    sym = jnp.asarray(rng.integers(-40, 41, (L, K)), jnp.int32)
    rows = np.asarray(rng.integers(0, NR, (L, K)), np.int32)
    rows[rng.random((L, K)) < 0.1] = dr.SKIP_ROW
    rows = jnp.asarray(rows)
    sym2 = jnp.asarray(rng.integers(-40, 41, (L, 11)), jnp.int32)
    rows2 = jnp.asarray(rng.integers(0, NR, (L, 11)), jnp.int32)

    c0 = dr.encode_carry_init(L, MW)
    ref = jax.jit(dr._encode_scan_carry)(sym, rows, cum_hl, c0)
    ref2 = jax.jit(dr._encode_scan_carry)(sym2, rows2, cum_hl, ref)

    monkeypatch.setenv("OPENDCVC_TPU_EC_ENC_STREAM", "1")
    new = jax.jit(dr._encode_scan_stream)(sym, rows, cum_hl, c0)
    new2 = jax.jit(dr._encode_scan_stream)(sym2, rows2, cum_hl, new)
    for a, b, name in zip(ref2, new2, ("state", "cursors", "buf")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)

    # and through the dispatching entry point (env-flag selection)
    via_flag = jax.jit(dr._encode_scan_carry)(sym, rows, cum_hl, c0)
    for a, b in zip(ref, via_flag):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_scan_blocked_bit_parity(tables, monkeypatch):
    """The block-refill decode scan (OPENDCVC_TPU_EC_DEC_BLOCKED) is
    bit-identical to the classic per-step-read scan, including carry
    continuation across sub-scans, SKIP_ROW lanes, and a K that is not
    a multiple of the block size."""
    import jax
    from opendcvc_tpu.entropy import device_rans as dr

    rng = np.random.default_rng(11)
    L, K, NR, MW = 64, 37, 16, 64
    cum_hl = dr._split_hi_lo_bf16(jnp.asarray(tables))
    # encode first so data/states are a REAL rANS stream
    sym = jnp.asarray(rng.integers(-40, 41, (L, K)), jnp.int32)
    rows = np.asarray(rng.integers(0, NR, (L, K)), np.int32)
    rows[rng.random((L, K)) < 0.1] = dr.SKIP_ROW
    rows = jnp.asarray(rows)
    buf, lens, states = dr._encode_scan(sym, rows, cum_hl, MW)
    # decode-order data: encoder emits reversed; mirror per lane
    data = np.zeros((L, MW), np.int32)
    b = np.asarray(buf)
    ln = np.asarray(lens)
    for l in range(L):
        data[l, :ln[l]] = b[l, :ln[l]][::-1]
    data = jnp.asarray(data)
    # encoder consumed symbols reversed -> decode expects original order
    rows_dec = rows[:, ::-1]
    init = (jnp.asarray(states, jnp.uint32), jnp.zeros((L,), jnp.int32))

    ref_syms, ref_carry = dr._decode_scan_carry(
        data, rows_dec, cum_hl, init)
    new_syms, new_carry = dr._decode_scan_blocked(
        data, rows_dec, cum_hl, init)
    np.testing.assert_array_equal(np.asarray(ref_syms),
                                  np.asarray(new_syms))
    for a, b2 in zip(ref_carry, new_carry):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    # and the decoded symbols invert the encode (skip lanes -> 0)
    expect = np.array(sym[:, ::-1])
    expect[np.asarray(rows_dec) == dr.SKIP_ROW] = 0
    np.testing.assert_array_equal(np.asarray(ref_syms), expect)

    # sub-scan continuation: split rows_dec in two and chain carries
    monkeypatch.setenv("OPENDCVC_TPU_EC_DEC_BLOCKED", "1")
    s1, c1 = dr._decode_scan_carry(data, rows_dec[:, :17], cum_hl, init)
    s2, c2 = dr._decode_scan_carry(data, rows_dec[:, 17:], cum_hl, c1)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(s1), np.asarray(s2)], axis=1),
        np.asarray(ref_syms))
