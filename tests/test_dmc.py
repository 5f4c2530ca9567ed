"""DMC video codec: multi-frame GOP roundtrip with feature propagation,
periodic feature refresh, and hierarchical QP."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmc import DMC
from opendcvc_tpu.models.dmci import DMCI


def _sps(h, w, ec_part=0, use_ada_i=0):
    return {"sps_id": 0, "height": h, "width": w, "ec_part": ec_part,
            "use_ada_i": use_ada_i}


@pytest.fixture(scope="module")
def codecs():
    i_net = DMCI()
    i_net.init_params(seed=0)
    i_net.update()
    p_net = DMC()
    p_net.init_params(seed=1)
    p_net.update()
    return i_net, p_net


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h, w, 3), dtype=np.float32)
    out = []
    for t in range(n):
        shift = np.roll(base, t * 2, axis=2)
        noise = rng.normal(0, 0.02, base.shape).astype(np.float32)
        out.append(np.clip(shift + noise, 0, 1))
    return out


def test_gop_roundtrip_exact(codecs):
    """Encode I + 4 P frames; decode must track the encoder's feature
    chain exactly (x_hat equality every frame)."""
    i_net, p_net = codecs
    h, w = 64, 64
    frames = _frames(5, h, w)
    qp_i, qp_p = 32, 32
    index_map = [0, 1, 0, 2, 0, 2, 0, 2]

    # ---- encode
    streams = []
    enc_p = DMC()
    enc_p.load_params(p_net.params)
    enc_p.update()
    enc_p.set_curr_poc(0)
    enc_i_xhat = None
    for idx, x in enumerate(frames):
        x = jnp.asarray(x)
        if idx == 0:
            enc = i_net.compress(x, qp_i)
            enc_p.clear_dpb()
            enc_p.add_ref_frame(None, enc["x_hat"])
            enc_i_xhat = np.asarray(enc["x_hat"])
            streams.append(("I", qp_i, enc["bit_stream"]))
        else:
            fa_idx = index_map[idx % 8]
            curr_qp = enc_p.shift_qp(qp_p, fa_idx)
            enc = enc_p.compress(x, curr_qp)
            streams.append(("P", curr_qp, enc["bit_stream"]))

    # ---- decode
    dec_p = DMC()
    dec_p.load_params(p_net.params)
    dec_p.update()
    dec_p.set_curr_poc(0)
    recons = []
    for kind, qp, stream in streams:
        if kind == "I":
            dec = i_net.decompress(stream, _sps(h, w), qp)
            dec_p.clear_dpb()
            dec_p.add_ref_frame(None, dec["x_hat"])
            np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                          enc_i_xhat)
        else:
            dec = dec_p.decompress(stream, _sps(h, w), qp)
        recons.append(np.asarray(dec["x_hat"]))

    # the decoded frames must be valid images
    for r in recons:
        assert r.shape == (1, h, w, 3)
        assert np.all(r >= 0) and np.all(r <= 1)

    # the decoder's propagated feature must equal the encoder's exactly
    # (any drift would desync the temporal chain at intra period -1)
    np.testing.assert_array_equal(np.asarray(enc_p.dpb[0].feature),
                                  np.asarray(dec_p.dpb[0].feature))

    # re-decode: bit-exact reproducibility of the whole chain
    dec_p2 = DMC()
    dec_p2.load_params(p_net.params)
    dec_p2.update()
    dec_p2.set_curr_poc(0)
    for (kind, qp, stream), ref in zip(streams, recons):
        if kind == "I":
            dec = i_net.decompress(stream, _sps(h, w), qp)
            dec_p2.clear_dpb()
            dec_p2.add_ref_frame(None, dec["x_hat"])
        else:
            dec = dec_p2.decompress(stream, _sps(h, w), qp)
        np.testing.assert_array_equal(np.asarray(dec["x_hat"]), ref)


def test_feature_refresh_roundtrip(codecs):
    """Periodic feature refresh (use_ada_i): encoder regenerates the pixel
    reference; decoder resets to its stored frame — chains must agree."""
    i_net, p_net = codecs
    h, w = 64, 64
    frames = _frames(4, h, w, seed=5)
    qp = 20

    enc_p = DMC()
    enc_p.load_params(p_net.params)
    enc_p.update()
    dec_p = DMC()
    dec_p.load_params(p_net.params)
    dec_p.update()

    # frame 0: intra
    enc0 = i_net.compress(jnp.asarray(frames[0]), qp)
    enc_p.clear_dpb()
    enc_p.add_ref_frame(None, enc0["x_hat"])
    dec0 = i_net.decompress(enc0["bit_stream"], _sps(h, w), qp)
    dec_p.clear_dpb()
    dec_p.add_ref_frame(None, dec0["x_hat"])

    last_qp = qp
    dec_frames = []
    enc_streams = []
    for idx in (1, 2, 3):
        use_ada_i = 1 if idx == 2 else 0
        if use_ada_i:
            enc_p.prepare_feature_adaptor_i(last_qp)
        s = enc_p.compress(jnp.asarray(frames[idx]), qp)
        enc_streams.append((s["bit_stream"], use_ada_i))
        last_qp = qp

    for stream, use_ada_i in enc_streams:
        if use_ada_i:
            dec_p.reset_ref_feature()
        d = dec_p.decompress(stream, _sps(h, w, use_ada_i=use_ada_i), qp)
        dec_frames.append(np.asarray(d["x_hat"]))

    # decode again to confirm the refresh path is reproducible
    dec_p2 = DMC()
    dec_p2.load_params(p_net.params)
    dec_p2.update()
    dec_p2.clear_dpb()
    dec02 = i_net.decompress(enc0["bit_stream"], _sps(h, w), qp)
    dec_p2.add_ref_frame(None, dec02["x_hat"])
    for (stream, use_ada_i), ref in zip(enc_streams, dec_frames):
        if use_ada_i:
            dec_p2.reset_ref_feature()
        d = dec_p2.decompress(stream, _sps(h, w, use_ada_i=use_ada_i), qp)
        np.testing.assert_array_equal(np.asarray(d["x_hat"]), ref)


@pytest.mark.slow
def test_gop_roundtrip_exact_bf16(codecs):
    """The production path runs bfloat16: the encoder/decoder feature
    chain and recon must stay bit-identical in bf16 too (the
    xla_allow_excess_precision=false pin in opendcvc_tpu/__init__.py is
    what makes shared stages round identically in differently-fused
    programs)."""
    i_net, p_net = codecs
    h, w = 64, 64
    frames = _frames(4, h, w, seed=9)
    qp = 28

    enc_i = DMCI(dtype=jnp.bfloat16)
    enc_i.load_params(i_net.params)
    enc_i.update()
    enc_p = DMC(dtype=jnp.bfloat16)
    enc_p.load_params(p_net.params)
    enc_p.update()
    enc_p.set_curr_poc(0)

    streams = []
    for idx, x in enumerate(frames):
        x = jnp.asarray(x, jnp.bfloat16)
        if idx == 0:
            enc = enc_i.compress(x, qp)
            enc_p.clear_dpb()
            enc_p.add_ref_frame(None, enc["x_hat"])
        else:
            enc = enc_p.compress(x, qp)
        streams.append(enc["bit_stream"])

    dec_i = DMCI(dtype=jnp.bfloat16)
    dec_i.load_params(i_net.params)
    dec_i.update()
    dec_p = DMC(dtype=jnp.bfloat16)
    dec_p.load_params(p_net.params)
    dec_p.update()
    dec_p.set_curr_poc(0)
    for idx, stream in enumerate(streams):
        if idx == 0:
            dec = dec_i.decompress(stream, _sps(h, w), qp)
            dec_p.clear_dpb()
            dec_p.add_ref_frame(None, dec["x_hat"])
        else:
            dec = dec_p.decompress(stream, _sps(h, w), qp)
        assert np.all(np.isfinite(np.asarray(dec["x_hat"], np.float32)))

    np.testing.assert_array_equal(
        np.asarray(enc_p.dpb[0].feature, np.float32),
        np.asarray(dec_p.dpb[0].feature, np.float32))
