"""DCVC-DC codec roundtrip with cyclic feature adaptors and fine QP."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmc_dc import DMCDC


@pytest.mark.slow
def test_dc_gop_roundtrip():
    net = DMCDC()
    net.init_params(seed=0)
    net.update()
    h, w = 64, 64
    rng = np.random.default_rng(1)
    base = rng.random((1, h, w, 3), dtype=np.float32)
    frames = [jnp.asarray(np.clip(np.roll(base, 2 * t, axis=2)
                                  + rng.normal(0, 0.02, base.shape)
                                  .astype(np.float32), 0, 1))
              for t in range(3)]

    dpb_e = {"ref_frame": frames[0], "ref_feature": None,
             "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    streams = []
    for t in (1, 2):
        out = net.compress(frames[t], dpb_e, q_in_ckpt=False, q_index=30,
                           frame_idx=t)
        dpb_e = out["dpb"]
        streams.append(out["bit_stream"])
        assert len(out["bit_stream"]) > 0

    dec = DMCDC()
    dec.load_params(net.params)
    dec.update()
    dpb_d = {"ref_frame": frames[0], "ref_feature": None,
             "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    for t, stream in zip((1, 2), streams):
        out = dec.decompress(stream, dpb_d, h, w, q_in_ckpt=False,
                             q_index=30, frame_idx=t)
        dpb_d = out["dpb"]

    for key in ("ref_frame", "ref_feature", "ref_mv_feature", "ref_y",
                "ref_mv_y"):
        np.testing.assert_array_equal(np.asarray(dpb_e[key]),
                                      np.asarray(dpb_d[key]))


def test_dc_fine_qp_ladder():
    net = DMCDC()
    net.init_params(seed=2)
    assert len(net._fine["y_q_scale_enc"]) == 64
    # ladder endpoints equal the anchor endpoints
    anchors = np.asarray(net.params["y_q_scale_enc"]).reshape(-1)
    np.testing.assert_allclose(net._fine["y_q_scale_enc"][0], anchors[0],
                               rtol=1e-6)
    np.testing.assert_allclose(net._fine["y_q_scale_enc"][-1], anchors[-1],
                               rtol=1e-6)


def test_dc_roundtrip_stream_part_2():
    """N-part stream split (reference DCVC-DC py_rans streamPart): the
    same frame coded with stream_part=2 must roundtrip, and the framing
    flag byte must match the reference layout."""
    import jax.numpy as jnp
    from opendcvc_tpu.models.dmc_dc import DMCDC

    enc = DMCDC(stream_part=2)
    enc.init_params(seed=3)
    enc.update()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    ref = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    dpb = {"ref_frame": ref, "ref_feature": None,
           "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    out = enc.compress(x, dpb, q_in_ckpt=False, q_index=30, frame_idx=1)
    stream = out["bit_stream"]
    assert stream[0] >> 4 == 1  # two parts

    dec = DMCDC(stream_part=2)
    dec.load_params(enc.params)
    dec.update()
    dpb_d = {"ref_frame": ref, "ref_feature": None,
             "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    rec = dec.decompress(stream, dpb_d, 64, 64, q_in_ckpt=False,
                         q_index=30, frame_idx=1)
    np.testing.assert_array_equal(
        np.asarray(out["dpb"]["ref_frame"], np.float32),
        np.asarray(rec["dpb"]["ref_frame"], np.float32))
