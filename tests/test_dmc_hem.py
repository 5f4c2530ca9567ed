"""DCVC-HEM codec + IntraNoAR roundtrips."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmc_hem import DMCHEM
from opendcvc_tpu.models.intra_no_ar import IntraNoAR


@pytest.mark.slow
def test_intra_no_ar_roundtrip():
    m = IntraNoAR(N=192)
    m.init_params(seed=0)
    m.update()
    h, w = 64, 64
    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    enc = m.compress(jnp.asarray(x), 1.0)
    assert len(enc["bit_stream"]) > 0
    dec = m.decompress(enc["bit_stream"], h, w, 1.0)
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))


@pytest.mark.slow
def test_hem_gop_roundtrip():
    net = DMCHEM()
    net.init_params(seed=1)
    net.update()
    h, w = 64, 64
    rng = np.random.default_rng(2)
    base = rng.random((1, h, w, 3), dtype=np.float32)
    frames = [jnp.asarray(np.clip(np.roll(base, 2 * t, axis=2)
                                  + rng.normal(0, 0.02, base.shape)
                                  .astype(np.float32), 0, 1))
              for t in range(3)]

    dpb_e = {"ref_frame": frames[0], "ref_feature": None,
             "ref_y": None, "ref_mv_y": None}
    streams = []
    for t in (1, 2):
        out = net.compress(frames[t], dpb_e, mv_y_q_scale=1.0,
                           y_q_scale=1.0)
        dpb_e = out["dpb"]
        streams.append(out["bit_stream"])

    dec = DMCHEM()
    dec.load_params(net.params)
    dec.update()
    dpb_d = {"ref_frame": frames[0], "ref_feature": None,
             "ref_y": None, "ref_mv_y": None}
    for stream in streams:
        out = dec.decompress(dpb_d, stream, h, w, 1.0, 1.0)
        dpb_d = out["dpb"]

    for key in ("ref_frame", "ref_feature", "ref_y", "ref_mv_y"):
        np.testing.assert_array_equal(np.asarray(dpb_e[key]),
                                      np.asarray(dpb_d[key]))


@pytest.mark.slow
def test_hem_interpolated_rate_roundtrip():
    """A non-anchor rate point from the continuous ladder must (a) be
    strictly between its neighbors' bitrates in expectation and (b)
    roundtrip losslessly — the reference evaluates HEM at arbitrary
    rate counts by log-interpolating the 4 trained anchors
    (DCVC-HEM/test_video.py:273-311)."""
    net = DMCHEM()
    net.init_params(seed=3)
    # spread the anchors so interpolation has a real span
    net.params["y_q_scale"] = jnp.asarray([2.0, 1.2, 0.8, 0.5])
    net.params["mv_y_q_scale"] = jnp.asarray([2.0, 1.2, 0.8, 0.5])
    net.update()
    y_l, mv_l = net.get_interpolated_q_scales(7)
    y_l, mv_l = np.asarray(y_l), np.asarray(mv_l)
    assert len(y_l) == 7 and y_l[0] > y_l[-1]  # descending
    np.testing.assert_allclose(y_l[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(y_l[-1], 0.5, rtol=1e-6)
    # strictly log-spaced: constant ratio between rungs
    r = y_l[:-1] / y_l[1:]
    np.testing.assert_allclose(r, r[0], rtol=1e-6)

    h, w = 64, 64
    rng = np.random.default_rng(4)
    base = rng.random((1, h, w, 3), dtype=np.float32)
    x1 = jnp.asarray(np.clip(base + rng.normal(0, 0.02, base.shape)
                             .astype(np.float32), 0, 1))
    dpb = {"ref_frame": jnp.asarray(base), "ref_feature": None,
           "ref_y": None, "ref_mv_y": None}
    # mid-ladder (non-anchor) operating point
    out = net.compress(x1, dpb, mv_y_q_scale=float(mv_l[3]),
                       y_q_scale=float(y_l[3]))
    dec = DMCHEM()
    dec.load_params(net.params)
    dec.update()
    dpb_d = {"ref_frame": jnp.asarray(base), "ref_feature": None,
             "ref_y": None, "ref_mv_y": None}
    r = dec.decompress(dpb_d, out["bit_stream"], h, w,
                       float(mv_l[3]), float(y_l[3]))
    np.testing.assert_array_equal(np.asarray(out["dpb"]["ref_frame"]),
                                  np.asarray(r["dpb"]["ref_frame"]))
