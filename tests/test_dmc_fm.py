"""DCVC-FM codec: motion-coded P-frame chain roundtrip."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmc_fm import DMCFM
from opendcvc_tpu.ops.warp import flow_warp


def test_flow_warp_identity_and_shift():
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    zero = jnp.zeros((1, 8, 8, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(flow_warp(im, zero)),
                               np.asarray(im), atol=1e-6)
    # integer shift by +1 in x samples the next column (border clamped)
    one_x = zero.at[..., 0].set(1.0)
    out = np.asarray(flow_warp(im, one_x))
    np.testing.assert_allclose(out[0, :, :-1], np.asarray(im)[0, :, 1:],
                               atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(64, 64)])
def test_fm_gop_roundtrip(hw):
    h, w = hw
    net = DMCFM()
    net.init_params(seed=0)
    net.update()

    rng = np.random.default_rng(1)
    base = rng.random((1, h, w, 3), dtype=np.float32)
    frames = [jnp.asarray(np.clip(np.roll(base, 2 * t, axis=2)
                                  + rng.normal(0, 0.02, base.shape)
                                  .astype(np.float32), 0, 1))
              for t in range(3)]

    # encode: I reference is raw pixels (stand-in for the intra codec)
    dpb_e = {"ref_frame": frames[0], "ref_feature": None,
             "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    streams = []
    for t in (1, 2):
        out = net.compress(frames[t], dpb_e, q_index=32, fa_idx=0)
        dpb_e = out["dpb"]
        streams.append(out["bit_stream"])
        assert len(out["bit_stream"]) > 0

    # decode must reproduce the encoder's dpb chain exactly
    dec = DMCFM()
    dec.load_params(net.params)
    dec.update()
    dpb_d = {"ref_frame": frames[0], "ref_feature": None,
             "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    sps = {"height": h, "width": w, "qp": 32, "fa_idx": 0}
    for stream in streams:
        out = dec.decompress(stream, dpb_d, sps)
        dpb_d = out["dpb"]

    for key in ("ref_frame", "ref_feature", "ref_mv_feature", "ref_y",
                "ref_mv_y"):
        np.testing.assert_array_equal(np.asarray(dpb_e[key]),
                                      np.asarray(dpb_d[key]))
