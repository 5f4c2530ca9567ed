"""DCVC-TCM codec roundtrip (sequential dense coding, GDN towers)."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmc_tcm import DMCTCM
from opendcvc_tpu.layers.gdn import gdn_init, gdn_apply, lower_bound
import jax


def test_gdn_inverse_pair():
    key = jax.random.PRNGKey(0)
    p = gdn_init(key, 8)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 4, 4, 8)),
                    jnp.float32)
    y = gdn_apply(p, x)
    back = gdn_apply(p, y, inverse=True)
    # with identity-ish init, gdn then igdn with the same params is NOT an
    # exact inverse, but should be close for the default init
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0.2)
    assert np.all(np.isfinite(np.asarray(y)))


def test_lower_bound_gradient():
    g = jax.grad(lambda x: lower_bound(x, 1.0))(0.5)
    assert float(g) == 0.0  # below bound, gradient blocked
    g = jax.grad(lambda x: lower_bound(x, 1.0))(2.0)
    assert float(g) == 1.0  # above bound, passes


@pytest.mark.slow
def test_tcm_gop_roundtrip():
    net = DMCTCM()
    net.init_params(seed=0)
    net.update()
    h, w = 64, 64
    rng = np.random.default_rng(1)
    base = rng.random((1, h, w, 3), dtype=np.float32)
    frames = [jnp.asarray(np.clip(np.roll(base, 2 * t, axis=2)
                                  + rng.normal(0, 0.02, base.shape)
                                  .astype(np.float32), 0, 1))
              for t in range(3)]

    ref_frame, ref_feature = frames[0], None
    streams = []
    enc_state = []
    for t in (1, 2):
        out = net.compress(frames[t], ref_frame, ref_feature)
        ref_frame, ref_feature = out["x_hat"], out["feature"]
        streams.append(out["bit_stream"])
        enc_state.append((np.asarray(out["x_hat"]),
                          np.asarray(out["feature"])))
        assert len(out["bit_stream"]) > 0

    dec = DMCTCM()
    dec.load_params(net.params)
    dec.update()
    ref_frame, ref_feature = frames[0], None
    for stream, (ex, ef) in zip(streams, enc_state):
        out = dec.decompress(ref_frame, ref_feature, stream, h, w)
        ref_frame, ref_feature = out["x_hat"], out["feature"]
        np.testing.assert_array_equal(np.asarray(out["x_hat"]), ex)
        np.testing.assert_array_equal(np.asarray(out["feature"]), ef)
