"""DCVC-FM intra codec roundtrip."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dmci_fm import DMCIFM


@pytest.mark.slow
def test_fm_intra_roundtrip():
    m = DMCIFM()
    m.init_params(seed=0)
    m.update()
    h, w = 64, 64
    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    enc = m.compress(jnp.asarray(x), q_index=21)
    assert len(enc["bit_stream"]) > 0
    dec = m.decompress(enc["bit_stream"],
                       {"height": h, "width": w, "qp": 21})
    np.testing.assert_array_equal(np.asarray(enc["x_hat"]),
                                  np.asarray(dec["x_hat"]))
