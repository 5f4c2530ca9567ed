"""Original DCVC codec: autoregressive entropy model roundtrip."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.dcvc import DCVCNet


@pytest.mark.slow
def test_dcvc_ar_roundtrip():
    net = DCVCNet()
    net.init_params(seed=0)
    net.update()
    h, w = 64, 64  # latent 4x4: 16 AR steps per latent
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    x = jnp.asarray(np.clip(np.asarray(ref)
                            + rng.normal(0, 0.02, (1, h, w, 3))
                            .astype(np.float32), 0, 1))

    enc = net.compress(ref, x)
    for key in ("mv_z_string", "mv_y_string", "z_string", "y_string"):
        assert len(enc[key]) > 0

    dec = DCVCNet()
    dec.load_params(net.params)
    dec.update()
    recon = dec.decompress(ref, enc["mv_y_string"], enc["mv_z_string"],
                           enc["y_string"], enc["z_string"], h, w)
    np.testing.assert_array_equal(
        np.asarray(jnp.clip(enc["recon_image"], 0, 1)),
        np.asarray(recon))
