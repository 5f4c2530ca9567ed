"""CompressAI-era image codec zoo roundtrips."""

import numpy as np
import pytest
import jax.numpy as jnp

from opendcvc_tpu.models.priors_zoo import (
    FactorizedPrior, ScaleHyperprior, MeanScaleHyperprior,
    JointAutoregressiveHierarchicalPriors, Cheng2020Anchor,
    IMAGE_CODEC_ZOO)


def _roundtrip(cls, seed, n=64, m=96, **kw):
    net = cls(n, m, **kw) if cls is not Cheng2020Anchor else cls(n, **kw)
    net.init_params(seed=seed)
    net.update()
    h = w = 64
    rng = np.random.default_rng(seed)
    x = rng.random((1, h, w, 3), dtype=np.float32)
    out = net.compress(jnp.asarray(x))
    dec = net.decompress(out["strings"], out["shape"])
    assert dec["x_hat"].shape == (1, h, w, 3)
    arr = np.asarray(dec["x_hat"])
    assert np.all(arr >= 0) and np.all(arr <= 1)
    return net, out, dec


def test_factorized_prior():
    net, out, dec = _roundtrip(FactorizedPrior, 0)
    # decode twice must be identical (deterministic)
    dec2 = net.decompress(out["strings"], out["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(dec2["x_hat"]))


def test_scale_hyperprior():
    _roundtrip(ScaleHyperprior, 1)


def test_mean_scale_hyperprior():
    net, out, dec = _roundtrip(MeanScaleHyperprior, 2)
    dec2 = net.decompress(out["strings"], out["shape"])
    np.testing.assert_array_equal(np.asarray(dec["x_hat"]),
                                  np.asarray(dec2["x_hat"]))


def test_joint_ar():
    _roundtrip(JointAutoregressiveHierarchicalPriors, 3, n=64, m=64)


def test_cheng2020():
    _roundtrip(Cheng2020Anchor, 4, n=64)


def test_zoo_registry():
    assert set(IMAGE_CODEC_ZOO) == {
        "bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean",
        "mbt2018", "cheng2020-anchor"}
