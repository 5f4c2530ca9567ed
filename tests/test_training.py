"""Training forwards, RD loss, sharded train step, graft entry points."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opendcvc_tpu.models.dmci import dmci_init
from opendcvc_tpu.models.dmc import dmc_init
from opendcvc_tpu.training.forward import dmci_forward, dmc_forward_one_frame
from opendcvc_tpu.training.train import (make_dmci_loss, make_dmc_loss,
                                         make_optimizer, make_train_step,
                                         make_schedule)


@pytest.fixture(scope="module")
def dmci_params():
    return dmci_init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def dmc_params():
    return dmc_init(jax.random.PRNGKey(1))


def test_dmci_forward_finite(dmci_params):
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    out = jax.jit(dmci_forward, static_argnames="quant_mode")(
        dmci_params, x, jnp.int32(32), jax.random.PRNGKey(0))
    assert np.isfinite(float(out["mse"]))
    assert np.isfinite(float(out["bpp"]))
    assert float(out["bpp"]) > 0
    assert out["x_hat"].shape == x.shape


@pytest.mark.slow
def test_dmci_grad_nonzero(dmci_params):
    loss_fn = make_dmci_loss(lmbda=256.0)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)),
                    jnp.float32)
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        dmci_params, x, jnp.int32(10), jax.random.PRNGKey(1))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gnorm > 0
    assert np.isfinite(float(metrics["loss"]))


def test_dmc_forward_chain(dmc_params):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    out = dmc_forward_one_frame(dmc_params, x, ref, None, jnp.int32(21),
                                jax.random.PRNGKey(2))
    assert out["feature"].shape == (1, 8, 8, 256)
    out2 = dmc_forward_one_frame(dmc_params, x, None, out["feature"],
                                 jnp.int32(21), jax.random.PRNGKey(3))
    assert np.isfinite(float(out2["bpp"]))


@pytest.mark.slow
def test_train_step_descends(dmci_params):
    loss_fn = make_dmci_loss(lmbda=256.0)
    tx = make_optimizer(base_lr=1e-4)
    step = make_train_step(loss_fn, tx, donate=False)
    params = dmci_params
    opt_state = tx.init(params)
    x = jnp.asarray(np.random.default_rng(3).random((1, 64, 64, 3)),
                    jnp.float32)
    losses = []
    for i in range(3):
        params, opt_state, metrics = step(params, opt_state, x,
                                          jnp.int32(32),
                                          jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_schedules():
    for kind in ("constant", "step", "multistep", "cosine"):
        kw = {"milestones": [100, 200]} if kind == "multistep" else {}
        s = make_schedule(kind, 1e-4, 1000, warmup_steps=10, **kw)
        assert float(s(0)) <= 1e-4 + 1e-12
        assert np.isfinite(float(s(999)))


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
