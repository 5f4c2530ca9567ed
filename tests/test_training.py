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


@pytest.mark.slow
@pytest.mark.parametrize("stage", [1, 2, 3, 4])
def test_dcvc_staged_training_descends(stage):
    """DCVC is the codec the reference actually trains; every stage of
    the staged loss (reference DCVC_net.py:638-666) must run and
    descend, with the motion branch frozen in stages 2-3
    (train_dcvc_sq_2to7_data_ddp.py:174-192)."""
    from opendcvc_tpu.models.dcvc import dcvc_init
    from opendcvc_tpu.training.train import (make_dcvc_loss,
                                             dcvc_stage_grad_transform)
    from opendcvc_tpu.training.forward import DCVC_MOTION_SUBTREES
    params = dcvc_init(jax.random.PRNGKey(4))
    loss_fn = make_dcvc_loss(lmbda=256.0, stage=stage)
    tx = make_optimizer(base_lr=1e-4)
    step = make_train_step(loss_fn, tx, donate=False,
                           grad_transform=dcvc_stage_grad_transform(stage))
    opt_state = tx.init(params)
    rng = np.random.default_rng(stage)
    frames = jnp.asarray(rng.random((1, 3, 64, 64, 3)), jnp.float32)
    mv0 = np.asarray(
        jax.tree_util.tree_leaves(params["mv_enc"])[0], np.float32)
    losses = []
    for i in range(3):
        params, opt_state, metrics = step(params, opt_state, frames,
                                          jnp.int32(0),
                                          jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    mv1 = np.asarray(
        jax.tree_util.tree_leaves(params["mv_enc"])[0], np.float32)
    if stage in (2, 3):
        np.testing.assert_array_equal(mv0, mv1)  # motion frozen
    else:
        assert not np.array_equal(mv0, mv1)  # motion trains
    del DCVC_MOTION_SUBTREES


@pytest.mark.slow
def test_tcm_training_descends():
    """TCM trains end-to-end with the feature-propagation chain."""
    from opendcvc_tpu.models.dmc_tcm import dmc_tcm_init
    from opendcvc_tpu.training.train import make_tcm_loss
    params = dmc_tcm_init(jax.random.PRNGKey(5))
    loss_fn = make_tcm_loss(lmbda=256.0)
    tx = make_optimizer(base_lr=1e-4)
    step = make_train_step(loss_fn, tx, donate=False)
    opt_state = tx.init(params)
    frames = jnp.asarray(np.random.default_rng(6).random((1, 3, 64, 64, 3)),
                         jnp.float32)
    losses = []
    for i in range(3):
        params, opt_state, metrics = step(params, opt_state, frames,
                                          jnp.int32(0),
                                          jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_fm_training_descends_and_spans_rate_range():
    """FM's novelty is ONE model over the full 0-63 q_index range via
    learned log-interpolated quant anchors (reference
    DCVC-FM/src/models/common_model.py:37-52).  Train a few steps with
    per-step q_index + matched lambda and check (a) the loss descends,
    (b) the anchors receive gradient and stay ordered (min < max), and
    (c) a q_index sweep of the trained weights still moves rate the
    right way (higher index => more bits)."""
    from opendcvc_tpu.models.dmc_fm import dmc_fm_init
    from opendcvc_tpu.training.train import make_fm_loss
    from opendcvc_tpu.training.forward import dmc_fm_forward_one_frame
    params = dmc_fm_init(jax.random.PRNGKey(7))
    for k in ("mv_y_q_enc", "mv_y_q_dec", "y_q_enc", "y_q_dec"):
        params[k] = jnp.array([0.5, 2.0])
    anchors0 = np.asarray(params["y_q_enc"], np.float32)

    loss_fn = make_fm_loss(lmbda_min=85.0, lmbda_max=2048.0)
    tx = make_optimizer(base_lr=1e-4)
    step = make_train_step(loss_fn, tx, donate=False)
    opt_state = tx.init(params)
    frames = jnp.asarray(np.random.default_rng(7).random((1, 3, 48, 48, 3)),
                         jnp.float32)
    # descend at a FIXED q_index (different q => different lambda, so
    # cross-q losses aren't comparable); the interior point still pulls
    # on both log-interp anchors
    losses = []
    for i in range(3):
        params, opt_state, metrics = step(params, opt_state, frames,
                                          jnp.int32(31),
                                          jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses

    anchors1 = np.asarray(params["y_q_enc"], np.float32)
    assert not np.array_equal(anchors0, anchors1)  # anchors train
    for k in ("mv_y_q_enc", "mv_y_q_dec", "y_q_enc", "y_q_dec"):
        a = np.asarray(params[k], np.float32)
        assert 0 < a[0] < a[1], (k, a)  # ordered: log-interp stays valid

    x = frames[:, 1]
    ref = frames[:, 0]
    fwd = jax.jit(dmc_fm_forward_one_frame,
                  static_argnames=("quant_mode", "fa_idx"))
    bpp = {q: float(fwd(params, x, ref, None, None, None, None,
                        jnp.int32(q), jax.random.PRNGKey(9))["bpp"])
           for q in (0, 63)}
    assert bpp[63] > bpp[0], bpp


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


# ---------------------------------------------------------------------------
# full training-state checkpoints + kill-and-resume (reference bundles
# epoch/optimizer/scheduler in one .pth and resumes all of them,
# train_dcvc_sq_2to7_data_ddp.py:894-899, :654-693)
# ---------------------------------------------------------------------------

def test_train_state_checkpoint_roundtrip(tmp_path, dmci_params):
    from opendcvc_tpu.utils.checkpoint import (save_train_state,
                                               load_train_state)
    tx = make_optimizer(base_lr=1e-4, schedule="cosine", total_steps=100)
    opt_state = tx.init(dmci_params)
    path = str(tmp_path / "state.msgpack")
    save_train_state(path, dmci_params, opt_state, 42,
                     extra={"model_kwargs": {}, "seed": 7})
    params2, opt2, step, extra = load_train_state(path, opt_state)
    assert step == 42
    assert int(extra["seed"]) == 7
    for a, b in zip(jax.tree_util.tree_leaves(dmci_params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(opt2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params-only loader must reject/flag nothing silently
    from opendcvc_tpu.utils.checkpoint import load_checkpoint
    assert "opt_state" in load_checkpoint(path)


@pytest.mark.slow
def test_campaign_kill_and_resume_reproduces(tmp_path):
    """A killed-and-resumed campaign must land on EXACTLY the same
    params as the uninterrupted run: the checkpoint bundles Adam
    moments + step, and the data/qp stream is (seed, step)-derived."""
    from opendcvc_tpu.training.campaign import train_dmci_campaign
    from opendcvc_tpu.utils.checkpoint import load_checkpoint
    from opendcvc_tpu.eval.rd_evidence import TINY_KW
    kw = dict(total_steps=6, seed=3, bank_images=4, bank_size=96,
              stages=((1.0, 64, 2),), save_every=3, log_every=100,
              eval_every=0, model_kw=TINY_KW)
    a = str(tmp_path / "a.msgpack")
    train_dmci_campaign(a, **kw)                      # uninterrupted
    b = str(tmp_path / "b.msgpack")
    train_dmci_campaign(b, stop_after=3, **kw)        # "killed" at 3
    train_dmci_campaign(b, resume=True, **kw)         # resumed 3->6
    pa = load_checkpoint(a)
    pb = load_checkpoint(b)
    assert int(pa["step"]) == int(pb["step"]) == 6
    la = jax.tree_util.tree_leaves(pa["params"])
    lb = jax.tree_util.tree_leaves(pb["params"])
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_plateau_optimizer_reduces_lr():
    """make_optimizer(plateau=...) appends reduce-on-plateau (the
    reference's ReduceLROnPlateau, train_dcvc_sq_2to7_data_ddp.py:
    709-745): a non-improving monitored loss shrinks the update scale
    by `factor` after `patience` steps."""
    import optax
    tx = make_optimizer(base_lr=1.0, schedule="constant",
                        plateau=dict(factor=0.5, patience=2,
                                     cooldown=0, accumulation_size=1))
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}
    state = tx.init(params)
    scales = []
    for i in range(8):
        # loss plateaus at 1.0 -> after `patience` the scale halves
        updates, state = tx.update(grads, state, params,
                                   value=jnp.float32(1.0))
        scales.append(float(jnp.abs(updates["w"][0])))
    assert scales[-1] < scales[0] * 0.75, scales


def test_natural_seqs_and_seqbank():
    """Motion sequences: correlated consecutive frames, crop/flip
    batches, frozen-I ref replacement (the reference precomputes refs
    with its I-model, DCVC-family/DCVC/preprocessing.py)."""
    from opendcvc_tpu.training.syndata import natural_seqs, SeqBank
    seqs = natural_seqs(2, 64, t=3, seed=5)
    assert seqs[0].shape == (3, 64, 64, 3)
    d01 = float(np.abs(seqs[0][0] - seqs[0][1]).mean())
    assert 1e-3 < d01 < 0.25  # moved, but same content
    bank = SeqBank(n_seqs=3, size=96, t=3, seed=6)
    r = np.random.default_rng(0)
    assert bank.sample(r, 4, 64).shape == (4, 3, 64, 64, 3)
    assert bank.sample(r, 2, 64, t=2).shape == (2, 2, 64, 64, 3)
    before = bank.bank.copy()
    bank.replace_refs(lambda x: np.clip(x + 0.05, 0, 1), batch=2)
    assert (bank.bank[:, 0].astype(int)
            - before[:, 0].astype(int)).mean() > 5
    # non-ref frames untouched
    np.testing.assert_array_equal(bank.bank[:, 1:], before[:, 1:])


def test_dmc_campaign_smoke(tmp_path):
    """One full-size DMC campaign step with a frozen (tiny) DMCI ref
    recon: refs are rewritten through the I-model, the cascaded loss
    step runs, and the train-state checkpoint is written."""
    from opendcvc_tpu.training.campaign import train_dmc_campaign
    from opendcvc_tpu.eval.rd_evidence import TINY_KW
    from opendcvc_tpu.models.dmci import dmci_init
    from opendcvc_tpu.models import common as C
    from opendcvc_tpu.utils import checkpoint as ckpt

    ipath = str(tmp_path / "i.msgpack")
    ckpt.save_params(ipath, C.run_init(
        lambda k: dmci_init(k, **TINY_KW), jax.random.PRNGKey(0)))
    out = str(tmp_path / "dmc.msgpack")
    train_dmc_campaign(out, dmci_ckpt=ipath, total_steps=2,
                       stop_after=1, bank_seqs=4, bank_size=96,
                       seq_t=2, stages=((1.0, 64, 1, 1),),
                       save_every=1, log_every=1, eval_every=0)
    payload = ckpt.load_checkpoint(out)
    assert int(payload["step"]) == 1
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(payload["params"]))
