"""RD training: loss, optimizer/scheduler factory, sharded train step.

Capability parity with the reference training layer (reference:
DCVC-family/DCVC/train_dcvc_sq_2to7_data_ddp.py): staged RD loss, Adam
with {step, multistep, cosine, plateau-free} schedules + linear warmup,
cascaded multi-frame training with detached references, checkpoint/resume
— re-expressed with optax and jit-over-Mesh instead of DDP/NCCL.
"""

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .forward import (dmci_forward, dmc_forward_one_frame, dcvc_forward,
                      dmc_tcm_forward_one_frame, dmc_fm_forward_one_frame,
                      stage_loss_dcvc, DCVC_MOTION_SUBTREES)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def rd_loss(out, lmbda):
    """lambda * D + R  (distortion-weighted form used across the family)."""
    return lmbda * out["mse"] + out["bpp"]


def lmbda_for_qp(qp, lmbda_min, lmbda_max, qp_num=64):
    """Log-interpolated rate-point ladder: the reference trains one
    model per lambda in {256..2048} (DCVC train scripts); the banked
    single-model generations instead tie each QP row to a matched
    lambda — without this the per-QP banks receive identical gradients
    and never differentiate."""
    import jax.numpy as jnp
    t = 1.0 - qp.astype(jnp.float32) / (qp_num - 1)
    return jnp.exp(jnp.log(lmbda_min)
                   + t * (jnp.log(lmbda_max) - jnp.log(lmbda_min)))


def make_dmci_loss(lmbda, qp_sampler=None, quant_mode="ste",
                   lmbda_max=None):
    def loss_fn(params, batch, qp, rng):
        out = dmci_forward(params, batch, qp, rng, quant_mode)
        lm = lmbda if lmbda_max is None else \
            lmbda_for_qp(qp, lmbda, lmbda_max)
        loss = rd_loss(out, lm)
        metrics = {"loss": loss, "mse": out["mse"], "bpp": out["bpp"],
                   "bpp_y": out["bpp_y"], "bpp_z": out["bpp_z"]}
        return loss, metrics
    return loss_fn


def make_dmc_loss(lmbda, quant_mode="ste", lmbda_max=None):
    """Cascaded multi-frame loss: frames (B,T,H,W,C); the first frame is
    the (frozen-I) reference; gradients flow through the feature chain
    (stage-4-style end-to-end training, reference train loop :199-277)."""
    def loss_fn(params, frames, qp, rng):
        lmbda_q = lmbda if lmbda_max is None else \
            lmbda_for_qp(qp, lmbda, lmbda_max)
        ref = frames[:, 0]
        n_frames = frames.shape[1] - 1
        rngs = jax.random.split(rng, n_frames)
        feature = None
        total = 0.0
        metrics = {"mse": 0.0, "bpp": 0.0}
        for t in range(n_frames):
            out = dmc_forward_one_frame(params, frames[:, t + 1], ref,
                                        feature, qp, rngs[t], quant_mode)
            total = total + rd_loss(out, lmbda_q)
            metrics["mse"] += out["mse"] / n_frames
            metrics["bpp"] += out["bpp"] / n_frames
            feature = out["feature"]
            ref = out["x_hat"]
        loss = total / n_frames
        metrics["loss"] = loss
        return loss, metrics
    return loss_fn


def make_dcvc_loss(lmbda, stage=4, quant_mode="noise"):
    """DCVC staged loss over cascaded frames (the reference's training
    target; staged loss DCVC_net.py:638-666, cascaded detached refs in
    finetune :199-277).  frames: (B, T, H, W, C); frame 0 is the
    (frozen-I) reference.  In stages 1-3 each P-frame trains against
    the PREVIOUS RECON detached (per-position steps in the reference);
    stage 4 lets gradients flow through the chain."""
    def loss_fn(params, frames, qp, rng):
        del qp  # DCVC is a per-lambda model (no QP banks)
        ref = frames[:, 0]
        n_frames = frames.shape[1] - 1
        rngs = jax.random.split(rng, n_frames)
        total = 0.0
        metrics = {"mse": 0.0, "bpp": 0.0, "warp_mse": 0.0,
                   "bpp_mv": 0.0}
        for t in range(n_frames):
            out = dcvc_forward(params, frames[:, t + 1], ref, rngs[t],
                               stage=stage, quant_mode=quant_mode)
            total = total + stage_loss_dcvc(out, lmbda, stage)
            metrics["mse"] += out["mse"] / n_frames
            metrics["warp_mse"] += out["warp_mse"] / n_frames
            metrics["bpp"] += out["bpp"] / n_frames
            metrics["bpp_mv"] += (out["bpp_mv_y"]
                                  + out["bpp_mv_z"]) / n_frames
            ref = out["x_hat"] if stage == 4 \
                else jax.lax.stop_gradient(out["x_hat"])
        loss = total / n_frames
        metrics["loss"] = loss
        return loss, metrics
    return loss_fn


def make_tcm_loss(lmbda, quant_mode="ste"):
    """Cascaded TCM loss: the propagated FEATURE (not pixels) carries
    temporal context between frames (reference video_net_dmc.py:149-162,
    430-509)."""
    def loss_fn(params, frames, qp, rng):
        del qp
        ref = frames[:, 0]
        feature = None
        n_frames = frames.shape[1] - 1
        rngs = jax.random.split(rng, n_frames)
        total = 0.0
        metrics = {"mse": 0.0, "bpp": 0.0, "warp_mse": 0.0}
        for t in range(n_frames):
            out = dmc_tcm_forward_one_frame(
                params, frames[:, t + 1], ref, feature, rngs[t],
                quant_mode)
            total = total + rd_loss(out, lmbda)
            metrics["mse"] += out["mse"] / n_frames
            metrics["warp_mse"] += out["warp_mse"] / n_frames
            metrics["bpp"] += out["bpp"] / n_frames
            ref = out["x_hat"]
            feature = out["feature"]
        loss = total / n_frames
        metrics["loss"] = loss
        return loss, metrics
    return loss_fn


def make_fm_loss(lmbda_min, lmbda_max, quant_mode="ste"):
    """Cascaded FM loss: ONE model over the full 0-63 q_index range.

    The per-step q_index is traced (sampled by the caller and passed as
    `qp`), and the loss weight is the log-matched lambda — this is what
    drives the learned min/max quant anchors apart so the single model
    spans the rate range (reference common_model.py:37-52; the reference
    ships no FM trainer).  The full DPB (feature, mv_feature, y, mv_y)
    propagates between frames; fa_idx cycles 0/1/2 like the eval path.
    """
    def loss_fn(params, frames, qp, rng):
        # FM's q_index runs LOW->HIGH rate (anchors (min, max), higher
        # index => larger q => more bits), the reverse of the banked
        # models' qp ladder — flip before the shared lambda interp
        lmbda_q = lmbda_for_qp(63 - qp, lmbda_min, lmbda_max, qp_num=64)
        ref = frames[:, 0]
        feature = mv_feature = ref_y = ref_mv_y = None
        n_frames = frames.shape[1] - 1
        rngs = jax.random.split(rng, n_frames)
        total = 0.0
        metrics = {"mse": 0.0, "bpp": 0.0, "warp_mse": 0.0}
        for t in range(n_frames):
            out = dmc_fm_forward_one_frame(
                params, frames[:, t + 1], ref, feature, mv_feature,
                ref_y, ref_mv_y, qp, rngs[t], quant_mode,
                fa_idx=t % 3)
            total = total + rd_loss(out, lmbda_q)
            metrics["mse"] += out["mse"] / n_frames
            metrics["warp_mse"] += out["warp_mse"] / n_frames
            metrics["bpp"] += out["bpp"] / n_frames
            ref = out["x_hat"]
            feature = out["feature"]
            mv_feature = out["mv_feature"]
            ref_y = out["y_hat"]
            ref_mv_y = out["mv_y_hat"]
        loss = total / n_frames
        metrics["loss"] = loss
        return loss, metrics
    return loss_fn


def dcvc_stage_grad_transform(stage):
    """Stage-dependent motion-branch freeze (reference :174-192): in
    stages 2-3 the flow/mv modules receive zero gradient."""
    if stage in (2, 3):
        return lambda grads: freeze_subtree(grads,
                                            DCVC_MOTION_SUBTREES)
    return None


# ---------------------------------------------------------------------------
# optimizer / schedulers (reference :709-745)
# ---------------------------------------------------------------------------

def make_schedule(kind, base_lr, total_steps, warmup_steps=0, **kw):
    if kind == "constant":
        sched = optax.constant_schedule(base_lr)
    elif kind == "step":
        sched = optax.exponential_decay(
            base_lr, transition_steps=kw.get("step_size", total_steps // 3),
            decay_rate=kw.get("gamma", 0.1), staircase=True)
    elif kind == "multistep":
        boundaries = {int(b): kw.get("gamma", 0.1)
                      for b in kw.get("milestones", [])}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif kind == "cosine":
        sched = optax.cosine_decay_schedule(base_lr, total_steps,
                                            alpha=kw.get("min_ratio", 0.01))
    else:
        raise ValueError(kind)
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def make_optimizer(base_lr=1e-4, schedule="constant", total_steps=1_000_000,
                   warmup_steps=0, grad_clip=1.0, plateau=None, **kw):
    """plateau: optional dict(factor=0.5, patience=10, ...) appending a
    reduce-on-plateau scaler after Adam (the reference's
    ReduceLROnPlateau option, train_dcvc_sq_2to7_data_ddp.py:709-745).
    The resulting tx.update requires `value=<monitored loss>`; pass
    plateau_value to make_train_step-produced steps (threaded through
    as an extra arg) or call tx.update yourself."""
    sched = make_schedule(schedule, base_lr, total_steps, warmup_steps, **kw)
    parts = [
        optax.clip_by_global_norm(grad_clip),
        optax.adam(sched),
    ]
    if plateau is not None:
        parts.append(optax.contrib.reduce_on_plateau(**plateau))
    tx = optax.chain(*parts)
    return tx


# ---------------------------------------------------------------------------
# train step (data-parallel over a Mesh; XLA reduces grads over ICI)
# ---------------------------------------------------------------------------

def make_train_step(loss_fn, tx, mesh=None, donate=True,
                    compute_dtype=None, grad_transform=None,
                    plateau=False):
    """Returns jitted step(params, opt_state, batch, qp, rng).

    With a mesh, the batch is sharded over the 'data' axis and params are
    replicated; jit's global-view SPMD makes XLA insert the gradient
    all-reduce (the NCCL-DDP equivalent over ICI).

    compute_dtype=jnp.bfloat16 gives the AMP-equivalent policy (the
    reference uses torch.cuda.amp, train_*_ddp_amp.py:10): parameters
    and optimizer state stay float32, the forward/backward runs in bf16
    (the cast sits inside the grad so master weights get full-precision
    updates).

    grad_transform (optional) edits the gradient pytree before the
    optimizer — the stage-dependent parameter-freeze hook
    (reference :174-192).
    """
    def step(params, opt_state, batch, qp, rng):
        if compute_dtype is not None:
            def loss_cast(p, b, q, r):
                p16 = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
                return loss_fn(p16, b.astype(compute_dtype), q, r)
            grad_target = loss_cast
        else:
            grad_target = loss_fn
        (loss, metrics), grads = jax.value_and_grad(
            grad_target, has_aux=True)(params, batch, qp, rng)
        if grad_transform is not None:
            grads = grad_transform(grads)
        if plateau:
            # reduce_on_plateau monitors the (accumulated) loss; optax
            # chains with extra-args transforms accept the kwarg
            updates, opt_state = tx.update(grads, opt_state, params,
                                           value=loss)
        else:
            updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_shard, repl, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def freeze_subtree(grads, frozen_paths):
    """Zero gradients for parameter subtrees (stage-dependent freezing,
    reference :174-192)."""
    def zero_if_frozen(path, g):
        path_str = "/".join(str(getattr(pk, "key", pk)) for pk in path)
        if any(f in path_str for f in frozen_paths):
            return jax.tree_util.tree_map(jnp.zeros_like, g)
        return g
    return jax.tree_util.tree_map_with_path(zero_if_frozen, grads)
