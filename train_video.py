#!/usr/bin/env python3
"""RD training CLI for the TPU codecs.

Capability parity with the reference training scripts (reference:
DCVC-family/DCVC/train_dcvc_sq_2to7_data_ddp.py): staged RD training on
Vimeo-90k septuplets (or synthetic data for smoke runs), Adam +
{constant, step, multistep, cosine} schedules with linear warmup,
variable-length cascaded sequences, checkpoint/resume with optimizer
state, periodic eval — re-expressed as a single-program SPMD loop over a
jax Mesh (data-parallel gradients reduced by XLA over ICI; the NCCL/DDP
machinery has no equivalent here by design).

Stages (reference staged loss, DCVC_net.py:638-666, adapted to the
RT models which have no motion branch):
  1: train the intra codec (DMCI) alone
  2: train DMC single P-frame with frozen-ish recon weight
  3: end-to-end multi-frame cascaded fine-tune
"""

import argparse
import json
import os
import time

import numpy as np

from opendcvc_tpu.utils.common import str2bool, create_folder


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["dmci", "dmc", "dcvc", "tcm"],
                   default="dmc")
    p.add_argument("--stage", type=int, default=4, choices=[1, 2, 3, 4],
                   help="dcvc staged training (reference "
                        "DCVC_net.py:638-666): 1=ME warmup, 2=recon "
                        "(motion frozen), 3=+bits (motion frozen), "
                        "4=end-to-end")
    p.add_argument("--dataset_root", type=str, default=None,
                   help="vimeo_septuplet root; synthetic data if omitted")
    p.add_argument("--list_file", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8,
                   help="global batch size (split over the data axis)")
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--frames", type=int, default=2,
                   help="frames per training sample (>=2 for dmc)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lmbda", type=float, default=256.0)
    p.add_argument("--lmbda_max", type=float, default=None,
                   help="per-qp lambda ladder: log-interpolate "
                        "[lmbda, lmbda_max] over the 64 QPs")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--schedule", type=str, default="cosine",
                   choices=["constant", "step", "multistep", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--quant_mode", choices=["ste", "noise"], default="ste")
    p.add_argument("--amp", type=lambda v: str(v).lower() in
                   ("1", "true", "yes"), default=False,
                   help="bf16 forward/backward with f32 master weights")
    p.add_argument("--use_precomputed_refs", type=lambda v: str(v).lower()
                   in ("1", "true", "yes"), default=False,
                   help="substitute ref.png (from preprocessing) for im1")
    p.add_argument("--qp_min", type=int, default=0)
    p.add_argument("--qp_max", type=int, default=63)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="ckpt")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_axis", type=int, default=-1,
                   help="#devices on the data axis (-1 = all)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from opendcvc_tpu.models.dmci import dmci_init
    from opendcvc_tpu.models.dmc import dmc_init
    from opendcvc_tpu.parallel.mesh import (make_mesh,
                                            maybe_init_distributed)
    from opendcvc_tpu.training.train import (
        make_dmci_loss, make_dmc_loss, make_dcvc_loss, make_tcm_loss,
        dcvc_stage_grad_transform, make_optimizer, make_train_step)
    from opendcvc_tpu.training.data import (Vimeo90kSeptupletDataset,
                                            SyntheticVideoDataset)
    from opendcvc_tpu.utils import checkpoint as ckpt

    # multi-host: OPENDCVC_TPU_DIST=1 (+ coordinator/rank env) joins
    # the global runtime BEFORE the first jax.devices() call, so the
    # mesh below spans every host's chips
    maybe_init_distributed()
    n_dev = len(jax.devices())
    dp = n_dev if args.data_axis < 0 else args.data_axis
    mesh = make_mesh(jax.devices(), axis_shapes=(dp, n_dev // dp))
    print(f"devices: {n_dev}, mesh: "
          f"{dict(zip(mesh.axis_names, mesh.devices.shape))}")
    assert args.batch_size % dp == 0, "global batch must divide data axis"

    rng_key = jax.random.PRNGKey(args.seed)
    start_step = 0
    if args.model == "dmci":
        params = dmci_init(jax.random.PRNGKey(args.seed))
        loss_fn_img = make_dmci_loss(args.lmbda, quant_mode=args.quant_mode,
                                     lmbda_max=args.lmbda_max)

        def loss_fn(params, frames, qp, rng):
            # use the first frame of each clip as an image
            return loss_fn_img(params, frames[:, 0], qp, rng)
    elif args.model == "dcvc":
        from opendcvc_tpu.models.dcvc import dcvc_init
        params = dcvc_init(jax.random.PRNGKey(args.seed))
        loss_fn = make_dcvc_loss(args.lmbda, stage=args.stage,
                                 quant_mode=args.quant_mode)
        grad_transform = dcvc_stage_grad_transform(args.stage)
    elif args.model == "tcm":
        from opendcvc_tpu.models.dmc_tcm import dmc_tcm_init
        params = dmc_tcm_init(jax.random.PRNGKey(args.seed))
        loss_fn = make_tcm_loss(args.lmbda, quant_mode=args.quant_mode)
    else:
        params = dmc_init(jax.random.PRNGKey(args.seed))
        loss_fn = make_dmc_loss(args.lmbda, quant_mode=args.quant_mode,
                                lmbda_max=args.lmbda_max)
    if args.model != "dcvc":
        grad_transform = None

    tx = make_optimizer(args.lr, args.schedule, args.steps,
                        args.warmup_steps, args.grad_clip)
    opt_state = tx.init(params)

    if args.resume:
        payload = ckpt.load_checkpoint(args.resume)
        params = payload["params"]
        if "extra" in payload and "step" in payload["extra"]:
            start_step = int(payload["extra"]["step"])
        print(f"resumed from {args.resume} at step {start_step}")

    import jax.numpy as jnp_
    step_fn = make_train_step(
        loss_fn, tx, mesh=mesh, donate=True,
        compute_dtype=jnp_.bfloat16 if args.amp else None,
        grad_transform=grad_transform)

    if args.dataset_root:
        ds = Vimeo90kSeptupletDataset(
            args.dataset_root,
            args.list_file or os.path.join(args.dataset_root,
                                           "sep_trainlist.txt"),
            frames_per_sample=args.frames, crop=args.crop,
            rng=np.random.default_rng(args.seed),
            use_precomputed_refs=args.use_precomputed_refs)
    else:
        print("no dataset_root given: training on synthetic data")
        ds = SyntheticVideoDataset(frames_per_sample=args.frames,
                                   size=args.crop, seed=args.seed)

    create_folder(args.save_dir)
    qp_rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    running = []
    for step, batch in enumerate(
            ds.batches(args.batch_size, args.steps - start_step),
            start=start_step):
        qp = int(qp_rng.integers(args.qp_min, args.qp_max + 1))
        rng_key, sub = jax.random.split(rng_key)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(batch), jnp.int32(qp), sub)
        running.append({k: float(v) for k, v in metrics.items()})
        if (step + 1) % args.log_every == 0:
            avg = {k: sum(m[k] for m in running) / len(running)
                   for k in running[0]}
            rate = args.log_every * args.batch_size / (time.time() - t0)
            print(f"step {step + 1}: loss={avg['loss']:.4f} "
                  f"mse={avg['mse']:.5f} bpp={avg['bpp']:.4f} "
                  f"({rate:.1f} samples/s)")
            running = []
            t0 = time.time()
        if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
            path = os.path.join(args.save_dir,
                                f"{args.model}_latest.msgpack")
            ckpt.save_params(path, params,
                             extra={"step": np.int64(step + 1)})
            print(f"saved {path}")

    print("training done")


if __name__ == "__main__":
    main()
