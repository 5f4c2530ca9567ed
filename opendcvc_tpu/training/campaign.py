"""Round-5 RD training campaign for the full-size DMCI (and the DMC
chain on top).

Replaces the round-4 ad-hoc `rd_evidence.train_tiny --train_full` run
(17k steps, per-step Python data generation => host-bound at ~10% device
utilization) with a staged campaign:

  - content: natural-statistics bank (training/syndata.py), pre-generated
    once, crop/flip sampled in microseconds + background prefetch
  - QP-matched lambda ladder (training/train.py lmbda_for_qp)
  - staged crops: most steps at small crops (cheap, good transform
    learning), a finishing stage at larger crops so the 4-pass quadtree
    prior sees realistic context ranges
  - FULL training-state checkpoints (params + Adam moments + step) so a
    kill/resume reproduces the uninterrupted run exactly (reference
    bundles epoch/optimizer/scheduler, train_dcvc_sq_2to7_data_ddp.py:
    894-899, resume :654-693)

Usage:
    python -m opendcvc_tpu.training.campaign --out ckpt/dmci_r5.msgpack \
        --steps 200000
    # kill any time; resume with the same command + --resume
"""

import argparse
import json
import time

import numpy as np


DEFAULT_STAGES = (
    # (fraction of total steps, crop, batch)
    (0.70, 128, 8),
    (0.20, 192, 4),
    (0.10, 256, 2),
)


def _eval_probe(params, eval_imgs, qps, dmci_forward):
    """Device-only RD probe (analytic bits, no coder): psnr/bpp at a few
    QPs on held-out content."""
    import jax
    import jax.numpy as jnp
    rows = []
    for qp in qps:
        mses, bpps = [], []
        for img in eval_imgs:
            out = dmci_forward(params, jnp.asarray(img), jnp.int32(qp),
                               jax.random.PRNGKey(0), quant_mode="ste")
            mses.append(float(out["mse"]))
            bpps.append(float(out["bpp"]))
        mse = float(np.mean(mses))
        rows.append({"qp": int(qp),
                     "psnr": round(-10 * np.log10(max(mse, 1e-10)), 3),
                     "bpp": round(float(np.mean(bpps)), 4)})
    return rows


def train_dmci_campaign(out_ckpt, total_steps=200_000, seed=0,
                        base_lr=1e-4, lmbda_min=32.0, lmbda_max=4096.0,
                        bank_images=512, bank_size=320,
                        stages=DEFAULT_STAGES, resume=False,
                        save_every=2000, log_every=500, eval_every=10000,
                        log_path=None, model_kw=None, stop_after=None,
                        amp=False):
    import jax
    import jax.numpy as jnp
    from ..models.dmci import dmci_init
    from ..models import common as C
    from ..training.forward import dmci_forward
    from .train import make_dmci_loss, make_optimizer, make_train_step
    from .syndata import ImageBank, Prefetcher, natural_images
    from ..utils import checkpoint as ckpt

    kw = model_kw or {}
    loss_fn = make_dmci_loss(lmbda_min, quant_mode="ste",
                             lmbda_max=lmbda_max)
    tx = make_optimizer(base_lr=base_lr, schedule="cosine",
                        total_steps=total_steps,
                        warmup_steps=min(500, total_steps // 20))
    step_fn = make_train_step(
        loss_fn, tx, donate=False,
        compute_dtype=jnp.bfloat16 if amp else None)

    params = C.run_init(lambda k: dmci_init(k, **kw),
                        jax.random.PRNGKey(seed))
    opt_state = tx.init(params)
    start_step = 0
    if resume:
        params, opt_state, start_step, _ = ckpt.load_train_state(
            out_ckpt, opt_state)
        print(f"resumed from {out_ckpt} at step {start_step}",
              flush=True)

    t_bank = time.perf_counter()
    bank = ImageBank(n_images=bank_images, size=bank_size, seed=seed)
    eval_imgs = natural_images(4, 256, seed=seed + 77777)
    print(f"bank ready: {bank_images}x{bank_size}px in "
          f"{time.perf_counter() - t_bank:.0f}s", flush=True)

    # stage boundaries in absolute steps
    bounds = []
    acc = 0
    for frac, crop, batch in stages:
        acc += int(frac * total_steps)
        bounds.append((acc, crop, batch))
    bounds[-1] = (total_steps, bounds[-1][1], bounds[-1][2])

    def stage_of(step):
        for end, crop, batch in bounds:
            if step < end:
                return crop, batch
        return bounds[-1][1], bounds[-1][2]

    logf = open(log_path, "a") if log_path else None
    i = start_step
    ema = None
    while i < total_steps:
        crop, batch = stage_of(i)
        stage_end = next(e for e, c, b in bounds if i < e)

        # per-step rng derived from (seed, step) so resume reproduces
        # the exact data/qp stream
        counter = [i]

        def gen():
            step = counter[0]
            counter[0] += 1
            r = np.random.default_rng((seed + 1) * 1_000_003 + step)
            return bank.sample(r, batch, crop), int(r.integers(0, 64))

        pf = Prefetcher(gen, depth=4)
        t0 = time.perf_counter()
        n0 = i
        try:
            while i < stage_end:
                imgs, qp = pf.next()
                key = jax.random.fold_in(jax.random.PRNGKey(seed + 2), i)
                params, opt_state, metrics = step_fn(
                    params, opt_state, jnp.asarray(imgs),
                    jnp.int32(qp), key)
                i += 1
                if i % log_every == 0:
                    loss = float(metrics["loss"])
                    ema = loss if ema is None else 0.9 * ema + 0.1 * loss
                    sps = (i - n0) / (time.perf_counter() - t0)
                    msg = (f"step {i}/{total_steps} crop={crop} "
                           f"batch={batch} loss={loss:.4f} "
                           f"ema={ema:.4f} bpp={float(metrics['bpp']):.4f} "
                           f"mse={float(metrics['mse']):.5f} qp={qp} "
                           f"{sps:.1f} steps/s")
                    print(msg, flush=True)
                    if logf:
                        logf.write(msg + "\n")
                        logf.flush()
                if i % save_every == 0 or i == total_steps:
                    ckpt.save_train_state(
                        out_ckpt, params, opt_state, i,
                        extra={"model_kwargs": kw, "seed": seed,
                               "total_steps": total_steps,
                               "lmbda": [lmbda_min, lmbda_max]})
                if stop_after is not None and i >= stop_after:
                    # simulated kill for the resume test: state was
                    # saved at the last save_every boundary
                    pf.close()
                    if logf:
                        logf.close()
                    return out_ckpt
                if eval_every and i % eval_every == 0:
                    rows = _eval_probe(params, eval_imgs,
                                       (0, 16, 32, 48), dmci_forward)
                    msg = f"eval @ {i}: {json.dumps(rows)}"
                    print(msg, flush=True)
                    if logf:
                        logf.write(msg + "\n")
                        logf.flush()
        finally:
            pf.close()
    if logf:
        logf.close()
    return out_ckpt


#: DMC stage plan: (fraction of steps, crop, batch, n_P_frames).
#: Most steps are single-P (cheap); later stages cascade 2 P-frames so
#: the feature chain trains end-to-end (the reference's stage-4
#: cascaded finetune, train_dcvc_sq_2to7_data_ddp.py:199-277).
DMC_STAGES = (
    (0.55, 128, 8, 1),
    (0.30, 128, 4, 2),
    (0.15, 192, 2, 2),
)

#: QP anchors for precomputed I-recon refs (the reference precomputes
#: refs with its frozen I-model at each quality level,
#: DCVC-family/DCVC/preprocessing.py).  During training the sampled
#: frame QP stays near its sequence's ref anchor so ref quality and
#: target rate correlate as in a real GOP.
REF_QP_ANCHORS = (8, 24, 40, 56)


def _eval_probe_dmc(params, eval_seqs, qps):
    import jax
    import jax.numpy as jnp
    from .forward import dmc_forward_one_frame
    rows = []
    for qp in qps:
        mses, bpps = [], []
        for seq in eval_seqs:
            out = dmc_forward_one_frame(
                params, jnp.asarray(seq[1:2]), jnp.asarray(seq[0:1]),
                None, jnp.int32(qp), jax.random.PRNGKey(0),
                quant_mode="ste")
            mses.append(float(out["mse"]))
            bpps.append(float(out["bpp"]))
        mse = float(np.mean(mses))
        rows.append({"qp": int(qp),
                     "psnr": round(-10 * np.log10(max(mse, 1e-10)), 3),
                     "bpp": round(float(np.mean(bpps)), 4)})
    return rows


def train_dmc_campaign(out_ckpt, dmci_ckpt=None, total_steps=100_000,
                       seed=0, base_lr=1e-4, lmbda_min=32.0,
                       lmbda_max=4096.0, bank_seqs=384, bank_size=256,
                       seq_t=3, stages=DMC_STAGES, resume=False,
                       save_every=2000, log_every=500, eval_every=10000,
                       log_path=None, stop_after=None, amp=False):
    """Full-size DMC (P-frame) campaign on synthetic motion sequences.

    If `dmci_ckpt` is given, every sequence's frame 0 is replaced by the
    frozen trained DMCI's STE recon at one of REF_QP_ANCHORS before
    training starts, and each step's QP is sampled near the batch's ref
    anchor — the I-then-P conditioning the codec sees at eval time."""
    import jax
    import jax.numpy as jnp
    from ..models.dmc import dmc_init
    from ..models import common as C
    from .train import make_dmc_loss, make_optimizer, make_train_step
    from .syndata import SeqBank, Prefetcher, natural_seqs
    from ..utils import checkpoint as ckpt

    loss_fn = make_dmc_loss(lmbda_min, quant_mode="ste",
                            lmbda_max=lmbda_max)
    tx = make_optimizer(base_lr=base_lr, schedule="cosine",
                        total_steps=total_steps,
                        warmup_steps=min(500, total_steps // 20))
    step_fn = make_train_step(
        loss_fn, tx, donate=False,
        compute_dtype=jnp.bfloat16 if amp else None)

    params = C.run_init(dmc_init, jax.random.PRNGKey(seed))
    opt_state = tx.init(params)
    start_step = 0
    if resume:
        params, opt_state, start_step, _ = ckpt.load_train_state(
            out_ckpt, opt_state)
        print(f"resumed from {out_ckpt} at step {start_step}",
              flush=True)

    t_bank = time.perf_counter()
    bank = SeqBank(n_seqs=bank_seqs, size=bank_size, t=seq_t, seed=seed)
    eval_seqs = natural_seqs(4, 256, t=2, seed=seed + 77777)

    # group sequences by ref-QP anchor; precompute I-recon refs
    rng0 = np.random.default_rng(seed + 31337)
    anchor_of = rng0.integers(0, len(REF_QP_ANCHORS), bank_seqs)
    groups = [np.nonzero(anchor_of == a)[0]
              for a in range(len(REF_QP_ANCHORS))]
    if dmci_ckpt:
        from .forward import dmci_forward
        # loaded leaves are numpy; device-place them so traced-qp
        # indexing works under jit
        ipar = jax.tree_util.tree_map(jnp.asarray,
                                      ckpt.load_params(dmci_ckpt))

        @jax.jit
        def _recon(imgs, qp):
            out = dmci_forward(ipar, imgs, qp, jax.random.PRNGKey(0),
                               quant_mode="ste")
            return out["x_hat"]

        for a, qp in enumerate(REF_QP_ANCHORS):
            idxs = groups[a]
            for lo in range(0, len(idxs), 8):
                sel = idxs[lo:lo + 8]
                refs = bank.bank[sel, 0].astype(np.float32) / 255.0
                # jit pads ragged tails by re-tracing once; keep batches
                # full-size except the last
                rec = np.asarray(_recon(jnp.asarray(refs),
                                        jnp.int32(qp)))
                bank.bank[sel, 0] = np.round(
                    np.clip(rec, 0, 1) * 255).astype(np.uint8)
        print("refs reconned through frozen DMCI at anchors "
              f"{REF_QP_ANCHORS}", flush=True)
    print(f"seq bank ready: {bank_seqs}x{bank_size}px t={seq_t} in "
          f"{time.perf_counter() - t_bank:.0f}s", flush=True)

    bounds = []
    acc = 0
    for frac, crop, batch, t in stages:
        acc += int(frac * total_steps)
        bounds.append((acc, crop, batch, t))
    bounds[-1] = (total_steps,) + bounds[-1][1:]

    logf = open(log_path, "a") if log_path else None
    i = start_step
    ema = None
    while i < total_steps:
        stage_end, crop, batch, n_p = next(
            (e, c, b, t) for e, c, b, t in bounds if i < e)

        counter = [i]

        def gen():
            step = counter[0]
            counter[0] += 1
            r = np.random.default_rng((seed + 1) * 1_000_003 + step)
            a = int(r.integers(0, len(REF_QP_ANCHORS)))
            if dmci_ckpt and len(groups[a]):
                sel = groups[a][r.integers(0, len(groups[a]), batch)]
                n, s = bank.bank.shape[0], bank.size
                ys = r.integers(0, s - crop + 1, batch)
                xs = r.integers(0, s - crop + 1, batch)
                out = np.empty((batch, n_p + 1, crop, crop, 3),
                               np.float32)
                for j in range(batch):
                    c = bank.bank[sel[j], :n_p + 1,
                                  ys[j]:ys[j] + crop, xs[j]:xs[j] + crop]
                    out[j] = c.astype(np.float32) / 255.0
                qp = int(np.clip(REF_QP_ANCHORS[a]
                                 + r.integers(-8, 9), 0, 63))
                return out, qp
            return (bank.sample(r, batch, crop, t=n_p + 1),
                    int(r.integers(0, 64)))

        pf = Prefetcher(gen, depth=4)
        t0 = time.perf_counter()
        n0 = i
        try:
            while i < stage_end:
                frames, qp = pf.next()
                key = jax.random.fold_in(jax.random.PRNGKey(seed + 2), i)
                params, opt_state, metrics = step_fn(
                    params, opt_state, jnp.asarray(frames),
                    jnp.int32(qp), key)
                i += 1
                if i % log_every == 0:
                    loss = float(metrics["loss"])
                    ema = loss if ema is None else 0.9 * ema + 0.1 * loss
                    sps = (i - n0) / (time.perf_counter() - t0)
                    msg = (f"step {i}/{total_steps} crop={crop} "
                           f"batch={batch} P={n_p} loss={loss:.4f} "
                           f"ema={ema:.4f} bpp={float(metrics['bpp']):.4f} "
                           f"mse={float(metrics['mse']):.5f} qp={qp} "
                           f"{sps:.1f} steps/s")
                    print(msg, flush=True)
                    if logf:
                        logf.write(msg + "\n")
                        logf.flush()
                if i % save_every == 0 or i == total_steps:
                    ckpt.save_train_state(
                        out_ckpt, params, opt_state, i,
                        extra={"seed": seed, "total_steps": total_steps,
                               "lmbda": [lmbda_min, lmbda_max]})
                if stop_after is not None and i >= stop_after:
                    pf.close()
                    if logf:
                        logf.close()
                    return out_ckpt
                if eval_every and i % eval_every == 0:
                    rows = _eval_probe_dmc(params, eval_seqs,
                                           (0, 16, 32, 48))
                    msg = f"eval @ {i}: {json.dumps(rows)}"
                    print(msg, flush=True)
                    if logf:
                        logf.write(msg + "\n")
                        logf.flush()
        finally:
            pf.close()
    if logf:
        logf.close()
    return out_ckpt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", choices=("dmci", "dmc"), default="dmci")
    ap.add_argument("--dmci_ckpt", default=None,
                    help="frozen trained DMCI for DMC ref recon")
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--bank_images", type=int, default=512)
    ap.add_argument("--bank_size", type=int, default=320)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save_every", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=10000)
    ap.add_argument("--log", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="reduced-channel model (CI-scale, dmci only)")
    ap.add_argument("--amp", action="store_true",
                    help="bf16 forward/backward, f32 master weights")
    args = ap.parse_args(argv)
    if args.model == "dmc":
        train_dmc_campaign(
            args.out, dmci_ckpt=args.dmci_ckpt, total_steps=args.steps,
            seed=args.seed, base_lr=args.lr, resume=args.resume,
            save_every=args.save_every, eval_every=args.eval_every,
            log_path=args.log, amp=args.amp)
        return
    from ..eval.rd_evidence import TINY_KW
    train_dmci_campaign(
        args.out, total_steps=args.steps, seed=args.seed,
        base_lr=args.lr, bank_images=args.bank_images,
        bank_size=args.bank_size, resume=args.resume,
        save_every=args.save_every, eval_every=args.eval_every,
        log_path=args.log, model_kw=TINY_KW if args.tiny else {},
        amp=args.amp)


if __name__ == "__main__":
    main()
