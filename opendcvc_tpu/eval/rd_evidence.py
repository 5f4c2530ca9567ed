"""RD + rate-consistency evidence for a trained DMCI checkpoint.

Produces the measured counterpart of the reference's expected-result
fixtures (reference DCVC-TCM recommended_test_full_results_*.json and
the <0.5% estimate-vs-stream claim, DCVC-TCM/README.md:48): a QP sweep
with real written streams, the analytic bit estimate next to the real
stream size per point, and PSNR — enough to check monotonicity and the
probability-model -> CDF -> coder consistency with trained weights.

Usage:
    python -m opendcvc_tpu.eval.rd_evidence --ckpt ckpt/dmci_latest.msgpack \
        --out docs/rd_evidence.json
"""

import argparse
import json

import numpy as np


def synthetic_images(n, size, seed=0, width=None):
    """Deterministic mixed-content eval set: multi-scale block
    textures + smooth gradients + hard edges + mild noise — content a
    codec can actually model, with enough structure that rate responds
    to quantization (pure noise is incompressible; single-scale
    textures saturate).  `width` defaults to `size` (square)."""
    rng = np.random.default_rng(seed)
    w = size if width is None else width
    imgs = []
    for _ in range(n):
        img = np.zeros((size, w, 3), np.float32)
        for block in (16, 8, 4):
            lo = rng.random((-(-size // block), -(-w // block), 3))
            img += np.kron(lo, np.ones((block, block, 1)))[
                :size, :w] / (16 / block) ** 0.5
        yy, xx = np.mgrid[0:size, 0:w].astype(np.float32)
        yy, xx = yy / size, xx / w
        img += (rng.random(3) * np.stack([yy, xx, yy * xx], -1)).sum(
            -1, keepdims=True) * 0.5
        # a few hard-edged rectangles
        for _ in range(4):
            y0 = rng.integers(0, size - 8)
            x0 = rng.integers(0, w - 8)
            h_ = rng.integers(4, size // 3)
            w_ = rng.integers(4, w // 3)
            img[y0:y0 + h_, x0:x0 + w_] += rng.random(3) - 0.5
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
        imgs.append(img[None].astype(np.float32))
    return imgs


def synthetic_pairs(n, size, seed=0):
    """Deterministic (ref, cur) frame pairs with global motion: cur is
    ref shifted by a few pixels plus mild noise — the implicit-motion
    P-codec must spend bits on the innovation, so rate responds to QP
    the same way it does on natural video."""
    imgs = synthetic_images(n, size, seed)
    rng = np.random.default_rng(seed + 999)
    pairs = []
    for im in imgs:
        dy, dx = (int(v) for v in rng.integers(-4, 5, 2))
        cur = np.roll(im, (dy, dx), axis=(1, 2))
        cur = np.clip(cur + rng.normal(0, 0.01, cur.shape)
                      .astype(np.float32), 0, 1).astype(np.float32)
        pairs.append((im, cur))
    return pairs


#: reduced-channel DMCI used for the committable RD evidence (a
#: full-size trained checkpoint is ~183 MB; this one is a few MB and
#: regenerable deterministically in CI)
TINY_KW = {"N": 96, "z_channel": 64, "enc_dec_ch": 64}


def measure(ckpt_path, qps=(16, 26, 36, 46), size=128, n_images=4,
            seed=0, width=None, gen=None):
    """QP sweep on real streams; `width` enables non-square frames
    (e.g. true 1080x1920 — frames pad to the codec's 64-alignment like
    the eval harness, PSNR is computed on the unpadded region, and
    both bpp figures count the padded pixels so the
    stream-vs-estimate ratio is alignment-free).

    `gen(n, size, seed, width=)` overrides the content source (default
    block-texture synthetic_images; pass training.syndata.natural_images
    for held-out natural-statistics content — use a seed disjoint from
    the training bank's)."""
    import jax
    import jax.numpy as jnp
    from ..models.dmci import DMCI
    from ..models import common as CM
    from ..ops.fused import replicate_pad
    from ..training.forward import dmci_forward
    from ..utils import checkpoint as ckpt
    from ..utils.metrics import calc_psnr

    payload = ckpt.load_checkpoint(ckpt_path)
    model_kw = (payload.get("extra") or {}).get("model_kwargs", {})
    net = DMCI(**model_kw)
    net.load_params(payload["params"])
    net.update()

    imgs = (gen or synthetic_images)(n_images, size, seed, width=width)
    h, w = size, (size if width is None else width)
    pr, pb = CM.get_padding_size(h, w, 64)
    n_pix = (h + pb) * (w + pr)

    points = []
    for qp in qps:
        est_bits = real_bits = 0.0
        quality = []
        for img in imgs:
            x = jnp.asarray(img)
            if pr or pb:
                x = replicate_pad(x, pb, pr)
            fwd = dmci_forward(net.params, x, jnp.int32(qp),
                               jax.random.PRNGKey(0), quant_mode="ste")
            est_bits += float(fwd["bpp"]) * n_pix
            enc = net.compress(x, qp)
            real_bits += len(enc["bit_stream"]) * 8
            quality.append(float(calc_psnr(
                np.asarray(enc["x_hat"], np.float32)[:, :h, :w], img,
                data_range=1.0)))
        points.append({
            "qp": int(qp),
            "bpp_stream": real_bits / (n_images * n_pix),
            "bpp_estimate": est_bits / (n_images * n_pix),
            "stream_vs_estimate": real_bits / est_bits,
            "psnr": float(np.mean(quality)),
        })
    return points


def train_tiny(out_ckpt, steps=3000, seed=0, crop=96, batch=8,
               lmbda_min=32.0, lmbda_max=4096.0, lr=1e-4,
               log_every=200, resume_from=None, model_kw=None):
    """Deterministically (re)train the committable reduced-channel DMCI
    RD-evidence checkpoint (TINY_KW) on mixed synthetic content with
    the per-QP lambda ladder.  ~minutes on CPU; the resulting msgpack
    is a few MB and is what tests/test_rate_consistency.py loads.
    resume_from continues from an existing checkpoint's params (fresh
    optimizer state); pass a distinct seed so the data stream
    differs from the original run.  model_kw overrides the channel
    config ({} = the FULL-size DMCI — the BD-rate evidence run; run it
    on the TPU, the full model is slow on CPU)."""
    import jax
    import jax.numpy as jnp
    from ..models.dmci import dmci_init
    from ..models import common as C
    from ..training.train import (make_dmci_loss, make_optimizer,
                                  make_train_step)
    from ..utils import checkpoint as ckpt

    kw = TINY_KW if model_kw is None else model_kw
    if resume_from:
        params = ckpt.load_checkpoint(resume_from)["params"]
    else:
        params = C.run_init(
            lambda k: dmci_init(k, **kw), jax.random.PRNGKey(seed))
    loss_fn = make_dmci_loss(lmbda_min, quant_mode="ste",
                             lmbda_max=lmbda_max)
    tx = make_optimizer(base_lr=lr, schedule="cosine",
                        total_steps=steps, warmup_steps=min(200, steps))
    step_fn = make_train_step(loss_fn, tx, donate=False)
    opt_state = tx.init(params)

    rng = np.random.default_rng(seed + 1)
    key = jax.random.PRNGKey(seed + 2)
    for i in range(steps):
        batch_imgs = np.concatenate(
            synthetic_images(batch, crop, seed=seed + 10 + i), axis=0)
        qp = jnp.int32(int(rng.integers(0, 64)))
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(batch_imgs), qp, sub)
        if (i + 1) % log_every == 0:
            print(f"step {i + 1}: loss={float(metrics['loss']):.4f} "
                  f"bpp={float(metrics['bpp']):.4f} "
                  f"mse={float(metrics['mse']):.5f} qp={int(qp)}",
                  flush=True)
        if (i + 1) % 500 == 0 or i + 1 == steps:
            ckpt.save_params(out_ckpt, params,
                             extra={"model_kwargs": kw,
                                    "steps": i + 1, "seed": seed,
                                    "lmbda": [lmbda_min, lmbda_max]})
    return out_ckpt


def measure_dmc(ckpt_path, qps=(16, 26, 36, 46), size=128, n_pairs=4,
                seed=0):
    """P-frame RD sweep with REAL streams: each pair seeds the DPB with
    the ground-truth reference (perfect-I condition), encodes the
    current frame, decodes it from the bytes, and compares the coder's
    bits against the training forward's analytic estimate."""
    import jax
    import jax.numpy as jnp
    from ..models.dmc import DMC
    from ..training.forward import dmc_forward_one_frame
    from ..utils import checkpoint as ckpt
    from ..utils.metrics import calc_psnr

    payload = ckpt.load_checkpoint(ckpt_path)
    net = DMC()
    net.load_params(payload["params"])
    net.update()
    dec = DMC()
    dec.load_params(payload["params"])
    dec.update()
    sps = {"sps_id": 0, "height": size, "width": size, "ec_part": 0,
           "use_ada_i": 0}

    pairs = synthetic_pairs(n_pairs, size, seed)
    points = []
    for qp in qps:
        est_bits = real_bits = 0.0
        quality = []
        for ref, cur in pairs:
            ref_j, cur_j = jnp.asarray(ref), jnp.asarray(cur)
            fwd = dmc_forward_one_frame(
                payload["params"], cur_j, ref_j, None, jnp.int32(qp),
                jax.random.PRNGKey(0), quant_mode="ste")
            est_bits += float(fwd["bpp"]) * size * size
            net.clear_dpb()
            net.set_curr_poc(0)
            net.add_ref_frame(None, ref_j)
            enc = net.compress(cur_j, qp)
            real_bits += len(enc["bit_stream"]) * 8
            dec.clear_dpb()
            dec.set_curr_poc(0)
            dec.add_ref_frame(None, ref_j)
            out = dec.decompress(enc["bit_stream"], sps, qp)
            quality.append(float(calc_psnr(
                np.asarray(out["x_hat"], np.float32), cur,
                data_range=1.0)))
        points.append({
            "qp": int(qp),
            "bpp_stream": real_bits / (n_pairs * size * size),
            "bpp_estimate": est_bits / (n_pairs * size * size),
            "stream_vs_estimate": real_bits / est_bits,
            "psnr": float(np.mean(quality)),
        })
    return points


def train_tiny_dmc(out_ckpt, steps=2000, seed=0, crop=96, batch=4,
                   lmbda_min=32.0, lmbda_max=4096.0, lr=1e-4,
                   log_every=100):
    """Deterministically train a DMC P-frame RD-evidence checkpoint on
    synthetic motion pairs with the per-QP lambda ladder.  The RT
    channel plan is reference-fixed (no reduced variant), so the
    resulting checkpoint is ~100 MB and is NOT committed — the JSON
    evidence records this exact regeneration recipe instead."""
    import jax
    import jax.numpy as jnp
    from ..models.dmc import dmc_init
    from ..training.train import (make_dmc_loss, make_optimizer,
                                  make_train_step)
    from ..models import common as C
    from ..utils import checkpoint as ckpt

    params = C.run_init(dmc_init, jax.random.PRNGKey(seed))
    loss_fn = make_dmc_loss(lmbda_min, quant_mode="ste",
                            lmbda_max=lmbda_max)
    tx = make_optimizer(base_lr=lr, schedule="cosine",
                        total_steps=steps, warmup_steps=min(200, steps))
    step_fn = make_train_step(loss_fn, tx, donate=False)
    opt_state = tx.init(params)

    rng = np.random.default_rng(seed + 1)
    key = jax.random.PRNGKey(seed + 2)
    for i in range(steps):
        pairs = synthetic_pairs(batch, crop, seed=seed + 10 + i)
        frames = np.stack([np.concatenate([r, c], axis=0)
                           for r, c in pairs])  # (B, 2, H, W, C)
        qp = jnp.int32(int(rng.integers(0, 64)))
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(frames), qp, sub)
        if (i + 1) % log_every == 0:
            print(f"step {i + 1}: loss={float(metrics['loss']):.4f} "
                  f"bpp={float(metrics['bpp']):.4f} "
                  f"mse={float(metrics['mse']):.5f} qp={int(qp)}",
                  flush=True)
        # NOTE: extra must stay numeric — flax msgpack_restore cannot
        # round-trip python strings
        if (i + 1) % 250 == 0 or i + 1 == steps:
            ckpt.save_params(out_ckpt, params,
                             extra={"steps": i + 1, "seed": seed,
                                    "lmbda": [lmbda_min, lmbda_max]})
    return out_ckpt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--qps", type=int, nargs="+",
                    default=[16, 26, 36, 46])
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--width", type=int, default=0,
                    help="frame width for non-square sweeps (0 = "
                         "square --size; e.g. --size 1080 --width "
                         "1920 for true 1080p)")
    ap.add_argument("--train_tiny", action="store_true",
                    help="first (re)train the committable tiny "
                         "checkpoint at --ckpt, then measure")
    ap.add_argument("--train_full", action="store_true",
                    help="first train a FULL-size DMCI at --ckpt "
                         "(BD-rate evidence; run on TPU), then measure")
    ap.add_argument("--resume_from", default=None)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model", choices=["dmci", "dmc"], default="dmci")
    args = ap.parse_args(argv)
    if args.model == "dmc":
        if args.train_tiny:
            train_tiny_dmc(args.ckpt, steps=args.steps, seed=args.seed)
        points = measure_dmc(args.ckpt, qps=tuple(args.qps),
                             size=args.size)
    else:
        if args.train_tiny or args.train_full:
            train_tiny(args.ckpt, steps=args.steps, seed=args.seed,
                       crop=args.crop, batch=args.batch,
                       resume_from=args.resume_from,
                       model_kw={} if args.train_full else None)
        points = measure(args.ckpt, qps=tuple(args.qps), size=args.size,
                         width=args.width or None)
    payload = {"model": args.model, "ckpt": args.ckpt, "points": points}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    for p in points:
        print(p)


if __name__ == "__main__":
    main()
