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


def measure(ckpt_path, qps=(16, 26, 36, 46), size=128, n_images=4,
            seed=0):
    import jax
    import jax.numpy as jnp
    from ..models.dmci import DMCI
    from ..training.forward import dmci_forward
    from ..utils import checkpoint as ckpt
    from ..utils.metrics import calc_psnr

    net = DMCI()
    net.load_params(ckpt.load_params(ckpt_path))
    net.update()

    rng = np.random.default_rng(seed)
    # smooth-ish synthetic content (pure noise is incompressible)
    imgs = []
    for _ in range(n_images):
        base = rng.random((size // 8, size // 8, 3)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        img = np.clip(img + rng.normal(0, 0.04, img.shape), 0, 1)
        imgs.append(img[None].astype(np.float32))

    points = []
    for qp in qps:
        est_bits = real_bits = 0.0
        quality = []
        for img in imgs:
            x = jnp.asarray(img)
            fwd = dmci_forward(net.params, x, jnp.int32(qp),
                               jax.random.PRNGKey(0), quant_mode="ste")
            est_bits += float(fwd["bpp"]) * size * size
            enc = net.compress(x, qp)
            real_bits += len(enc["bit_stream"]) * 8
            quality.append(float(calc_psnr(
                np.asarray(enc["x_hat"], np.float32), img,
                data_range=1.0)))
        points.append({
            "qp": int(qp),
            "bpp_stream": real_bits / (n_images * size * size),
            "bpp_estimate": est_bits / (n_images * size * size),
            "stream_vs_estimate": real_bits / est_bits,
            "psnr": float(np.mean(quality)),
        })
    return points


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--qps", type=int, nargs="+",
                    default=[16, 26, 36, 46])
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args(argv)
    points = measure(args.ckpt, qps=tuple(args.qps), size=args.size)
    payload = {"model": "dmci", "ckpt": args.ckpt, "points": points}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    for p in points:
        print(p)


if __name__ == "__main__":
    main()
