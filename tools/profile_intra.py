#!/usr/bin/env python3
"""Profile the DMCI intra path vs operating bitrate.

Reproduces the trained-checkpoint intra collapse (docs/bench_r4_ckpt.json:
4.4/5.8 fps at ~0.5 bpp vs the flat-bank surrogate's 30/39 at ~0.2 bpp)
WITHOUT retraining: sweeps the flat-bank q_scale to raise the intra bpp
and reports a per-stage timing breakdown so the cost can be attributed to
(a) megastage execution, (b) D2H fetch volume, (c) serialize/regrow
retries, or (d) recompiles at grown caps.

Usage: python tools/profile_intra.py [q_scale ...]
Env: PROF_H/PROF_W (default 1080/1920), PROF_FRAMES (default 8),
     PROF_BPS (OPENDCVC_TPU_EC_BPS for the intra coder, default 0.4).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("OPENDCVC_TPU_DEVICE_EC", "1")
os.environ.setdefault("OPENDCVC_TPU_EC_LANES", "4096")
os.environ.setdefault("OPENDCVC_TPU_EC_BPS",
                      os.environ.get("PROF_BPS", "0.4"))
os.environ.setdefault("OPENDCVC_TPU_EC_CAP_FRAC", "0.375")

import opendcvc_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from opendcvc_tpu.models.dmci import DMCI
from opendcvc_tpu.models import common as CM
from opendcvc_tpu.ops.fused import replicate_pad


def run_point(q_scale, H, W, n, fz):
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32
    net = DMCI(dtype=dtype)
    net.init_params(seed=0)
    q = net.params["q_scale_enc"]
    net.params["q_scale_enc"] = jnp.ones_like(q) * q_scale
    net.params["q_scale_dec"] = jnp.ones_like(q)
    net.update(force_zero_thres=fz)
    net.set_use_two_entropy_coders(H * W > 1280 * 720)

    from opendcvc_tpu.eval.rd_evidence import synthetic_images
    pr, pb = CM.get_padding_size(H, W, 16)
    base = synthetic_images(1, H, seed=0, width=W)[0]
    frames = [jnp.asarray(replicate_pad(
        jnp.asarray(np.roll(base, 4 * t, axis=2), dtype), pb, pr))
        for t in range(n)]
    for f in frames:
        f.block_until_ready()
    qp = 21

    # instrument regrow reruns
    reruns = [0]
    orig = net._j_compress_frame

    def counting(*a, **k):
        reruns[0] += 1
        return orig(*a, **k)

    # warm
    streams = net.compress_batch(frames, qp)["bit_streams"]
    net._j_compress_frame = counting

    # timed encode, split into dispatch / fetch / finish
    best = None
    for _ in range(2):
        reruns[0] = 0
        t0 = time.perf_counter()
        x_hats, finish = net.compress_batch_async(frames, qp)
        t_dispatch = time.perf_counter() - t0
        streams = finish()
        t_total = time.perf_counter() - t0
        if best is None or t_total < best["t_total"]:
            best = {"t_dispatch": t_dispatch, "t_total": t_total,
                    "reruns": reruns[0]}
    net._j_compress_frame = orig
    bpp = sum(len(s) * 8 for s in streams) / (n * H * W)

    dec = DMCI(dtype=dtype)
    dec.load_params(net.params)
    dec.update(force_zero_thres=fz)
    sps = {"sps_id": 0, "height": H, "width": W,
           "ec_part": 1 if H * W > 1280 * 720 else 0, "use_ada_i": 0}
    dec.decompress_batch(streams, sps, qp)["x_hat"].block_until_ready()
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        dec.decompress_batch(streams, sps, qp)["x_hat"] \
            .block_until_ready()
        dts.append(time.perf_counter() - t0)
    t_dec = min(dts)

    # fetch volume diagnostic: what does slim_fetch move?
    mw, cap, n_total, k_total, lanes, kyc, k_y, k_z = net._mw_cap_for(
        H, W, net.device_encoder.bytes_per_symbol)
    return {
        "q_scale": q_scale, "bpp": round(bpp, 4),
        "enc_fps": round(n / best["t_total"], 2),
        "dec_fps": round(n / t_dec, 2),
        "enc_dispatch_ms": round(1e3 * best["t_dispatch"] / n, 2),
        "enc_total_ms": round(1e3 * best["t_total"] / n, 2),
        "dec_ms": round(1e3 * t_dec / n, 2),
        "reruns": best["reruns"],
        "lanes": lanes, "mw": mw, "cap": cap, "kyc": kyc,
        "k_y": k_y, "k_z": k_z,
        "staging_mb_per_frame": round(4 * (cap + 3 * lanes + 2) / 1e6, 2),
    }


def main():
    H = int(os.environ.get("PROF_H", 1080))
    W = int(os.environ.get("PROF_W", 1920))
    n = int(os.environ.get("PROF_FRAMES", 8))
    fz = float(os.environ.get("PROF_FZ", 0.12))
    fz = None if fz < 0 else fz
    scales = [float(s) for s in sys.argv[1:]] or [0.2, 0.5, 1.0]
    for s in scales:
        r = run_point(s, H, W, n, fz)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
