#!/usr/bin/env python3
"""Attribute the 1080p P-frame ms/frame to megastage execution, D2H
fetch, host serialize, H2D upload, and decode execution.

The bench (bench.py) measures the pipelined end-to-end fps; this tool
fences each phase separately so the round-5 perf work attacks the right
cost (VERDICT item 2: close 85 -> >=100 fps).

Usage: python tools/profile_p.py [gop_n [n_chunks]]
Env: PROF_H/PROF_W (default 1080/1920), PROF_FZ (default 0.12).
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
os.environ.setdefault("OPENDCVC_TPU_EC_BPS", "0.4")
os.environ.setdefault("OPENDCVC_TPU_EC_CAP_FRAC", "0.375")

import opendcvc_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from opendcvc_tpu.models.dmc import DMC
from opendcvc_tpu.models import common as CM
from opendcvc_tpu.ops.fused import replicate_pad


def main():
    gop_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(os.environ.get("PROF_H", 1080))
    W = int(os.environ.get("PROF_W", 1920))
    fz = float(os.environ.get("PROF_FZ", 0.12))
    fz = None if fz < 0 else fz
    qp = 21
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32

    net = DMC(dtype=dtype)
    net.init_params(seed=1)
    net.params["q_encoder"] = jnp.ones_like(net.params["q_encoder"]) * \
        float(os.environ.get("PROF_Q", 0.25))
    net.params["q_decoder"] = jnp.ones_like(net.params["q_decoder"])
    net.update(force_zero_thres=fz)
    net.set_use_two_entropy_coders(H * W > 1280 * 720)

    pr, pb = CM.get_padding_size(H, W, 16)
    rng = np.random.default_rng(0)
    base = rng.random((1, H, W, 3), dtype=np.float32)
    frames = [jnp.asarray(replicate_pad(
        jnp.asarray(np.roll(base, 4 * t, axis=2), dtype), pb, pr))
        for t in range(gop_n)]
    for f in frames:
        f.block_until_ready()
    ref = frames[0]
    feature = net._j_adaptor_i(net.params, ref)
    xs = jnp.stack(frames)
    qps = jnp.asarray([qp] * gop_n, jnp.int32)

    enc = net.device_encoder
    lanes, n_total, k_total, bps, mw, cap, kyc, k_y, k_z = \
        net._plan_device_ec(H, W)
    from opendcvc_tpu.models.dmc import _use_pallas_ec
    args = (net.params, xs, feature, qps, enc.cum_hl, lanes, mw,
            enc.n_y_rows, cap, _use_pallas_ec(), fz, kyc)

    # warm
    out = net._j_compress_gop(*args)
    jax.block_until_ready(out)

    def t_best(fn, n=3):
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # (a) megastage execution only (no fetch)
    t_exec = t_best(lambda: jax.block_until_ready(
        net._j_compress_gop(*args)))

    # (b) D2H fetch of the staging (windowed)
    from opendcvc_tpu.entropy.device_rans import slim_fetch, SLIM_STATS
    _, segs, _ = net._j_compress_gop(*args)
    jax.block_until_ready(segs)
    t_fetch = t_best(lambda: slim_fetch(
        net._fetch_windows, segs, lanes, cap)())
    arr = slim_fetch(net._fetch_windows, segs, lanes, cap)()

    # (c) host serialize (container assembly)
    def fail_rerun(m, c, k):
        raise RuntimeError("regrow hit in profile")

    def serialize_all():
        return [net._finish_one_device(
            arr[i], lanes, mw, cap, bps, n_total, k_total, fail_rerun,
            kyc, k_y, k_z) for i in range(gop_n)]

    t_ser = t_best(serialize_all)
    streams = serialize_all()

    # full async end-to-end for reference (needs a DPB feature ref)
    def e2e():
        net.clear_dpb()
        net.set_curr_poc(0)
        net.add_ref_frame(feature, None)
        return net.compress_gop_async(frames, [qp] * gop_n)()

    e2e()
    t_e2e = t_best(e2e)
    bpp = sum(len(s) * 8 for s in streams) / (gop_n * H * W)

    # decode half
    d = DMC(dtype=dtype)
    d.load_params(net.params)
    d.update(force_zero_thres=fz)
    d.set_use_two_entropy_coders(H * W > 1280 * 720)
    sps = {"sps_id": 0, "height": H, "width": W,
           "ec_part": 1 if H * W > 1280 * 720 else 0, "use_ada_i": 0}

    def seed():
        d.clear_dpb()
        d.set_curr_poc(0)
        d.add_ref_frame(feature, None)

    seed()
    d.decompress_gop(streams, sps, [qp] * gop_n)["x_hat"] \
        .block_until_ready()

    # (d) upload (parse + H2D)
    t_up = t_best(lambda: jax.block_until_ready(
        d.upload_gop(streams, sps)[1]))
    up = d.upload_gop(streams, sps)

    # (e) decode execution
    def dec_exec():
        seed()
        d.decompress_gop_uploaded(up, sps, [qp] * gop_n)["x_hat"] \
            .block_until_ready()

    t_dec = t_best(dec_exec)

    print(json.dumps({
        "gop_n": gop_n, "bpp": round(bpp, 4),
        "enc_exec_ms_pf": round(1e3 * t_exec / gop_n, 2),
        "enc_fetch_ms_pf": round(1e3 * t_fetch / gop_n, 2),
        "enc_serialize_ms_pf": round(1e3 * t_ser / gop_n, 2),
        "enc_e2e_ms_pf": round(1e3 * t_e2e / gop_n, 2),
        "dec_upload_ms_pf": round(1e3 * t_up / gop_n, 2),
        "dec_exec_ms_pf": round(1e3 * t_dec / gop_n, 2),
        "slim": dict(SLIM_STATS),
        "mw": mw, "cap": cap, "lanes": lanes, "k_total": k_total,
    }))


if __name__ == "__main__":
    main()
