#!/usr/bin/env python3
"""Family-codec scorecard: one measured enc/dec number per codec.

The headline bench (bench.py) covers DCVC-RT (DMC/DMCI, device-EC
megastages); the rest of the family — TCM, HEM, DC, EVC, DCVC — runs
the host-EC path.  This tool times each codec's full compress AND
decompress (NN + host rANS + container) on the ambient device and
writes docs/family_bench_r5.json.  Measured is the point: these are
the codecs' real operating speeds in this framework today, not claims.

Reference speeds for context (A100/T4 torch, eval logs cited in
BASELINE.md): the reference family's non-RT codecs are all seconds-
per-frame class at 1080p as published; no official per-codec fps
baseline exists for most, so rows report absolute fps + bpp only.

Usage: python tools/family_bench.py [out.json]
Env: FAM_H/FAM_W (default 704/1280), FAM_FRAMES (default 3),
     FAM_CODECS (comma list, default all), FAM_DCVC_HW (default 256).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import opendcvc_tpu  # noqa: F401
import jax

# FAM_PLATFORM=cpu forces the host backend (authoritative even when a
# sitecustomize pre-imported jax with a device plugin)
if os.environ.get("FAM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FAM_PLATFORM"])
import jax.numpy as jnp


def _frames(h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    from opendcvc_tpu.eval.rd_evidence import synthetic_images
    base = synthetic_images(1, h, seed=seed, width=w)[0]
    out = [jnp.asarray(base, jnp.float32)]
    for t in range(1, n + 1):
        nxt = np.clip(np.roll(base, 3 * t, axis=2)
                      + rng.normal(0, 0.01, base.shape), 0, 1)
        out.append(jnp.asarray(nxt.astype(np.float32)))
    for f in out:
        f.block_until_ready()
    return out


def _timed(fn, n):
    """Total wall seconds for n sequential calls of fn(t) (t=1..n)."""
    t0 = time.perf_counter()
    outs = [fn(t) for t in range(1, n + 1)]
    leaf = outs[-1]
    if hasattr(leaf, "block_until_ready"):
        leaf.block_until_ready()
    return time.perf_counter() - t0, outs


def bench_tcm(h, w, n):
    from opendcvc_tpu.models.dmc_tcm import DMCTCM
    xs = _frames(h, w, n, seed=1)
    net = DMCTCM()
    net.init_params(seed=0)
    net.update()

    def enc_chain():
        ref, feat, streams = xs[0], None, []
        for t in range(1, n + 1):
            out = net.compress(xs[t], ref, feat)
            ref, feat = out["x_hat"], out["feature"]
            streams.append(out["bit_stream"])
        ref.block_until_ready()
        return streams

    streams = enc_chain()  # warm (compiles)
    t0 = time.perf_counter()
    streams = enc_chain()
    t_enc = time.perf_counter() - t0

    dec = DMCTCM()
    dec.load_params(net.params)
    dec.update()

    def dec_chain():
        ref, feat = xs[0], None
        for s in streams:
            out = dec.decompress(ref, feat, s, h, w)
            ref, feat = out["x_hat"], out["feature"]
        ref.block_until_ready()

    dec_chain()  # warm
    t0 = time.perf_counter()
    dec_chain()
    t_dec = time.perf_counter() - t0
    bpp = sum(len(s) * 8 for s in streams) / (n * h * w)
    return t_enc, t_dec, bpp


def bench_hem(h, w, n):
    from opendcvc_tpu.models.dmc_hem import DMCHEM
    xs = _frames(h, w, n, seed=2)
    net = DMCHEM()
    net.init_params(seed=0)
    # untrained init anchors are flat; spread them so the continuous
    # ladder exercises a real non-anchor operating point
    net.params["y_q_scale"] = jnp.asarray([2.0, 1.2, 0.8, 0.5])
    net.params["mv_y_q_scale"] = jnp.asarray([2.0, 1.2, 0.8, 0.5])
    net.update()
    y_l, mv_l = net.get_interpolated_q_scales(4)
    yq, mvq = float(y_l[1]), float(mv_l[1])

    def enc_chain():
        dpb = {"ref_frame": xs[0], "ref_feature": None,
               "ref_y": None, "ref_mv_y": None}
        streams = []
        for t in range(1, n + 1):
            out = net.compress(xs[t], dpb, mv_y_q_scale=mvq,
                               y_q_scale=yq)
            dpb = out["dpb"]
            streams.append(out["bit_stream"])
        dpb["ref_frame"].block_until_ready()
        return streams

    streams = enc_chain()
    t0 = time.perf_counter()
    streams = enc_chain()
    t_enc = time.perf_counter() - t0

    dec = DMCHEM()
    dec.load_params(net.params)
    dec.update()

    def dec_chain():
        dpb = {"ref_frame": xs[0], "ref_feature": None,
               "ref_y": None, "ref_mv_y": None}
        for s in streams:
            dpb = dec.decompress(dpb, s, h, w, mvq, yq)["dpb"]
        dpb["ref_frame"].block_until_ready()

    dec_chain()
    t0 = time.perf_counter()
    dec_chain()
    t_dec = time.perf_counter() - t0
    bpp = sum(len(s) * 8 for s in streams) / (n * h * w)
    return t_enc, t_dec, bpp


def bench_dc(h, w, n):
    from opendcvc_tpu.models.dmc_dc import DMCDC
    xs = _frames(h, w, n, seed=3)
    net = DMCDC()
    net.init_params(seed=0)
    net.update()

    def enc_chain():
        dpb = {"ref_frame": xs[0], "ref_feature": None,
               "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        streams = []
        for t in range(1, n + 1):
            out = net.compress(xs[t], dpb, q_in_ckpt=False, q_index=30,
                               frame_idx=t)
            dpb = out["dpb"]
            streams.append(out["bit_stream"])
        dpb["ref_frame"].block_until_ready()
        return streams

    streams = enc_chain()
    t0 = time.perf_counter()
    streams = enc_chain()
    t_enc = time.perf_counter() - t0

    dec = DMCDC()
    dec.load_params(net.params)
    dec.update()

    def dec_chain():
        dpb = {"ref_frame": xs[0], "ref_feature": None,
               "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        for t, s in enumerate(streams, 1):
            dpb = dec.decompress(s, dpb, h, w, q_in_ckpt=False,
                                 q_index=30, frame_idx=t)["dpb"]
        dpb["ref_frame"].block_until_ready()

    dec_chain()
    t0 = time.perf_counter()
    dec_chain()
    t_dec = time.perf_counter() - t0
    bpp = sum(len(s) * 8 for s in streams) / (n * h * w)
    return t_enc, t_dec, bpp


def bench_evc(h, w, n):
    from opendcvc_tpu.models.evc import EVC
    xs = _frames(h, w, n, seed=4)
    net = EVC()
    net.init_params(seed=0)
    net.update()

    def enc_all():
        return [net.compress(xs[t], 1.0)["bit_stream"]
                for t in range(1, n + 1)]

    streams = enc_all()
    t0 = time.perf_counter()
    streams = enc_all()
    t_enc = time.perf_counter() - t0

    dec = EVC()
    dec.load_params(net.params)
    dec.update()

    def dec_all():
        outs = [dec.decompress(s, h, w, 1.0)["x_hat"] for s in streams]
        outs[-1].block_until_ready()

    dec_all()
    t0 = time.perf_counter()
    dec_all()
    t_dec = time.perf_counter() - t0
    bpp = sum(len(s) * 8 for s in streams) / (n * h * w)
    return t_enc, t_dec, bpp


def bench_dcvc(h, w, n):
    from opendcvc_tpu.models.dcvc import DCVCNet
    xs = _frames(h, w, n, seed=5)
    net = DCVCNet()
    net.init_params(seed=0)
    net.update()

    def enc_all():
        return [net.compress(xs[0], xs[t]) for t in range(1, n + 1)]

    outs = enc_all()
    t0 = time.perf_counter()
    outs = enc_all()
    t_enc = time.perf_counter() - t0

    def dec_all():
        for o in outs:
            r = net.decompress(xs[0], o["mv_y_string"], o["mv_z_string"],
                               o["y_string"], o["z_string"], h, w)
        r.block_until_ready()  # decompress returns the frame directly

    dec_all()
    t0 = time.perf_counter()
    dec_all()
    t_dec = time.perf_counter() - t0
    nbits = sum(8 * (len(o["mv_y_string"]) + len(o["mv_z_string"])
                     + len(o["y_string"]) + len(o["z_string"]))
                for o in outs)
    return t_enc, t_dec, nbits / (n * h * w)


BENCHES = {"tcm": bench_tcm, "hem": bench_hem, "dc": bench_dc,
           "evc": bench_evc, "dcvc": bench_dcvc}


def main():
    h = int(os.environ.get("FAM_H", 704))
    w = int(os.environ.get("FAM_W", 1280))
    n = int(os.environ.get("FAM_FRAMES", 3))
    codecs = os.environ.get("FAM_CODECS", "tcm,hem,dc,evc,dcvc").split(",")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "family_bench_r5.json")
    platform = jax.devices()[0].platform
    rows = {}
    for name in codecs:
        ch, cw = (h, w) if name != "dcvc" else (
            int(os.environ.get("FAM_DCVC_HW", 256)),) * 2
        t_enc, t_dec, bpp = BENCHES[name](ch, cw, n)
        rows[name] = {
            "h": ch, "w": cw, "frames": n,
            "enc_fps": round(n / t_enc, 3),
            "dec_fps": round(n / t_dec, 3),
            "enc_ms_pf": round(1e3 * t_enc / n, 1),
            "dec_ms_pf": round(1e3 * t_dec / n, 1),
            "bpp": round(bpp, 4),
        }
        print(name, json.dumps(rows[name]), flush=True)
    result = {"platform": platform, "host_ec": True,
              "note": "untrained init weights; wall times incl. NN + "
                      "host rANS + container; RT codecs (DMC/DMCI) are "
                      "covered by bench.py device-EC megastages",
              "codecs": rows}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
