#!/usr/bin/env python3
"""Headline benchmark: 1080p P-frame encode AND decode throughput (DMC
codec, full pipeline: NN forward + device-side rANS + container
assembly on encode; container parse + upload + device-side rANS + NN
reconstruction on decode), plus the intra (DMCI) fps.

The P-frame path runs GOP-BATCHED megastages: N consecutive frames per
compiled device program with ONE dense D2H per chunk, so the link's
per-transfer latency (~30 ms on tunneled devices) amortizes over the
chunk instead of being paid per frame (the reference hides coding
behind compute with CUDA streams + worker threads,
video_model.py:314-337; here batching hides the transfer round-trip).

Prints ONE JSON line:
  {"metric": "1080p_p_frame_enc_dec_fps", "value": N, "unit": "fps",
   "vs_baseline": N, "enc_fps": N, "dec_fps": N, "bpp": N,
   "gop_n": N, "intra_enc_fps": N, "intra_dec_fps": N}
value = min(enc_fps, dec_fps); vs_baseline compares that minimum
against the corresponding A100 figure (125.2 enc / 112.8 dec fps,
reference README.md:35; intra 40.7/44.2, README.md:55).

Env overrides:
  BENCH_FRAMES (default 32; rounded to a GOP multiple),
  BENCH_GOP_N (default 8), BENCH_HEIGHT/BENCH_WIDTH (default
  1080/1920), BENCH_DTYPE (float32|bfloat16, default bfloat16 on tpu
  else float32), BENCH_Q_SCALE (default 0.25), BENCH_DECODE=0 to skip
  the decode half, BENCH_INTRA=0 to skip the intra half,
  BENCH_INTRA_FRAMES (default 8), BENCH_FZ (force_zero_thres; default
  0.12 matching the reference's recommended eval command,
  reference README.md:166 — skipped symbols ride the compacted lanes;
  negative disables).
"""

import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_ENC_FPS = 125.2
BASELINE_DEC_FPS = 112.8

_PROBE_SRC = r"""
import json, os, sys, threading, time
_ready = threading.Event()
def _watchdog():
    if not _ready.wait(float(sys.argv[1])):
        print(json.dumps({"ok": False, "error": "backend init timed out"}),
              flush=True)
        os._exit(3)
threading.Thread(target=_watchdog, daemon=True).start()
try:
    import jax, jax.numpy as jnp
    devs = jax.devices()
    _ready.set()
    x = jnp.ones((128, 128))
    v = float((x @ x)[0, 0])
    print(json.dumps({"ok": True, "platform": devs[0].platform,
                      "val": v}), flush=True)
except Exception as e:
    _ready.set()
    print(json.dumps({"ok": False, "error": str(e)[:300]}), flush=True)
    os._exit(2)
"""


def _last_good():
    """Most recent committed BENCH_r*.json with a real (non-zero)
    measurement, so an infra outage can report 'tunnel down, last good
    number was X' instead of silently zeroing the round."""
    best = None
    for f in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_r*.json"))):
        try:
            with open(f) as fh:
                d = json.load(fh)
            if d.get("value"):
                best = {"round": os.path.basename(f), "value": d["value"],
                        "vs_baseline": d.get("vs_baseline")}
        except Exception:
            pass
    return best


def _infra_fail(reason):
    out = {"metric": "1080p_p_frame_enc_dec_fps", "value": 0,
           "unit": "fps", "vs_baseline": 0, "infra_error": True,
           "error": reason}
    lg = _last_good()
    if lg:
        out["last_good"] = lg
    print(json.dumps(out), flush=True)
    sys.exit(3)


def _preflight():
    """Bounded-retry device probe in a SUBPROCESS before the main run.

    A dead tunnel hangs backend init indefinitely (observed >10 h in
    round 3); probing in a child that self-destructs via an internal
    watchdog keeps this process clean and lets us retry with backoff.
    Skipped for CPU runs (BENCH_PLATFORM=cpu)."""
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        return
    retries = int(os.environ.get("BENCH_PREFLIGHT_RETRIES", 3))
    probe_timeout = float(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", 240))
    last_err = "unknown"
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC, str(probe_timeout)],
                capture_output=True, text=True,
                timeout=probe_timeout + 120)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            d = json.loads(line)
            if d.get("ok"):
                return
            last_err = d.get("error", "probe failed")
        except subprocess.TimeoutExpired:
            last_err = "probe subprocess timed out"
        except Exception as e:  # pragma: no cover - defensive
            last_err = str(e)[:200]
        if attempt + 1 < retries:
            time.sleep(30 * (attempt + 1))
    _infra_fail(f"infra: device preflight failed after {retries} "
                f"attempts ({last_err})")


def main():
    _preflight()
    # device-side entropy coding is the fastest configuration measured
    # on tunneled devices; callers can override via env
    os.environ.setdefault("OPENDCVC_TPU_DEVICE_EC", "1")
    os.environ.setdefault("OPENDCVC_TPU_EC_LANES", "4096")
    os.environ.setdefault("OPENDCVC_TPU_EC_BPS", "0.4")
    os.environ.setdefault("OPENDCVC_TPU_EC_CAP_FRAC", "0.375")
    import opendcvc_tpu  # noqa: F401  (pins XLA determinism flags)
    import jax
    # BENCH_PLATFORM=cpu forces the host platform even when a device
    # plugin hooks the backend registry (JAX_PLATFORMS env alone is
    # overridden by such plugins; the config update is authoritative
    # as long as no backend has been initialized yet)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    from opendcvc_tpu.models.dmc import DMC
    from opendcvc_tpu.models.dmci import DMCI
    from opendcvc_tpu.models import common as CM
    from opendcvc_tpu.ops.fused import replicate_pad

    # a dead device tunnel hangs backend init forever; fail loudly with
    # a parsable line instead (observed: axon init hung >10 h during an
    # infra outage, and even JAX_PLATFORMS=cpu processes hang because
    # the plugin hooks get_backend — hence BENCH_PLATFORM above)
    import threading
    _ready = threading.Event()

    def _watchdog():
        if not _ready.wait(float(os.environ.get("BENCH_INIT_TIMEOUT",
                                                600))):
            out = {"metric": "1080p_p_frame_enc_dec_fps", "value": 0,
                   "unit": "fps", "vs_baseline": 0, "infra_error": True,
                   "error": "infra: device backend init timed out"}
            lg = _last_good()
            if lg:
                out["last_good"] = lg
            print(json.dumps(out), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    platform = jax.devices()[0].platform
    _ready.set()
    gop_n = int(os.environ.get("BENCH_GOP_N", 8))
    n_frames = int(os.environ.get("BENCH_FRAMES", 32))
    n_frames = max(gop_n, n_frames // gop_n * gop_n)
    n_chunks = n_frames // gop_n
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    dtype_name = os.environ.get(
        "BENCH_DTYPE", "bfloat16" if platform == "tpu" else "float32")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    qp = 21
    fz = float(os.environ.get("BENCH_FZ", 0.12))
    fz = None if fz < 0 else fz

    i_net = DMCI(dtype=dtype)
    ckpt_i = os.environ.get("BENCH_CKPT_I")
    if ckpt_i:
        # trained full-size checkpoint: the intra numbers then reflect
        # trained symbol statistics (real q banks, real skip rates)
        # instead of the flat-bank surrogate below
        from opendcvc_tpu.utils import checkpoint as _ckpt
        payload = _ckpt.load_checkpoint(ckpt_i)
        kw = (payload.get("extra") or {}).get("model_kwargs", {})
        if kw:
            raise ValueError(f"BENCH_CKPT_I must be a full-size DMCI "
                             f"checkpoint (got model_kwargs={kw})")
        i_net.load_params(jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            payload["params"]))
    else:
        i_net.init_params(seed=0)
        # flat unit banks: random-init weights with the trained
        # log-spaced rate ladder (models/dmci.py dmci_init) produce
        # out-of-model symbol magnitudes at mid QPs; the bench pins the
        # banks to a flat scale so the entropy-coding load matches
        # trained-checkpoint statistics (bpp ~0.5 at 1080p) instead of
        # thrashing the staging regrow ladder
        q = i_net.params["q_scale_enc"]
        q_scale_i = float(os.environ.get("BENCH_Q_SCALE_I", 0.2))
        i_net.params["q_scale_enc"] = jnp.ones_like(q) * q_scale_i
        i_net.params["q_scale_dec"] = jnp.ones_like(q)
    if ckpt_i:
        # trained checkpoints operate near ~0.5 bpp at mid QPs
        # (docs/rd_evidence_r4_full.json); the default staging budget
        # then overflows and every intra batch pays regrow-ladder
        # recompiles (docs/bench_r4_ckpt.json) — size the INTRA staging
        # for trained statistics, restoring the default for the P-net
        _bps_prev = os.environ.get("OPENDCVC_TPU_EC_BPS")
        os.environ["OPENDCVC_TPU_EC_BPS"] = os.environ.get(
            "BENCH_CKPT_EC_BPS", "0.9")
        try:
            i_net.update(force_zero_thres=fz)
        finally:
            if _bps_prev is None:
                del os.environ["OPENDCVC_TPU_EC_BPS"]
            else:
                os.environ["OPENDCVC_TPU_EC_BPS"] = _bps_prev
    else:
        i_net.update(force_zero_thres=fz)
    p_net = DMC(dtype=dtype)
    p_net.init_params(seed=1)
    # moderate symbol magnitudes for the entropy-coding load
    q_scale = float(os.environ.get("BENCH_Q_SCALE", 0.25))
    p_net.params["q_encoder"] = jnp.ones_like(
        p_net.params["q_encoder"]) * q_scale
    p_net.params["q_decoder"] = jnp.ones_like(p_net.params["q_decoder"])
    p_net.update(force_zero_thres=fz)

    pr, pb = CM.get_padding_size(height, width, 16)
    use_two = height * width > 1280 * 720
    i_net.set_use_two_entropy_coders(use_two)
    p_net.set_use_two_entropy_coders(use_two)

    rng = np.random.default_rng(0)
    if ckpt_i:
        # trained-checkpoint runs need CODABLE content: a trained model
        # prices uniform noise at ~8 bpp, which overflows the staging
        # regrow ladder and measures retry thrash, not codec speed.
        # The flat-bank surrogate below was calibrated against noise.
        from opendcvc_tpu.eval.rd_evidence import synthetic_images
        base = synthetic_images(1, height, seed=0, width=width)[0]
    else:
        base = rng.random((1, height, width, 3), dtype=np.float32)

    def frame(t):
        x = np.roll(base, 4 * t, axis=2)
        return jnp.asarray(replicate_pad(jnp.asarray(x, dtype), pb, pr))

    # I-frame to seed the DPB; frames 1-2 run the single-frame path
    # (pixel-adaptor then feature-adaptor variants) before GOP chunks
    x0 = frame(0)
    enc0 = i_net.compress(x0, qp)
    seed_frames = [frame(1), frame(2)]
    frames = [frame(t) for t in range(3, 3 + n_frames)]
    for f in frames:
        f.block_until_ready()
    chunks = [frames[i * gop_n:(i + 1) * gop_n] for i in range(n_chunks)]
    qps = [qp] * gop_n

    def seed_encoder():
        p_net.clear_dpb()
        p_net.set_curr_poc(0)
        p_net.add_ref_frame(None, enc0["x_hat"])
        s = [p_net.compress(f, qp)["bit_stream"] for f in seed_frames]
        return s

    # warmup: compile both single-frame adaptor variants + the GOP scan
    seed_encoder()
    p_net.compress_gop(chunks[0], qps)

    # pipelined chunk encode: dispatch chunk k+1's execution before
    # finishing chunk k, so the async D2H completes under compute
    from concurrent.futures import ThreadPoolExecutor
    seed_streams = seed_encoder()
    pool = ThreadPoolExecutor(max_workers=2)
    t0 = time.perf_counter()
    handles = [pool.submit(p_net.compress_gop_async(c, qps))
               for c in chunks]
    chunk_streams = [h.result() for h in handles]
    enc_elapsed = time.perf_counter() - t0
    pool.shutdown()

    enc_fps = n_frames / enc_elapsed
    total_bits = sum(len(s) * 8 for streams in chunk_streams
                     for s in streams)
    bpp = total_bits / (n_frames * height * width)
    enc_feature = p_net.dpb[0].feature

    dec_fps = None
    if os.environ.get("BENCH_DECODE", "1") not in ("0", "false"):
        d_net = DMC(dtype=dtype)
        d_net.load_params(p_net.params)
        d_net.update(force_zero_thres=fz)
        d_net.set_use_two_entropy_coders(use_two)
        sps = {"sps_id": 0, "height": height, "width": width,
               "ec_part": 1 if use_two else 0, "use_ada_i": 0}

        def seed_decoder():
            d_net.clear_dpb()
            d_net.set_curr_poc(0)
            d_net.add_ref_frame(None, enc0["x_hat"])
            for s in seed_streams:
                out = d_net.decompress(s, sps, qp)
            out["x_hat"].block_until_ready()

        # warm every graph (single-frame variants + the GOP scan);
        # block so no warmup execution bleeds into the timed region
        seed_decoder()
        d_net.decompress_gop(chunk_streams[0], sps, qps)["x_hat"] \
            .block_until_ready()

        seed_decoder()
        t0 = time.perf_counter()
        # pipelined: parse + upload chunk k+1 while chunk k executes
        # (uploads and execs overlap on the link; the feature chain
        # serializes only the execs)
        out = None
        up = d_net.upload_gop(chunk_streams[0], sps)
        for i in range(n_chunks):
            nxt = d_net.upload_gop(chunk_streams[i + 1], sps) \
                if i + 1 < n_chunks else None
            if up is not None:
                out = d_net.decompress_gop_uploaded(up, sps, qps)
            else:  # mixed ladder rungs: per-frame fallback
                out = d_net.decompress_gop(chunk_streams[i], sps, qps)
            up = nxt
        # decoded frames stay on-device (a production decoder hands
        # them to the next stage / display there); block on the last
        out["x_hat"].block_until_ready()
        dec_elapsed = time.perf_counter() - t0
        dec_fps = n_frames / dec_elapsed

        # correctness gate: decoder's propagated feature must equal the
        # encoder's exactly (the bit-exact temporal-chain contract)
        f_enc = np.asarray(enc_feature, np.float32)
        f_dec = np.asarray(d_net.dpb[0].feature, np.float32)
        assert np.array_equal(f_enc, f_dec), \
            "enc/dec feature chain diverged"

    intra_enc_fps = intra_dec_fps = None
    if os.environ.get("BENCH_INTRA", "1") not in ("0", "false"):
        n_intra = int(os.environ.get("BENCH_INTRA_FRAMES", 8))
        i_frames = [frame(t) for t in range(n_intra)]
        for f in i_frames:
            f.block_until_ready()
        # warm + measure the batched intra megastage (independent
        # frames: ONE execution + ONE dense fetch for the whole batch);
        # best-of-2 because the tunneled link's throughput fluctuates
        # and a single 8-frame batch can't average it out
        i_streams = i_net.compress_batch(i_frames, qp)["bit_streams"]
        if i_net._ec_rerun_count:
            # content beat the first-rung staging guess: the model has
            # learned the settled rung (models/dmci.py _ec_learned);
            # warm once more so the right-sized batch megastage is
            # compiled OUTSIDE the timed region
            i_streams = i_net.compress_batch(i_frames, qp)["bit_streams"]
        enc_times = []
        for _ in range(2):
            t0 = time.perf_counter()
            _, fin = i_net.compress_batch_async(i_frames, qp)
            i_streams = fin()
            enc_times.append(time.perf_counter() - t0)
        intra_enc_fps = n_intra / min(enc_times)

        i_dec = DMCI(dtype=dtype)
        i_dec.load_params(i_net.params)
        i_dec.update(force_zero_thres=fz)
        i_sps = {"sps_id": 0, "height": height, "width": width,
                 "ec_part": 1 if use_two else 0, "use_ada_i": 0}
        # block the warm call: an un-awaited warmup execution would
        # still hold the device when the timed call's upload starts
        i_dec.decompress_batch(i_streams, i_sps, qp)["x_hat"] \
            .block_until_ready()
        dec_times = []
        for _ in range(2):
            t0 = time.perf_counter()
            outs = i_dec.decompress_batch(i_streams, i_sps, qp)["x_hat"]
            outs.block_until_ready()
            dec_times.append(time.perf_counter() - t0)
        intra_dec_fps = n_intra / min(dec_times)

    if dec_fps is None:
        value = enc_fps
        vs = enc_fps / BASELINE_ENC_FPS
    else:
        value = min(enc_fps, dec_fps)
        vs = min(enc_fps / BASELINE_ENC_FPS, dec_fps / BASELINE_DEC_FPS)
    result = {
        "metric": "1080p_p_frame_enc_dec_fps",
        "value": round(value, 2),
        "unit": "fps",
        "vs_baseline": round(vs, 4),
        "enc_fps": round(enc_fps, 2),
        "dec_fps": None if dec_fps is None else round(dec_fps, 2),
        "bpp": round(bpp, 4),
        "gop_n": gop_n,
        "intra_enc_fps": None if intra_enc_fps is None
        else round(intra_enc_fps, 2),
        "intra_dec_fps": None if intra_dec_fps is None
        else round(intra_dec_fps, 2),
    }
    reruns = p_net._ec_rerun_count + i_net._ec_rerun_count
    if reruns:
        # staging-regrow ladder activity (should be confined to warmup
        # now that settled rungs persist; see models/dmc.py _ec_learned)
        result["ec_reruns"] = reruns
    print(json.dumps(result))
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# platform={platform} dtype={dtype_name} "
              f"frames={n_frames} gop={gop_n} {height}x{width} "
              f"enc={1e3 / enc_fps:.2f}ms "
              f"dec={'n/a' if dec_fps is None else f'{1e3 / dec_fps:.2f}ms'}"
              f" bpp={bpp:.4f}")


if __name__ == "__main__":
    main()
