#!/usr/bin/env python3
"""Headline benchmark: 1080p P-frame encode AND decode throughput (DMC
codec, full pipeline: NN forward + device-side rANS + container
assembly on encode; container parse + upload + device-side rANS + NN
reconstruction on decode).

Prints ONE JSON line:
  {"metric": "1080p_p_frame_enc_dec_fps", "value": N, "unit": "fps",
   "vs_baseline": N, "enc_fps": N, "dec_fps": N, "bpp": N}
value = min(enc_fps, dec_fps); vs_baseline compares that minimum
against the corresponding A100 figure (125.2 enc / 112.8 dec fps,
reference README.md:35).

Env overrides:
  BENCH_FRAMES (default 16), BENCH_HEIGHT/BENCH_WIDTH (default
  1080/1920), BENCH_DTYPE (float32|bfloat16, default bfloat16 on tpu
  else float32), BENCH_Q_SCALE (default 0.25), BENCH_PIPELINE_DEPTH
  (default 8), BENCH_DECODE=0 to skip the decode half.
"""

import json
import os
import time

import numpy as np

BASELINE_ENC_FPS = 125.2
BASELINE_DEC_FPS = 112.8


def main():
    # device-side entropy coding is the fastest configuration measured
    # on tunneled devices; callers can override via env
    os.environ.setdefault("OPENDCVC_TPU_DEVICE_EC", "1")
    os.environ.setdefault("OPENDCVC_TPU_EC_LANES", "4096")
    os.environ.setdefault("OPENDCVC_TPU_EC_BPS", "0.4")
    os.environ.setdefault("OPENDCVC_TPU_EC_CAP_FRAC", "0.375")
    import opendcvc_tpu  # noqa: F401  (pins XLA determinism flags)
    import jax
    import jax.numpy as jnp
    from opendcvc_tpu.models.dmc import DMC
    from opendcvc_tpu.models.dmci import DMCI
    from opendcvc_tpu.models import common as CM
    from opendcvc_tpu.ops.fused import replicate_pad

    platform = jax.devices()[0].platform
    n_frames = int(os.environ.get("BENCH_FRAMES", 16))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    dtype_name = os.environ.get(
        "BENCH_DTYPE", "bfloat16" if platform == "tpu" else "float32")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    i_net = DMCI(dtype=dtype)
    i_net.init_params(seed=0)
    i_net.update()
    p_net = DMC(dtype=dtype)
    p_net.init_params(seed=1)
    # moderate symbol magnitudes for the entropy-coding load
    q_scale = float(os.environ.get("BENCH_Q_SCALE", 0.25))
    p_net.params["q_encoder"] = p_net.params["q_encoder"] * q_scale
    p_net.update()

    pr, pb = CM.get_padding_size(height, width, 16)
    use_two = height * width > 1280 * 720
    i_net.set_use_two_entropy_coders(use_two)
    p_net.set_use_two_entropy_coders(use_two)

    rng = np.random.default_rng(0)
    base = rng.random((1, height, width, 3), dtype=np.float32)

    def frame(t):
        x = np.roll(base, 4 * t, axis=2)
        return jnp.asarray(replicate_pad(jnp.asarray(x, dtype), pb, pr))

    # I-frame to seed the DPB
    x0 = frame(0)
    enc0 = i_net.compress(x0, 21)
    p_net.clear_dpb()
    p_net.set_curr_poc(0)
    p_net.add_ref_frame(None, enc0["x_hat"])

    # warmup (compile both adaptor variants + any staging regrow step)
    for t in (1, 2):
        s = p_net.compress(frame(t), 21)
        assert len(s["bit_stream"]) > 0

    # pipelined encode: each frame is ONE device execution; its D2H
    # (started async right after dispatch) and container assembly run on
    # a single coder thread, overlapping the following frames' compute —
    # the reference hides rANS behind compute with CUDA streams + worker
    # threads the same way (video_model.py:314-337)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", 8))
    frames = [frame(t) for t in range(3, 3 + n_frames)]
    for f in frames:
        f.block_until_ready()
    total_bits = 0
    pending = deque()
    # several finish workers: each frame's D2H fetch pays full link
    # latency, so fetches of consecutive frames must be in flight
    # together (results stay ordered — futures pop in submit order)
    workers = int(os.environ.get("BENCH_FINISH_WORKERS", 4))
    pool = ThreadPoolExecutor(max_workers=workers)
    t0 = time.perf_counter()
    for x in frames:
        pending.append(pool.submit(p_net.compress_async(x, 21)))
        if len(pending) > depth:
            total_bits += len(pending.popleft().result()) * 8
    while pending:
        total_bits += len(pending.popleft().result()) * 8
    enc_elapsed = time.perf_counter() - t0
    pool.shutdown()

    enc_fps = n_frames / enc_elapsed
    bpp = total_bits / (n_frames * height * width)

    dec_fps = None
    if os.environ.get("BENCH_DECODE", "1") not in ("0", "false"):
        # re-encode deterministically for the decode half
        streams = []
        p_net.clear_dpb()
        p_net.set_curr_poc(0)
        p_net.add_ref_frame(None, enc0["x_hat"])
        for x in frames:
            streams.append(p_net.compress(x, 21)["bit_stream"])
        d_net = DMC(dtype=dtype)
        d_net.load_params(p_net.params)
        d_net.update()
        d_net.set_use_two_entropy_coders(use_two)
        sps = {"sps_id": 0, "height": height, "width": width,
               "ec_part": 1 if use_two else 0, "use_ada_i": 0}

        def decode_all():
            d_net.clear_dpb()
            d_net.set_curr_poc(0)
            d_net.add_ref_frame(None, enc0["x_hat"])
            out = None
            for s in streams:
                out = d_net.decompress(s, sps, 21)
            # decoded frames stay on-device (a production decoder hands
            # them to the next stage / display there); block on the last
            out["x_hat"].block_until_ready()
            return out

        decode_all()  # warm every graph
        t0 = time.perf_counter()
        out = decode_all()
        dec_elapsed = time.perf_counter() - t0
        dec_fps = len(streams) / dec_elapsed

        # correctness gate: decoder's propagated feature must equal the
        # encoder's exactly (the bit-exact temporal-chain contract)
        f_enc = np.asarray(p_net.dpb[0].feature, np.float32)
        f_dec = np.asarray(d_net.dpb[0].feature, np.float32)
        assert np.array_equal(f_enc, f_dec), \
            "enc/dec feature chain diverged"

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
    }
    print(json.dumps(result))
    if os.environ.get("BENCH_VERBOSE"):
        print(f"# platform={platform} dtype={dtype_name} "
              f"frames={n_frames} {height}x{width} "
              f"enc={1e3 / enc_fps:.2f}ms "
              f"dec={'n/a' if dec_fps is None else f'{1e3 / dec_fps:.2f}ms'}"
              f" bpp={bpp:.4f}")


if __name__ == "__main__":
    main()
