"""Per-stage profiling for the codecs.

Parity with the reference profiling tools (reference:
DCVC-family/DCVC/layer_test.py per-module timing table and
dcvc_profiler.py JSON output): times each jitted stage of DMC/DMCI with
block_until_ready fences, reports a table + JSON, and can dump an XLA
profile trace for tensorboard.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _time_fn(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def profile_dmc(height=1080, width=1920, qp=21, iters=10, dtype=None,
                trace_dir=None):
    """Times every jitted stage of the DMC encode/decode paths.
    Returns {stage: ms}."""
    from ..models.dmc import DMC
    from ..models import common as CM
    from ..ops.fused import replicate_pad

    dtype = dtype or (jnp.bfloat16 if jax.default_backend() == "tpu"
                      else jnp.float32)
    net = DMC(dtype=dtype)
    net.init_params(seed=0)

    pr, pb = CM.get_padding_size(height, width, 16)
    rng = np.random.default_rng(0)
    x = replicate_pad(
        jnp.asarray(rng.random((1, height, width, 3)), dtype), pb, pr)
    ref = replicate_pad(
        jnp.asarray(rng.random((1, height, width, 3)), dtype), pb, pr)
    qp_dev = jnp.int32(qp)
    p = net.params

    results = {}
    feature = net._j_adaptor_i(p, ref)
    results["feature_adaptor_i"] = _time_fn(net._j_adaptor_i, p, ref,
                                            iters=iters)
    results["feature_adaptor_p"] = _time_fn(net._j_adaptor_p, p, feature,
                                            iters=iters)
    x1, ctx_t = net._j_fe_part1(p, feature, qp_dev)
    results["feature_extractor_part1"] = _time_fn(
        net._j_fe_part1, p, feature, qp_dev, iters=iters)
    ctx = net._j_fe_part2(p, x1)
    results["feature_extractor_part2"] = _time_fn(net._j_fe_part2, p, x1,
                                                  iters=iters)
    y, z_hat, z_int8 = net._j_encode_y(p, x, ctx, qp_dev)
    results["encoder+hyper_enc"] = _time_fn(net._j_encode_y, p, x, ctx,
                                            qp_dev, iters=iters)
    prior = net._j_prior(p, z_hat, ctx_t)
    results["hyper_dec+prior_fusion"] = _time_fn(net._j_prior, p, z_hat,
                                                 ctx_t, iters=iters)
    y_div, packed0, skip0, y_hat_0 = net._j_enc_pass0(y, prior, None)
    results["enc_pass0(fused)"] = _time_fn(
        lambda *a: net._j_enc_pass0(*a, None), y, prior, iters=iters)
    s1, m1 = net._j_spatial(p, y_hat_0, prior)
    results["spatial_prior"] = _time_fn(net._j_spatial, p, y_hat_0, prior,
                                        iters=iters)
    results["enc_pass1(fused)"] = _time_fn(
        lambda *a: net._j_enc_pass1(*a, None), y_div, s1, m1, iters=iters)
    feat_out = net._j_feature_out(p, y_hat_0, y_hat_0, prior, ctx, qp_dev)
    results["latent_decoder(feature_out)"] = _time_fn(
        net._j_feature_out, p, y_hat_0, y_hat_0, prior, ctx, qp_dev,
        iters=iters)
    results["recon_generation"] = _time_fn(net._j_recon_x, p, feat_out,
                                           qp_dev, iters=iters)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            net._j_encode_y(p, x, ctx, qp_dev)
            net._j_recon_x(p, feat_out, qp_dev)
            jax.block_until_ready(feat_out)

    return results


def print_table(results, title="stage timings"):
    width = max(len(k) for k in results) + 2
    total = sum(results.values())
    print(f"== {title} ==")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<{width}} {v:8.3f} ms  ({100 * v / total:4.1f}%)")
    print(f"  {'TOTAL (device stages)':<{width}} {total:8.3f} ms")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json_out", type=str, default=None)
    ap.add_argument("--trace_dir", type=str, default=None)
    args = ap.parse_args()
    res = profile_dmc(args.height, args.width, iters=args.iters,
                      trace_dir=args.trace_dir)
    print_table(res, f"DMC stages @ {args.width}x{args.height}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
