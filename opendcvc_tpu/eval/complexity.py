"""Model complexity reporting (FLOPs / params).

Parity with the reference's ptflops-based complexity tool (reference:
DCVC-family/EVC/model_complexity.py:21-33), computed natively from XLA's
compiled cost analysis instead of a torch module walker.
"""

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params):
    leaves = jax.tree_util.tree_leaves(params)
    return sum(int(np.prod(a.shape)) for a in leaves)


def flops_of(fn, *args):
    """FLOPs of a jitted callable from XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def report_dmci(height=768, width=512):
    from ..models.dmci import DMCI, dmci_init, _stage_enc_front
    import jax.random as jr
    params = dmci_init(jr.PRNGKey(0))
    x = jnp.zeros((1, height, width, 3), jnp.float32)
    qp = jnp.int32(32)
    n_params = count_params(params)
    fl = flops_of(_stage_enc_front, params, x, qp)
    return {"model": "DMCI", "input": f"{width}x{height}",
            "params": n_params, "enc_front_flops": fl,
            "enc_front_gmacs": fl / 2e9}


def report_fn(name, fn, params, *args):
    return {"model": name, "params": count_params(params),
            "flops": flops_of(fn, params, *args)}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--width", type=int, default=512)
    args = ap.parse_args()
    rep = report_dmci(args.height, args.width)
    for k, v in rep.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
