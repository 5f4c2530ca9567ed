"""Adaptive launch sizing for the device-EC staging rectangle.

Trained checkpoints operate well above the first-rung staging guess, and
round 4 showed what that costs: every batch paid the regrow ladder — one
re-execution plus one full refetch per overflowing frame (the 8x
trained-intra collapse in docs/bench_r4_ckpt.json).  The fix remembers
the settled bytes-per-symbol per frame size (models/dmci.py
_ec_learned) so only the FIRST launch regrows.  The contract under
test: launch adaptation must NOT leak into the bitstream — containers
are serialized at the rung a default-start ladder settles at, a pure
function of the frame's payload, so streams stay byte-identical no
matter what was encoded before (the reference's coder is likewise
content-deterministic: worst-case-sized buffers, no history,
reference src/models/entropy_models.py).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp


def _hot_env():
    # a deliberately undersized first rung: few lanes -> long lanes,
    # tiny bps -> the mw floor (12 words) is all the rectangle offers,
    # so every frame overflows it
    return {"OPENDCVC_TPU_DEVICE_EC": "1", "OPENDCVC_TPU_EC_BPS": "0.02",
            "OPENDCVC_TPU_EC_LANES": "64"}


def _with_env(env, fn):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return fn()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_dmci_learned_launch_keeps_streams_deterministic():
    from opendcvc_tpu.models.dmci import DMCI
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))

    def run():
        net = DMCI()
        net.init_params(seed=0)
        net.update()
        s1 = net.compress(x, 20)["bit_stream"]
        r1 = net._ec_rerun_count
        assert r1 > 0, "test premise: first launch must overflow"
        assert net._ec_learned, "settled rate must be remembered"
        s2 = net.compress(x, 20)["bit_stream"]
        # learned launch: no further reruns, byte-identical stream
        assert net._ec_rerun_count == r1
        assert s2 == s1
        # batched path shares the learned rate and the same contract
        sb = net.compress_batch([x, x], 20)["bit_streams"]
        assert net._ec_rerun_count == r1
        assert sb[0] == s1 and sb[1] == s1

        # a FRESH encoder (no history) must emit the same bytes
        net2 = DMCI()
        net2.load_params(net.params)
        net2.update()
        assert net2.compress(x, 20)["bit_stream"] == s1

        dec = DMCI()
        dec.load_params(net.params)
        dec.update()
        sps = {"sps_id": 0, "height": 64, "width": 96, "ec_part": 0,
               "use_ada_i": 0}
        out = dec.decompress(s1, sps, 20)["x_hat"]
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(net.compress(x, 20)["x_hat"]))

    _with_env(_hot_env(), run)


def test_dmc_learned_launch_keeps_streams_deterministic():
    from opendcvc_tpu.models.dmc import DMC
    rng = np.random.default_rng(13)
    x0 = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    # an independent random frame: the residual is dense noise, which a
    # random-init P-net prices expensively — guarantees the undersized
    # first rung overflows
    x1 = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))

    def fresh(params):
        from opendcvc_tpu.models.dmc import DMC
        net = DMC()
        if params is None:
            net.init_params(seed=0)
        else:
            net.load_params(params)
        net.update()
        net.clear_dpb()
        net.set_curr_poc(0)
        net.add_ref_frame(None, x0)
        return net

    def run():
        enc = fresh(None)
        s1 = enc.compress(x1, 0)["bit_stream"]
        r1 = enc._ec_rerun_count
        assert r1 > 0, "test premise: first launch must overflow"
        assert enc._ec_learned

        # same frame from a fresh DPB on the SAME net: learned launch,
        # zero reruns, identical bytes
        enc.clear_dpb()
        enc.set_curr_poc(0)
        enc.add_ref_frame(None, x0)
        s2 = enc.compress(x1, 0)["bit_stream"]
        assert enc._ec_rerun_count == r1
        assert s2 == s1

        # fresh encoder, no history: identical bytes
        enc2 = fresh(enc.params)
        assert enc2.compress(x1, 0)["bit_stream"] == s1
        return enc.params

    params = _with_env(_hot_env(), run)

    def run_decode():
        from opendcvc_tpu.models.dmc import DMC
        dec = fresh(params)
        sps = {"sps_id": 0, "height": 128, "width": 128, "ec_part": 0,
               "use_ada_i": 0}
        enc = fresh(params)
        s = enc.compress(x1, 0)["bit_stream"]
        out = dec.decompress(s, sps, 0)
        np.testing.assert_array_equal(
            np.asarray(dec.dpb[0].feature, np.float32),
            np.asarray(enc.dpb[0].feature, np.float32))

    _with_env(_hot_env(), run_decode)
