"""Entropy-estimate vs real-bitstream cross-check.

The reference requires the analytic bit estimate and the written rANS
stream to agree within ~0.5% at 1080p for trained models (reference:
DCVC-family/DCVC-TCM/README.md:48).  With random weights and a tiny
frame the bound is looser (table quantization + per-plane constants),
but the two must still track each other closely — this validates the
whole probability-model -> CDF -> coder chain end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendcvc_tpu.models.dmci import DMCI
from opendcvc_tpu.training.forward import dmci_forward


def test_dmci_estimate_matches_stream():
    m = DMCI()
    m.init_params(seed=0)
    m.update()
    h = w = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    qp = 32

    out = dmci_forward(m.params, x, jnp.int32(qp), jax.random.PRNGKey(0),
                       quant_mode="ste")
    est_bits = float(out["bpp"]) * h * w

    enc = m.compress(x, qp)
    real_bits = len(enc["bit_stream"]) * 8

    # The estimate prices the QUANTIZED residual under the true scale;
    # the coder uses the 128-level quantized table.  With random weights
    # the wide-scale rows price escapes differently from the analytic
    # tail (measured 0.89x); trained checkpoints sit at ~0.96x
    # (docs/rd_evidence_r2.json) against the reference's <0.5% claim at
    # 1080p for fully-trained models.
    ratio = real_bits / est_bits
    assert 0.85 < ratio < 1.25, (est_bits, real_bits, ratio)


@pytest.mark.slow
def test_dmci_estimate_matches_stream_trained():
    """Trained weights keep residuals inside the CDF support, where the
    reference requires sub-percent estimate/stream agreement (DCVC-TCM
    README.md:48).  Runs against the committed reduced-channel
    checkpoint `docs/dmci_tiny_rd.msgpack` (regenerable
    deterministically with
    `python -m opendcvc_tpu.eval.rd_evidence --train_tiny ...`);
    OPENDCVC_TPU_DMCI_CKPT overrides with a full-size checkpoint."""
    import os
    path = os.environ.get(
        "OPENDCVC_TPU_DMCI_CKPT",
        os.path.join(os.path.dirname(__file__), "..", "docs",
                     "dmci_tiny_rd.msgpack"))
    if not os.path.exists(path):
        import pytest as _pytest
        _pytest.skip("no trained checkpoint available")

    from opendcvc_tpu.eval.rd_evidence import measure
    points = measure(path, qps=(20, 40), size=128, n_images=2)
    # measured 0.988-1.012 for the committed 10k-step tiny checkpoint
    # (docs/rd_evidence_r3.json); the residual ~1% is table
    # quantization + container overhead at small sizes
    for p in points:
        assert 0.97 < p["stream_vs_estimate"] < 1.03, p
        # rate control must actually modulate: higher QP -> fewer bits
    bpps = [p["bpp_stream"] for p in points]
    assert bpps[0] > bpps[-1] * 1.2, bpps


def test_1080p_sweep_artifact_inside_reference_bound():
    """Regression pin on the committed true-1080p sweep artifact.

    The reference REPORTS (as an observation about its own codec, not
    a requirement) that real-bitstream overhead vs the entropy
    estimate is 'usually less than 0.5%' at 1080p (DCVC-TCM
    README.md:48); our round-4 measurement of the tiny checkpoint at
    1920x1080 recorded 1.0003-1.0015 (docs/rd_evidence_r4_1080p.json),
    i.e. inside that observed envelope.  NOTE this test pins the
    checked-in artifact — it can only fail when the artifact is
    regenerated (`python -m opendcvc_tpu.eval.rd_evidence --ckpt
    docs/dmci_tiny_rd.msgpack --size 1080 --width 1920 ...`); it
    guards the artifact/claim from drifting apart, not the live
    codec."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "rd_evidence_r4_1080p.json")
    with open(path) as f:
        points = json.load(f)["points"]
    assert len(points) >= 4
    for p in points:
        assert 0.995 < p["stream_vs_estimate"] < 1.005, p
    bpps = [p["bpp_stream"] for p in points]
    assert all(a > b for a, b in zip(bpps, bpps[1:])), bpps
