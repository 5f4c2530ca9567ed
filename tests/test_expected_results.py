"""Expected-result fixture, mirroring the reference's
recommended_test_full_results_IP*.json pattern (reference:
DCVC-family/DCVC-TCM/recommended_test_full_results_IP32.json — a
committed harness output that reruns must reproduce).

The committed fixture `docs/expected_synthetic_results.json` is the
full eval-harness output on a deterministic synthetic sequence with
seed-0 random weights.  Any change that shifts the coded rate or the
reconstruction (container overhead, prior drift, quantizer changes,
index bugs) shows up here even when the in-run encode/decode roundtrips
still agree with each other.  bpp is compared within 2% and PSNR within
0.1 dB so XLA fusion-level float jitter doesn't trip it.

Regenerate after an INTENDED rate/quality change:
    OPENDCVC_TPU_UPDATE_EXPECTED=1 python -m pytest \
        tests/test_expected_results.py -q
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "expected_synthetic_results.json")


def _run_harness(tmp_path):
    seq_dir = tmp_path / "data" / "seqA"
    seq_dir.mkdir(parents=True)
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    for i in range(5):
        img = np.roll(base, i * 3, axis=1)
        noise = rng.integers(-4, 5, img.shape)
        img = np.clip(img.astype(np.int32) + noise, 0, 255) \
            .astype(np.uint8)
        Image.fromarray(img).save(seq_dir / f"im{i + 1}.png")
    config = {
        "root_path": str(tmp_path),
        "test_classes": {
            "synth": {
                "test": 1,
                "base_path": "data",
                "src_type": "png",
                "sequences": {
                    "seqA": {"width": 128, "height": 128, "frames": 5,
                             "intra_period": -1},
                },
            },
        },
    }
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    out_json = str(tmp_path / "out.json")
    from opendcvc_tpu.eval.harness import main
    main([
        "--test_config", str(cfg_path),
        "--output_path", out_json,
        "--rate_num", "2",
        "--qp_i", "16", "48",
        "--qp_p", "16", "48",
        "--stream_path", str(tmp_path / "bins"),
        "--reset_interval", "4",
        "--seed", "0",
    ])
    with open(out_json) as f:
        return json.load(f)


@pytest.mark.slow
def test_expected_synthetic_results(tmp_path):
    got = _run_harness(tmp_path)
    if os.environ.get("OPENDCVC_TPU_UPDATE_EXPECTED"):
        with open(FIXTURE, "w") as f:
            json.dump(got, f, indent=2)
        pytest.skip("fixture regenerated")
    with open(FIXTURE) as f:
        want = json.load(f)

    for rate_key in ("000", "001"):
        g = got["synth"]["seqA"][rate_key]
        w = want["synth"]["seqA"][rate_key]
        assert g["i_frame_num"] == w["i_frame_num"]
        assert g["p_frame_num"] == w["p_frame_num"]
        assert abs(g["ave_all_frame_bpp"] - w["ave_all_frame_bpp"]) \
            <= 0.02 * w["ave_all_frame_bpp"] + 1e-6, rate_key
        assert abs(g["ave_all_frame_psnr"] - w["ave_all_frame_psnr"]) \
            <= 0.1, rate_key
