"""DCVC-FM harness end-to-end test (tiny synthetic PNG sequence)."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_fm_harness_end_to_end(tmp_path):
    seq_dir = tmp_path / "data" / "seqA"
    seq_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    for i in range(3):
        Image.fromarray(np.roll(base, i * 2, axis=1)).save(
            seq_dir / f"im{i + 1}.png")
    config = {
        "root_path": str(tmp_path),
        "test_classes": {
            "tiny": {"test": 1, "base_path": "data", "src_type": "png",
                     "sequences": {"seqA": {"width": 64, "height": 48,
                                            "frames": 3,
                                            "intra_period": -1}}}},
    }
    cfg = tmp_path / "config.json"
    with open(cfg, "w") as f:
        json.dump(config, f)

    from opendcvc_tpu.eval.fm_harness import main
    out_json = str(tmp_path / "out.json")
    main(["--test_config", str(cfg), "--output_path", out_json,
          "--rate_num", "1", "--qp_i", "21", "--qp_p", "21",
          "--stream_path", str(tmp_path / "bins"),
          "--reset_interval", "2", "--force_frame_num", "3"])

    with open(out_json) as f:
        results = json.load(f)
    r = results["tiny"]["seqA"]["000"]
    assert r["i_frame_num"] == 1 and r["p_frame_num"] == 2
    assert r["ave_all_frame_bpp"] > 0
