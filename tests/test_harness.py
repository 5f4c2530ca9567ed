"""End-to-end evaluation-harness test: synthetic PNG sequence through the
full CLI path (encode -> NAL bitstream file -> decode -> metrics -> JSON),
mirroring the reference's RD-evaluation-as-test strategy."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def tiny_dataset(tmp_path):
    seq_dir = tmp_path / "data" / "seqA"
    seq_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    for i in range(3):
        img = np.roll(base, i * 2, axis=1)
        Image.fromarray(img).save(seq_dir / f"im{i + 1}.png")
    config = {
        "root_path": str(tmp_path),
        "test_classes": {
            "tiny": {
                "test": 1,
                "base_path": "data",
                "src_type": "png",
                "sequences": {
                    "seqA": {"width": 64, "height": 48, "frames": 3,
                             "intra_period": -1},
                },
            },
        },
    }
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return str(cfg_path), tmp_path


def test_harness_end_to_end(tiny_dataset, tmp_path):
    cfg_path, root = tiny_dataset
    out_json = str(tmp_path / "out.json")
    stream_path = str(tmp_path / "bins")

    from opendcvc_tpu.eval.harness import main
    main([
        "--test_config", cfg_path,
        "--output_path", out_json,
        "--rate_num", "2",
        "--qp_i", "10", "50",
        "--qp_p", "10", "50",
        "--stream_path", stream_path,
        "--reset_interval", "2",
        "--seed", "0",
    ])

    with open(out_json) as f:
        results = json.load(f)
    assert "tiny" in results and "seqA" in results["tiny"]
    for rate_key in ("000", "001"):
        r = results["tiny"]["seqA"][rate_key]
        assert r["i_frame_num"] == 1
        assert r["p_frame_num"] == 2
        assert r["ave_all_frame_bpp"] > 0
        assert np.isfinite(r["ave_all_frame_psnr"])
    # bitstream files were written and are non-trivial
    bins = os.listdir(os.path.join(stream_path, "tiny"))
    assert any(b.endswith(".bin") for b in bins)


@pytest.mark.slow
def test_harness_yuv420_end_to_end(tmp_path):
    """The reference's primary eval condition is raw YUV420 input with
    PSNR_avg = (6*Y+U+V)/8 (reference test_video.py:74-91, 110-118;
    test_conditions.md).  Drive a synthetic .yuv sequence through the
    full CLI: read -> 420->444 -> codec -> 444->420 -> recon write ->
    weighted PSNR."""
    seq_dir = tmp_path / "data"
    seq_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    h, w, n = 48, 64, 3
    with open(seq_dir / "seqY.yuv", "wb") as f:
        base_y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        base_uv = rng.integers(0, 256, (h // 2, w)).astype(np.uint8)
        for i in range(n):
            f.write(np.roll(base_y, 2 * i, axis=1).tobytes())
            f.write(np.roll(base_uv, i, axis=1).tobytes())
    config = {
        "root_path": str(tmp_path),
        "test_classes": {
            "tinyyuv": {
                "test": 1,
                "base_path": "data",
                "src_type": "yuv420",
                "sequences": {
                    "seqY": {"width": w, "height": h, "frames": n,
                             "intra_period": -1},
                },
            },
        },
    }
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    out_json = str(tmp_path / "out.json")
    stream_path = str(tmp_path / "bins")
    from opendcvc_tpu.eval.harness import main
    main([
        "--test_config", str(cfg_path),
        "--output_path", out_json,
        "--rate_num", "1",
        "--qp_i", "20",
        "--qp_p", "20",
        "--stream_path", stream_path,
        "--save_decoded_frame", "1",
        "--seed", "0",
    ])

    with open(out_json) as f:
        results = json.load(f)
    r = results["tinyyuv"]["seqY"]["000"]
    assert r["i_frame_num"] == 1 and r["p_frame_num"] == n - 1
    assert r["ave_all_frame_bpp"] > 0
    assert np.isfinite(r["ave_all_frame_psnr"])
    # a reconstruction .yuv of the right raw size was written
    rec_dir = os.path.join(stream_path, "tinyyuv")
    recs = [f for f in os.listdir(rec_dir) if f.endswith(".yuv")]
    assert recs, os.listdir(rec_dir)
    sz = os.path.getsize(os.path.join(rec_dir, recs[0]))
    assert sz == n * (h * w + h * w // 2)
    # the weighted PSNR actually reflects (6Y+U+V)/8: recompute from
    # the written reconstruction
    with open(seq_dir / "seqY.yuv", "rb") as f:
        src = np.frombuffer(f.read(), np.uint8).astype(np.float64)
    with open(os.path.join(rec_dir, recs[0]), "rb") as f:
        rec = np.frombuffer(f.read(), np.uint8).astype(np.float64)
    fsz = h * w + h * w // 2
    psnrs = []
    for i in range(n):
        s = src[i * fsz:(i + 1) * fsz] / 255.0
        d = rec[i * fsz:(i + 1) * fsz] / 255.0
        sy, suv = s[:h * w], s[h * w:]
        dy, duv = d[:h * w], d[h * w:]
        su, sv = suv[:h * w // 4], suv[h * w // 4:]
        du, dv = duv[:h * w // 4], duv[h * w // 4:]

        def psnr(a, b):
            mse = np.mean((a - b) ** 2)
            return 99.9 if mse < 1e-10 else min(
                99.9, -10 * np.log10(mse))
        psnrs.append((6 * psnr(sy, dy) + psnr(su, du)
                      + psnr(sv, dv)) / 8)
    # written-recon PSNR is quantized to uint8, so allow a wide-ish
    # tolerance against the float-domain number in the log
    assert abs(np.mean(psnrs) - r["ave_all_frame_psnr"]) < 0.5


@pytest.mark.slow
def test_harness_device_ec_skip_matches_host(tiny_dataset, tmp_path):
    """The full CLI in device-EC mode with the reference's recommended
    skip setting (--force_zero_thres, reference README eval command)
    must produce the same bpp/PSNR results as the host-coder path —
    the end-to-end integration of the SKIP_ROW device lanes."""
    cfg_path, root = tiny_dataset
    from opendcvc_tpu.eval.harness import main

    outs = {}
    for tag, dev in (("host", "0"), ("dev", "1")):
        os.environ["OPENDCVC_TPU_DEVICE_EC"] = dev
        try:
            out_json = str(tmp_path / f"out_{tag}.json")
            main([
                "--test_config", cfg_path,
                "--output_path", out_json,
                "--rate_num", "2",
                "--qp_i", "10", "50",
                "--qp_p", "10", "50",
                "--stream_path", str(tmp_path / f"bins_{tag}"),
                "--seed", "0",
                "--force_zero_thres", "0.12",
            ])
            with open(out_json) as f:
                outs[tag] = json.load(f)
        finally:
            os.environ["OPENDCVC_TPU_DEVICE_EC"] = "0"

    r_host = outs["host"]["tiny"]["seqA"]
    r_dev = outs["dev"]["tiny"]["seqA"]
    # the tpu-lane container carries ~6 B per lane (u16 len + u32 rANS
    # state) that the host NAL container does not; at 48x64 that fixed
    # cost dominates, so bound it explicitly via the effective lane
    # count the planner picks for this frame size
    from opendcvc_tpu.entropy.device_rans import effective_lanes
    lanes = effective_lanes(4096, 2 * ((48 // 16) * (64 // 16) * 64)
                            + 1 * 1 * 128)
    overhead_bpp = (6 * lanes + 32) * 8 / (48 * 64)
    for rate_key in ("000", "001"):
        # identical floats: both paths decode identical frames; only
        # the container differs (so bpp differs by bounded overhead)
        assert r_dev[rate_key]["ave_all_frame_psnr"] == \
            r_host[rate_key]["ave_all_frame_psnr"], rate_key
        assert r_dev[rate_key]["ave_all_frame_bpp"] < \
            r_host[rate_key]["ave_all_frame_bpp"] * 1.1 \
            + overhead_bpp * 1.2 + 0.05, rate_key


def test_harness_worker_fanout_identical(tiny_dataset, tmp_path):
    """--worker N must produce identical results to serial (reference
    fans jobs over a process pool, test_video.py:439-442)."""
    cfg_path, root = tiny_dataset
    from opendcvc_tpu.eval.harness import main

    outs = {}
    for tag, workers in (("w1", "1"), ("w2", "2")):
        out_json = str(tmp_path / f"out_{tag}.json")
        main([
            "--test_config", cfg_path,
            "--output_path", out_json,
            "--rate_num", "2",
            "--qp_i", "10", "50",
            "--qp_p", "10", "50",
            "--stream_path", str(tmp_path / f"bins_{tag}"),
            "--seed", "0",
            "--worker", workers,
        ])
        with open(out_json) as f:
            outs[tag] = json.load(f)

    # timing fields differ run to run; everything else must match
    def strip_times(d):
        if isinstance(d, dict):
            return {k: strip_times(v) for k, v in d.items()
                    if "time" not in k}
        return d

    assert strip_times(outs["w1"]) == strip_times(outs["w2"])
