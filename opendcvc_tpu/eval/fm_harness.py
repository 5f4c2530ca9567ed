"""DCVC-FM evaluation harness.

Re-design of the reference FM test driver (reference:
DCVC-family/DCVC-FM/test_video.py + test_helper.py): FM NAL streams
carry qp and fa_idx in the SPS (no per-frame qp byte), hierarchical QP
over the rate GOP via index_map [0,1,0,2,0,2,0,2] with qp_shift, and
periodic feature refresh via fa_idx=3 (decoder re-anchors on its stored
frame).
"""

import argparse
import io
import json
import os
import time

import numpy as np
import jax.numpy as jnp

from ..models.dmc_fm import DMCFM
from ..models.dmci_fm import DMCIFM
from ..models import common as CM
from ..utils import stream_helper_fm as SF
from ..utils.common import str2bool, create_folder, generate_log_json, \
    dump_json
from ..utils import checkpoint as ckpt
from .harness import (get_src_reader, get_src_frame, get_distortion)

INDEX_MAP = [0, 1, 0, 2, 0, 2, 0, 2]
QP_SHIFT = [0, 8, 4, 0]


def run_one_point(p_net, i_net, args):
    frame_num = args["frame_num"]
    intra_period = args["intra_period"]
    reset_interval = args.get("reset_interval", 32)
    pic_h, pic_w = args["src_height"], args["src_width"]
    padding_r, padding_b = CM.get_padding_size(pic_h, pic_w, 16)

    src_reader = get_src_reader(args)
    sps_helper = SF.SPSHelper()
    output_buff = io.BytesIO()
    frame_types, psnrs, msssims, bits = [], [], [], []
    enc_times, dec_times = [], []
    start_time = time.time()

    dpb = None
    for frame_idx in range(frame_num):
        x, y, u, v, rgb = get_src_frame(args, src_reader,
                                        (padding_b, padding_r))
        x.block_until_ready()
        t0 = time.time()
        is_i = frame_idx == 0 or (intra_period > 0
                                  and frame_idx % intra_period == 0)
        if is_i:
            qp = args["qp_i"]
            fa_idx = 0
            enc = i_net.compress(x, qp)
            dpb = {"ref_frame": enc["x_hat"], "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            frame_types.append(0)
        else:
            fa_idx = INDEX_MAP[frame_idx % 8]
            if reset_interval > 0 and frame_idx % reset_interval == 1:
                fa_idx = 3
                dpb = dict(dpb, ref_feature=None, ref_mv_feature=None,
                           ref_y=None, ref_mv_y=None)
            qp = min(args["qp_p"] + QP_SHIFT[fa_idx], 63)
            enc = p_net.compress(x, dpb, qp, min(fa_idx, 2))
            dpb = enc["dpb"]
            frame_types.append(1)

        sps = {"sps_id": -1, "height": pic_h, "width": pic_w, "qp": qp,
               "fa_idx": fa_idx}
        sps_id, new = sps_helper.get_sps_id(sps)
        sps["sps_id"] = sps_id
        n = SF.write_sps(output_buff, sps) if new else 0
        n += SF.write_ip(output_buff, is_i, sps_id, enc["bit_stream"])
        bits.append(n * 8)
        enc_times.append(time.time() - t0)

    src_reader.close()
    with open(args["curr_bin_path"], "wb") as f:
        f.write(output_buff.getbuffer())
    output_buff.close()

    # decode
    sps_helper = SF.SPSHelper()
    with open(args["curr_bin_path"], "rb") as f:
        input_buff = io.BytesIO(f.read())
    src_reader = get_src_reader(args)
    dpb = None
    decoded = 0
    while decoded < frame_num:
        _, y, u, v, rgb = get_src_frame(args, src_reader)
        t0 = time.time()
        header = SF.read_header(input_buff)
        while header["nal_type"] == SF.NalType.NAL_SPS:
            sps = SF.read_sps_remaining(input_buff, header["sps_id"])
            sps_helper.add_sps_by_id(sps)
            header = SF.read_header(input_buff)
        sps = sps_helper.get_sps_by_id(header["sps_id"])
        stream = SF.read_ip_remaining(input_buff)

        if header["nal_type"] == SF.NalType.NAL_I:
            out = i_net.decompress(stream, sps)
            dpb = {"ref_frame": out["x_hat"], "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        else:
            if sps["fa_idx"] == 3:
                dpb = dict(dpb, ref_feature=None, ref_mv_feature=None,
                           ref_y=None, ref_mv_y=None)
            dsps = dict(sps, fa_idx=min(sps["fa_idx"], 2))
            out = p_net.decompress(stream, dpb, dsps)
            dpb = out["dpb"]
        x_hat = dpb["ref_frame"]
        x_hat.block_until_ready()
        dec_times.append(time.time() - t0)
        cp, cs = get_distortion(args, x_hat, y, u, v, rgb)
        psnrs.append(cp)
        msssims.append(cs)
        decoded += 1
    input_buff.close()
    src_reader.close()

    test_time = time.time() - start_time
    avg_enc = sum(enc_times[1:]) / max(len(enc_times) - 1, 1)
    avg_dec = sum(dec_times[1:]) / max(len(dec_times) - 1, 1)
    log = generate_log_json(frame_num, pic_h * pic_w, test_time,
                            frame_types, bits, psnrs, msssims,
                            avg_encoding_time=avg_enc,
                            avg_decoding_time=avg_dec)
    with open(args["curr_json_path"], "w") as f:
        json.dump(log, f, indent=2)
    return log


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DCVC-FM RD evaluation")
    p.add_argument("--model_path_i", type=str, default=None)
    p.add_argument("--model_path_p", type=str, default=None)
    p.add_argument("--rate_num", type=int, default=4)
    p.add_argument("--qp_i", type=int, nargs="+")
    p.add_argument("--qp_p", type=int, nargs="+")
    p.add_argument("--force_intra_period", type=int, default=-1)
    p.add_argument("--reset_interval", type=int, default=32)
    p.add_argument("--force_frame_num", type=int, default=-1)
    p.add_argument("--test_config", type=str, required=True)
    p.add_argument("--force_root_path", type=str, default=None)
    p.add_argument("--calc_ssim", type=str2bool, default=False)
    p.add_argument("--stream_path", type=str, default="out_bin_fm")
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    with open(args.test_config) as f:
        config = json.load(f)

    qp_i = args.qp_i or [int(i + 0.5) for i in
                         np.linspace(0, 63, args.rate_num)]
    qp_p = args.qp_p or qp_i

    i_net = DMCIFM()
    if args.model_path_i:
        i_net.load_params(ckpt.load_params(args.model_path_i))
    else:
        i_net.init_params(seed=args.seed)
    i_net.update()
    p_net = DMCFM()
    if args.model_path_p:
        p_net.load_params(ckpt.load_params(args.model_path_p))
    else:
        p_net.init_params(seed=args.seed + 1)
    p_net.update()

    root_path = args.force_root_path or config["root_path"]
    results = {}
    for ds_name, ds in config["test_classes"].items():
        if ds.get("test", 1) == 0:
            continue
        results[ds_name] = {}
        for seq, info in ds["sequences"].items():
            results[ds_name][seq] = {}
            for ri in range(len(qp_i)):
                cur = {
                    "src_type": ds["src_type"],
                    "src_height": info["height"],
                    "src_width": info["width"],
                    "frame_num": args.force_frame_num
                    if args.force_frame_num > 0 else info["frames"],
                    "intra_period": args.force_intra_period
                    if args.force_intra_period > 0
                    else info["intra_period"],
                    "reset_interval": args.reset_interval,
                    "qp_i": qp_i[ri], "qp_p": qp_p[ri],
                    "calc_ssim": args.calc_ssim,
                }
                bin_folder = os.path.join(args.stream_path, ds_name)
                create_folder(bin_folder)
                cur["src_path"] = os.path.join(root_path, ds["base_path"],
                                               seq)
                cur["curr_bin_path"] = os.path.join(
                    bin_folder, f"{seq}_q{qp_i[ri]}.bin")
                cur["curr_json_path"] = \
                    cur["curr_bin_path"].replace(".bin", ".json")
                r = run_one_point(p_net, i_net, cur)
                r.update({"rate_idx": ri, "qp_i": qp_i[ri],
                          "qp_p": qp_p[ri]})
                results[ds_name][seq][f"{ri:03d}"] = r

    out_dir = os.path.dirname(args.output_path)
    if out_dir:
        create_folder(out_dir)
    with open(args.output_path, "w") as f:
        dump_json(results, f, float_digits=6, indent=2)
    print("FM evaluation finished")


if __name__ == "__main__":
    main()
