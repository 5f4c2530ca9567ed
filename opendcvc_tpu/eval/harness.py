"""RD evaluation harness.

TPU re-design of the reference CLI (reference: test_video.py): same JSON
dataset-config schema, same NAL bitstream files, same JSON output layout,
so existing reference configs run unchanged.  Jobs run serially on the
single TPU host process (the reference's process-per-job GPU binding has
no equivalent on one chip; multi-chip fan-out is handled by the parallel
module instead).
"""

import argparse
import functools
import io
import json
import os
import time

import jax
import numpy as np
import jax.numpy as jnp

from ..models.dmci import DMCI
from ..models.dmc import DMC
from ..models import common as CM
from ..ops.fused import replicate_pad
from ..utils.common import (str2bool, create_folder, generate_log_json,
                            dump_json)
from ..utils.stream_helper import (SPSHelper, NalType, write_sps,
                                   read_header, read_sps_remaining,
                                   read_ip_remaining, write_ip)
from ..utils.io import PNGReader, YUV420Reader, PNGWriter, YUV420Writer
from ..utils.metrics import calc_psnr, calc_msssim, calc_msssim_rgb
from ..utils.transforms import (rgb2ycbcr, ycbcr2rgb, yuv_444_to_420,
                                ycbcr420_to_444_np)
from ..utils import checkpoint as ckpt


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="opendcvc_tpu RD evaluation")
    parser.add_argument('--force_zero_thres', type=float, default=None)
    parser.add_argument('--model_path_i', type=str, default=None)
    parser.add_argument('--model_path_p', type=str, default=None)
    parser.add_argument('--rate_num', type=int, default=4)
    parser.add_argument('--qp_i', type=int, nargs="+")
    parser.add_argument('--qp_p', type=int, nargs="+")
    parser.add_argument("--force_intra", type=str2bool, default=False)
    parser.add_argument("--force_frame_num", type=int, default=-1)
    parser.add_argument("--force_intra_period", type=int, default=-1)
    parser.add_argument('--reset_interval', type=int, default=32)
    parser.add_argument('--test_config', type=str, required=True)
    parser.add_argument('--force_root_path', type=str, default=None)
    parser.add_argument("--worker", "-w", type=int, default=1)
    parser.add_argument('--calc_ssim', type=str2bool, default=False)
    parser.add_argument('--write_stream', type=str2bool, default=True)
    parser.add_argument('--check_existing', type=str2bool, default=False)
    parser.add_argument('--stream_path', type=str, default="out_bin")
    parser.add_argument('--save_decoded_frame', type=str2bool, default=False)
    parser.add_argument('--output_path', type=str, required=True)
    parser.add_argument('--verbose_json', type=str2bool, default=False)
    parser.add_argument('--verbose', type=int, default=0)
    parser.add_argument('--dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--seed', type=int, default=0,
                        help='random-init seed when no checkpoint given')
    return parser.parse_args(argv)


def np_image_to_tensor(img):
    """(3,H,W) uint8 -> (1,H,W,3) float NHWC in [0,1]."""
    x = img.astype(np.float32) / 255.0
    return x.transpose(1, 2, 0)[None]


# jitted per-(shape/pad) IO transforms: every eager jnp op pays a large
# dispatch cost through the device tunnel, so color conversion, padding
# and reconstruction postprocessing are single compiled calls.

@functools.lru_cache(maxsize=None)
def _prep_png_fn(pb, pr):
    @jax.jit
    def f(rgb):
        return replicate_pad(rgb2ycbcr(rgb), pb, pr)
    return f


@functools.lru_cache(maxsize=None)
def _prep_yuv_fn(pb, pr):
    @jax.jit
    def f(yuv):
        return replicate_pad(yuv, pb, pr)
    return f


@functools.lru_cache(maxsize=None)
def _post_png_fn(h, w):
    @jax.jit
    def f(x_hat):
        rgb = ycbcr2rgb(x_hat[:, :h, :w, :])
        return jnp.clip(rgb * 255.0, 0.0, 255.0)
    return f


@functools.lru_cache(maxsize=None)
def _post_yuv_fn(h, w):
    @jax.jit
    def f(x_hat):
        y, uv = yuv_444_to_420(x_hat[:, :h, :w, :])
        return (jnp.clip(y * 255.0, 0.0, 255.0),
                jnp.clip(uv * 255.0, 0.0, 255.0))
    return f


def get_src_reader(args):
    if args['src_type'] == 'png':
        return PNGReader(args['src_path'], args['src_width'],
                         args['src_height'])
    if args['src_type'] == 'yuv420':
        return YUV420Reader(args['src_path'], args['src_width'],
                            args['src_height'])
    raise ValueError(args['src_type'])


def get_src_frame(args, src_reader, padding=(0, 0)):
    """Returns the padded codec input plus host-side originals for
    metrics."""
    pb, pr = padding
    if args['src_type'] == 'yuv420':
        y, uv = src_reader.read_one_frame()
        yuv = ycbcr420_to_444_np(y.astype(np.float32) / 255.0,
                                 uv.astype(np.float32) / 255.0)
        x = _prep_yuv_fn(pb, pr)(jnp.asarray(yuv.transpose(1, 2, 0)[None]))
        return x, y[0], uv[0], uv[1], None
    rgb = src_reader.read_one_frame()
    x = _prep_png_fn(pb, pr)(jnp.asarray(np_image_to_tensor(rgb)))
    return x, None, None, None, rgb


def get_distortion(args, x_hat, y, u, v, rgb):
    h, w = args['src_height'], args['src_width']
    if args['src_type'] == 'yuv420':
        y_rec, uv_rec = _post_yuv_fn(h, w)(x_hat)
        y_rec = np.asarray(y_rec)[0, :, :, 0]
        uv_rec = np.asarray(uv_rec)[0]
        u_rec, v_rec = uv_rec[:, :, 0], uv_rec[:, :, 1]
        psnr_y = calc_psnr(y, y_rec)
        psnr_u = calc_psnr(u, u_rec)
        psnr_v = calc_psnr(v, v_rec)
        psnr = (6 * psnr_y + psnr_u + psnr_v) / 8
        if args['calc_ssim']:
            ssim_y = calc_msssim(y, y_rec)
            ssim_u = calc_msssim(u, u_rec)
            ssim_v = calc_msssim(v, v_rec)
        else:
            ssim_y = ssim_u = ssim_v = 0.0
        ssim = (6 * ssim_y + ssim_u + ssim_v) / 8
        return [psnr, psnr_y, psnr_u, psnr_v], [ssim, ssim_y, ssim_u, ssim_v]
    rgb_rec = np.asarray(_post_png_fn(h, w)(x_hat))[0].transpose(2, 0, 1)
    psnr = calc_psnr(rgb, rgb_rec)
    msssim = calc_msssim_rgb(rgb, rgb_rec) if args['calc_ssim'] else 0.0
    return [psnr], [msssim]


@functools.lru_cache(maxsize=None)
def _estimate_fwd_fns():
    from ..training.forward import dmci_forward, dmc_forward_one_frame
    j_i = jax.jit(lambda p, x, qp, r: dmci_forward(p, x, qp, r, "ste"))
    j_p0 = jax.jit(lambda p, x, rf, qp, r: dmc_forward_one_frame(
        p, x, rf, None, qp, r, "ste"))
    j_p = jax.jit(lambda p, x, feat, qp, r: dmc_forward_one_frame(
        p, x, None, feat, qp, r, "ste"))
    return j_i, j_p0, j_p


def run_one_point_estimation(p_frame_net, i_frame_net, args):
    """--write_stream 0 path: analytic bit estimates instead of real rANS
    streams (reference test_video.py's estimate mode; READMEs state the
    two agree within ~0.5% at 1080p for trained models)."""
    j_i, j_p0, j_p = _estimate_fwd_fns()
    frame_num = args['frame_num']
    intra_period = args['intra_period']
    pic_h, pic_w = args['src_height'], args['src_width']
    padding_r, padding_b = CM.get_padding_size(pic_h, pic_w, 16)
    n_pix = pic_h * pic_w
    src_reader = get_src_reader(args)
    rng = jax.random.PRNGKey(0)

    frame_types, psnrs, msssims, bits = [], [], [], []
    start_time = time.time()
    feature = None
    ref_frame = None
    for frame_idx in range(frame_num):
        x, y, u, v, rgb = get_src_frame(args, src_reader,
                                        (padding_b, padding_r))
        is_i = (frame_idx == 0
                or (intra_period > 0 and frame_idx % intra_period == 0))
        rng, sub = jax.random.split(rng)
        if is_i:
            out = j_i(i_frame_net.params, x, np.int32(args['qp_i']), sub)
            ref_frame, feature = out['x_hat'], None
            frame_types.append(0)
        else:
            qp = np.int32(args['qp_p'])
            if feature is None:
                out = j_p0(p_frame_net.params, x, ref_frame, qp, sub)
            else:
                out = j_p(p_frame_net.params, x, feature, qp, sub)
            ref_frame, feature = out['x_hat'], out['feature']
            frame_types.append(1)
        bits.append(float(out['bpp']) * x.shape[1] * x.shape[2])
        cp, cs = get_distortion(args, out['x_hat'], y, u, v, rgb)
        psnrs.append(cp)
        msssims.append(cs)
    src_reader.close()
    log_result = generate_log_json(frame_num, n_pix,
                                   time.time() - start_time, frame_types,
                                   bits, psnrs, msssims,
                                   verbose=args['verbose_json'])
    with open(args['curr_json_path'], 'w') as fp:
        json.dump(log_result, fp, indent=2)
    return log_result


def run_one_point_with_stream(p_frame_net, i_frame_net, args):
    if not args.get('write_stream', True):
        return run_one_point_estimation(p_frame_net, i_frame_net, args)
    if args['check_existing'] and os.path.exists(args['curr_json_path']) \
            and os.path.exists(args['curr_bin_path']):
        with open(args['curr_json_path']) as f:
            log_result = json.load(f)
        if log_result['i_frame_num'] + log_result['p_frame_num'] == \
                args['frame_num']:
            return log_result
        print(f"incorrect log for {args['curr_json_path']}, rerunning.")

    frame_num = args['frame_num']
    reset_interval = args['reset_interval']
    intra_period = args['intra_period']
    verbose = args['verbose']

    src_reader = get_src_reader(args)
    pic_height = args['src_height']
    pic_width = args['src_width']
    padding_r, padding_b = CM.get_padding_size(pic_height, pic_width, 16)

    use_two = pic_height * pic_width > 1280 * 720
    i_frame_net.set_use_two_entropy_coders(use_two)
    if p_frame_net is not None:
        p_frame_net.set_use_two_entropy_coders(use_two)

    frame_types, psnrs, msssims, bits = [], [], [], []
    encoding_time, decoding_time = [], []
    index_map = [0, 1, 0, 2, 0, 2, 0, 2]

    start_time = time.time()
    output_buff = io.BytesIO()
    sps_helper = SPSHelper()
    if p_frame_net is not None:
        p_frame_net.set_curr_poc(0)

    last_qp = 0
    for frame_idx in range(frame_num):
        x_padded, y, u, v, rgb = get_src_frame(args, src_reader,
                                               (padding_b, padding_r))
        x_padded.block_until_ready()
        frame_start = time.time()

        is_i_frame = (frame_idx == 0
                      or (intra_period > 0 and frame_idx % intra_period == 0))
        if is_i_frame:
            curr_qp = args['qp_i']
            sps = {'sps_id': -1, 'height': pic_height, 'width': pic_width,
                   'ec_part': 1 if use_two else 0, 'use_ada_i': 0}
            encoded = i_frame_net.compress(x_padded, curr_qp)
            if p_frame_net is not None:
                p_frame_net.clear_dpb()
                p_frame_net.add_ref_frame(None, encoded['x_hat'])
            frame_types.append(0)
        else:
            fa_idx = index_map[frame_idx % 8]
            if reset_interval > 0 and frame_idx % reset_interval == 1:
                use_ada_i = 1
                p_frame_net.prepare_feature_adaptor_i(last_qp)
            else:
                use_ada_i = 0
            curr_qp = p_frame_net.shift_qp(args['qp_p'], fa_idx)
            sps = {'sps_id': -1, 'height': pic_height, 'width': pic_width,
                   'ec_part': 1 if use_two else 0, 'use_ada_i': use_ada_i}
            encoded = p_frame_net.compress(x_padded, curr_qp)
            frame_types.append(1)
        last_qp = curr_qp

        sps_id, sps_new = sps_helper.get_sps_id(sps)
        sps['sps_id'] = sps_id
        sps_bytes = write_sps(output_buff, sps) if sps_new else 0
        stream_bytes = write_ip(output_buff, is_i_frame, sps_id, curr_qp,
                                encoded['bit_stream'])
        bits.append(stream_bytes * 8 + sps_bytes * 8)
        encoding_time.append(time.time() - frame_start)
        if verbose >= 2:
            print(f"frame {frame_idx} encoded, "
                  f"{encoding_time[-1] * 1000:.3f} ms, bits: {bits[-1]}")

    src_reader.close()
    with open(args['curr_bin_path'], "wb") as f:
        f.write(output_buff.getbuffer())
        total_bytes = output_buff.getbuffer().nbytes
    output_buff.close()
    total_kbps = int(total_bytes * 8 / (frame_num / 30) / 1000)

    # ---- decode from the file (full bitstream roundtrip)
    sps_helper = SPSHelper()
    with open(args['curr_bin_path'], "rb") as f:
        input_buff = io.BytesIO(f.read())
    src_reader = get_src_reader(args)

    recon_writer = None
    if args['save_decoded_frame']:
        if args['src_type'] == 'png':
            recon_writer = PNGWriter(args['bin_folder'], pic_width,
                                     pic_height)
        else:
            out_yuv = args['curr_rec_path'].replace(
                '.yuv', f'_{total_kbps}kbps.yuv')
            recon_writer = YUV420Writer(out_yuv, pic_width, pic_height)

    if p_frame_net is not None:
        p_frame_net.set_curr_poc(0)
    decoded_frame_number = 0
    while decoded_frame_number < frame_num:
        _, y, u, v, rgb = get_src_frame(args, src_reader)
        frame_start = time.time()
        header = read_header(input_buff)
        while header['nal_type'] == NalType.NAL_SPS:
            sps = read_sps_remaining(input_buff, header['sps_id'])
            sps_helper.add_sps_by_id(sps)
            header = read_header(input_buff)
        sps = sps_helper.get_sps_by_id(header['sps_id'])
        qp, bit_stream = read_ip_remaining(input_buff)

        if header['nal_type'] == NalType.NAL_I:
            decoded = i_frame_net.decompress(bit_stream, sps, qp)
            if p_frame_net is not None:
                p_frame_net.clear_dpb()
                p_frame_net.add_ref_frame(None, decoded['x_hat'])
        else:
            if sps['use_ada_i']:
                p_frame_net.reset_ref_feature()
            decoded = p_frame_net.decompress(bit_stream, sps, qp)

        x_hat = decoded['x_hat']
        x_hat.block_until_ready()
        decoding_time.append(time.time() - frame_start)

        curr_psnr, curr_ssim = get_distortion(args, x_hat, y, u, v, rgb)
        psnrs.append(curr_psnr)
        msssims.append(curr_ssim)
        if verbose >= 2:
            print(f"frame {decoded_frame_number} decoded, "
                  f"{decoding_time[-1] * 1000:.3f} ms, "
                  f"PSNR: {curr_psnr[0]:.4f}")

        if recon_writer is not None:
            if args['src_type'] == 'yuv420':
                y_rec, uv_rec = _post_yuv_fn(pic_height, pic_width)(x_hat)
                y_rec = np.round(np.asarray(y_rec)).astype(
                    np.uint8)[0, :, :, 0][None]
                uv_rec = np.asarray(uv_rec).astype(
                    np.uint8)[0].transpose(2, 0, 1)
                recon_writer.write_one_frame(y_rec, uv_rec)
            else:
                rgb_rec = _post_png_fn(pic_height, pic_width)(x_hat)
                rgb_rec = np.round(np.asarray(rgb_rec)).astype(
                    np.uint8)[0].transpose(2, 0, 1)
                recon_writer.write_one_frame(rgb_rec)
        decoded_frame_number += 1

    input_buff.close()
    src_reader.close()
    if recon_writer is not None:
        recon_writer.close()

    test_time = time.time() - start_time
    n_warm = 10
    if verbose >= 1 and len(encoding_time) > n_warm:
        enc_t = encoding_time[n_warm:]
        dec_t = decoding_time[n_warm:]
        avg_enc = sum(enc_t) / len(enc_t)
        avg_dec = sum(dec_t) / len(dec_t)
        print(f"average encoding time {avg_enc * 1000:.3f} ms, "
              f"average decoding time {avg_dec * 1000:.3f} ms.")
    else:
        avg_enc = avg_dec = None

    log_result = generate_log_json(frame_num, pic_height * pic_width,
                                   test_time, frame_types, bits, psnrs,
                                   msssims, verbose=args['verbose_json'],
                                   avg_encoding_time=avg_enc,
                                   avg_decoding_time=avg_dec)
    with open(args['curr_json_path'], 'w') as fp:
        json.dump(log_result, fp, indent=2)
    return log_result


def build_nets(args):
    import jax.numpy as jnp_
    dtype = jnp_.float32 if args.dtype == 'float32' else jnp_.bfloat16
    i_frame_net = DMCI(dtype=dtype)
    if args.model_path_i:
        i_frame_net.load_params(ckpt.load_params(args.model_path_i))
    else:
        i_frame_net.init_params(seed=args.seed)
    i_frame_net.update(args.force_zero_thres)

    p_frame_net = None
    if not args.force_intra:
        p_frame_net = DMC(dtype=dtype)
        if args.model_path_p:
            p_frame_net.load_params(ckpt.load_params(args.model_path_p))
        else:
            p_frame_net.init_params(seed=args.seed + 1)
        p_frame_net.update(args.force_zero_thres)
    return i_frame_net, p_frame_net


def _run_jobs(jobs, args):
    """Execute (sequence, rate) jobs, fanning out over `--worker N`
    threads with one codec pair per worker (reference fans the same
    job list over a spawned ProcessPoolExecutor with per-process model
    init, test_video.py:381-442; threads suffice here because coder
    state is per-instance and jit device execution drops the GIL)."""

    def finalize(cur, result):
        result = dict(result)
        result['ds_name'] = cur['ds_name']
        result['seq'] = cur['seq']
        result['rate_idx'] = cur['rate_idx']
        result['qp_i'] = cur['qp_i']
        result['qp_p'] = cur['qp_p']
        return result

    n_workers = max(1, int(getattr(args, 'worker', 1) or 1))
    if n_workers <= 1 or len(jobs) <= 1:
        i_frame_net, p_frame_net = build_nets(args)
        return [finalize(cur, run_one_point_with_stream(
            p_frame_net, i_frame_net, cur)) for cur in jobs]

    import threading
    from concurrent.futures import ThreadPoolExecutor

    local = threading.local()

    def run_job(cur):
        if not hasattr(local, 'nets'):
            local.nets = build_nets(args)
        i_net, p_net = local.nets
        return finalize(cur, run_one_point_with_stream(p_net, i_net, cur))

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        return list(pool.map(run_job, jobs))


def main(argv=None):
    begin_time = time.time()
    args = parse_args(argv)
    if args.force_zero_thres is not None and args.force_zero_thres < 0:
        args.force_zero_thres = None

    with open(args.test_config) as f:
        config = json.load(f)

    rate_num = args.rate_num
    if args.qp_i is not None:
        assert len(args.qp_i) == rate_num
        qp_i = args.qp_i
    else:
        assert 2 <= rate_num <= CM.QP_NUM
        qp_i = [int(i + 0.5)
                for i in np.linspace(0, CM.QP_NUM - 1, num=rate_num)]
    if args.qp_p is not None:
        assert len(args.qp_p) == rate_num
        qp_p = args.qp_p
    else:
        qp_p = qp_i

    print(f"testing {rate_num} rates, using qp: "
          + ", ".join(str(q) for q in qp_i))

    root_path = args.force_root_path if args.force_root_path is not None \
        else config['root_path']
    config = config['test_classes']

    jobs = []
    count_frames = 0
    count_sequences = 0
    for ds_name in config:
        if config[ds_name]['test'] == 0:
            continue
        for seq in config[ds_name]['sequences']:
            count_sequences += 1
            for rate_idx in range(rate_num):
                cur = {
                    'rate_idx': rate_idx,
                    'qp_i': qp_i[rate_idx],
                    'qp_p': qp_p[rate_idx],
                    'force_intra': args.force_intra,
                    'reset_interval': args.reset_interval,
                    'seq': seq,
                    'src_type': config[ds_name]['src_type'],
                    'src_height': config[ds_name]['sequences'][seq]['height'],
                    'src_width': config[ds_name]['sequences'][seq]['width'],
                    'intra_period':
                        config[ds_name]['sequences'][seq]['intra_period'],
                    'frame_num': config[ds_name]['sequences'][seq]['frames'],
                    'calc_ssim': args.calc_ssim,
                    'dataset_path': os.path.join(
                        root_path, config[ds_name]['base_path']),
                    'write_stream': args.write_stream,
                    'check_existing': args.check_existing,
                    'stream_path': args.stream_path,
                    'save_decoded_frame': args.save_decoded_frame,
                    'ds_name': ds_name,
                    'verbose': args.verbose,
                    'verbose_json': args.verbose_json,
                }
                if args.force_intra:
                    cur['intra_period'] = 1
                if args.force_intra_period > 0:
                    cur['intra_period'] = args.force_intra_period
                if args.force_frame_num > 0:
                    cur['frame_num'] = args.force_frame_num
                count_frames += cur['frame_num']

                bin_folder = os.path.join(cur['stream_path'], ds_name)
                create_folder(bin_folder, True)
                cur['src_path'] = os.path.join(cur['dataset_path'], seq)
                cur['bin_folder'] = bin_folder
                cur['curr_bin_path'] = os.path.join(
                    bin_folder, f"{seq}_q{cur['qp_i']}.bin")
                cur['curr_rec_path'] = \
                    cur['curr_bin_path'].replace('.bin', '.yuv')
                cur['curr_json_path'] = \
                    cur['curr_bin_path'].replace('.bin', '.json')

                jobs.append(cur)

    results = _run_jobs(jobs, args)

    log_result = {}
    for res in results:
        log_result.setdefault(res['ds_name'], {}).setdefault(
            res['seq'], {})[f"{res['rate_idx']:03d}"] = res

    out_dir = os.path.dirname(args.output_path)
    if out_dir:
        create_folder(out_dir, True)
    with open(args.output_path, 'w') as fp:
        dump_json(log_result, fp, float_digits=6, indent=2)

    total_minutes = (time.time() - begin_time) / 60
    print('Test finished')
    print(f'Tested {count_frames} frames from {count_sequences} sequences')
    print(f'Total elapsed time: {total_minutes:.1f} min')


if __name__ == "__main__":
    main()
