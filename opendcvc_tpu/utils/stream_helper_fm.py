"""DCVC-FM bitstream syntax variant.

Byte-compatible with the FM container (reference:
DCVC-family/DCVC-FM/src/utils/stream_helper.py:128-249): the SPS carries
qp (6 bits) and fa_idx (2 bits) instead of ec_part/use_ada_i, frame
packets carry no qp byte, and NAL_Ps packs multiple P-frames into one
packet (their sps_ids nibble-packed after the header).
"""

import enum

from .stream_helper import (write_uchars, read_uchars, write_bytes,
                            read_bytes, write_uint_adaptive,
                            read_uint_adaptive)


class NalType(enum.IntEnum):
    NAL_SPS = 0
    NAL_I = 1
    NAL_P = 2
    NAL_Ps = 3


class SPSHelper:
    """SPS registry keyed on (height, width, qp, fa_idx)."""

    def __init__(self):
        self.spss = []

    def get_sps_id(self, target):
        min_id = -1
        for sps in self.spss:
            if (sps["height"] == target["height"]
                    and sps["width"] == target["width"]
                    and sps["qp"] == target["qp"]
                    and sps["fa_idx"] == target["fa_idx"]):
                return sps["sps_id"], False
            min_id = max(min_id, sps["sps_id"])
        assert min_id < 15
        sps = dict(target)
        sps["sps_id"] = min_id + 1
        self.spss.append(sps)
        return sps["sps_id"], True

    def add_sps_by_id(self, sps):
        for i, s in enumerate(self.spss):
            if s["sps_id"] == sps["sps_id"]:
                self.spss[i] = dict(sps)
                return
        self.spss.append(dict(sps))

    def get_sps_by_id(self, sps_id):
        for sps in self.spss:
            if sps["sps_id"] == sps_id:
                return sps
        return None


def write_sps(f, sps):
    assert sps["sps_id"] < 16
    assert sps["qp"] < 64
    assert sps["fa_idx"] < 4
    written = 0
    flag = (int(NalType.NAL_SPS) << 4) + sps["sps_id"]
    written += write_uchars(f, (flag,))
    written += write_uint_adaptive(f, sps["height"])
    written += write_uint_adaptive(f, sps["width"])
    written += write_uchars(f, ((sps["qp"] << 2) + sps["fa_idx"],))
    return written


def read_header(f):
    header = {}
    flag = read_uchars(f, 1)[0]
    nal_type = flag >> 4
    header["nal_type"] = NalType(nal_type)
    if nal_type < 3:
        header["sps_id"] = flag & 0x0F
        return header
    frame_num = (flag & 0x0F) + 1
    header["frame_num"] = frame_num
    sps_ids = []
    for _ in range(0, frame_num, 2):
        b = read_uchars(f, 1)[0]
        sps_ids.append(b >> 4)
        sps_ids.append(b & 0x0F)
    header["sps_ids"] = sps_ids[:frame_num]
    return header


def read_sps_remaining(f, sps_id):
    sps = {"sps_id": sps_id}
    sps["height"] = read_uint_adaptive(f)
    sps["width"] = read_uint_adaptive(f)
    flag = read_uchars(f, 1)[0]
    sps["qp"] = flag >> 2
    sps["fa_idx"] = flag & 0x03
    return sps


def write_ip(f, is_i_frame, sps_id, bit_stream):
    written = 0
    flag = (int(NalType.NAL_I if is_i_frame else NalType.NAL_P) << 4) \
        + sps_id
    written += write_uchars(f, (flag,))
    written += write_uint_adaptive(f, len(bit_stream))
    written += write_bytes(f, bit_stream)
    return written


def read_ip_remaining(f):
    stream_length = read_uint_adaptive(f)
    return read_bytes(f, stream_length)


def write_p_frames(f, sps_ids, bit_stream):
    """Pack several P-frames (one shared rANS stream) into one NAL_Ps."""
    frame_num_minus1 = len(sps_ids) - 1
    assert frame_num_minus1 < 16
    written = 0
    flag = (int(NalType.NAL_Ps) << 4) + frame_num_minus1
    written += write_uchars(f, (flag,))
    ids = list(sps_ids)
    if len(ids) % 2 == 1:
        ids.append(0)
    for i in range(0, len(ids), 2):
        written += write_uchars(f, ((ids[i] << 4) + ids[i + 1],))
    written += write_uint_adaptive(f, len(bit_stream))
    written += write_bytes(f, bit_stream)
    return written
