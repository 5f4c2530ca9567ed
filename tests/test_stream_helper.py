"""Bitstream syntax: adaptive uints, SPS registry, NAL packets."""

import io

import pytest

from opendcvc_tpu.utils import stream_helper as S


@pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 16383, 16384,
                               (1 << 30) - 1])
def test_uint_adaptive_roundtrip(v):
    buf = io.BytesIO()
    n = S.write_uint_adaptive(buf, v)
    assert n in (1, 2, 4)
    buf.seek(0)
    assert S.read_uint_adaptive(buf) == v


def test_sps_roundtrip():
    buf = io.BytesIO()
    sps = {"sps_id": 3, "height": 1080, "width": 1920, "ec_part": 1,
           "use_ada_i": 1}
    S.write_sps(buf, sps)
    buf.seek(0)
    header = S.read_header(buf)
    assert header["nal_type"] == S.NalType.NAL_SPS
    assert header["sps_id"] == 3
    out = S.read_sps_remaining(buf, header["sps_id"])
    assert out == sps


def test_ip_roundtrip():
    buf = io.BytesIO()
    payload = bytes(range(256))
    S.write_ip(buf, True, 2, 45, payload)
    S.write_ip(buf, False, 2, 50, b"xyz")
    buf.seek(0)
    h = S.read_header(buf)
    assert h["nal_type"] == S.NalType.NAL_I and h["sps_id"] == 2
    qp, stream = S.read_ip_remaining(buf)
    assert qp == 45 and stream == payload
    h = S.read_header(buf)
    assert h["nal_type"] == S.NalType.NAL_P
    qp, stream = S.read_ip_remaining(buf)
    assert qp == 50 and stream == b"xyz"


def test_sps_helper_dedup():
    helper = S.SPSHelper()
    sps = {"sps_id": -1, "height": 256, "width": 256, "ec_part": 0,
           "use_ada_i": 0}
    sid, new = helper.get_sps_id(sps)
    assert new and sid == 0
    sid2, new2 = helper.get_sps_id(sps)
    assert not new2 and sid2 == 0
    sps2 = dict(sps, use_ada_i=1)
    sid3, new3 = helper.get_sps_id(sps2)
    assert new3 and sid3 == 1
