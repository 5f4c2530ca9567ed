"""rANS coder front-end: native C++ runtime via ctypes, pure-Python fallback.

Public classes RansEncoder / RansDecoder mirror the reference's
Python-visible API (reference: src/cpp/py_rans/py_rans.cpp:366-393) with
two extensions: an `interleaved` channel-index mode for NHWC z-planes and
a `build_lut` flag enabling O(1) symbol lookup in the native decoder.
"""

import ctypes
import os

import numpy as np

from ..native.build import load_library
from . import rans_py


def _use_native():
    if os.environ.get("OPENDCVC_TPU_FORCE_PY_RANS"):
        return False
    return load_library() is not None


def _threaded_default():
    v = os.environ.get("OPENDCVC_TPU_RANS_THREADS")
    if v is not None:
        return v not in ("0", "false", "False")
    # a worker thread only helps when there is a spare core
    return (os.cpu_count() or 1) > 1


class RansEncoder:
    def __init__(self, threaded=None):
        if threaded is None:
            threaded = _threaded_default()
        self._native = _use_native()
        if self._native:
            self._lib = load_library()
            self._h = self._lib.rve_enc_new(1 if threaded else 0)
        else:
            self._impl = rans_py.PyEncoderPair()

    def __del__(self):
        try:
            if getattr(self, "_native", False) and self._h:
                self._lib.rve_enc_free(self._h)
                self._h = None
        except Exception:
            pass

    def add_cdf(self, cdfs, cdf_sizes, offsets, build_lut=False):
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        sizes = np.ascontiguousarray(cdf_sizes, dtype=np.int32).reshape(-1)
        offs = np.ascontiguousarray(offsets, dtype=np.int32).reshape(-1)
        if self._native:
            n, row_len = cdfs.shape
            return self._lib.rve_enc_add_cdf(
                self._h,
                cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, row_len,
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                1 if build_lut else 0)
        return self._impl.add_cdf(cdfs, sizes, offs)

    def empty_cdf_buffer(self):
        if self._native:
            self._lib.rve_enc_clear_cdfs(self._h)
        else:
            self._impl.clear_cdfs()

    def set_use_two_encoders(self, b):
        if self._native:
            self._lib.rve_enc_set_two(self._h, 1 if b else 0)
        else:
            self._impl.set_two(b)

    def reset(self):
        if self._native:
            self._lib.rve_enc_reset(self._h)
        else:
            self._impl.reset()

    def encode_y(self, symbols, cdf_group_index):
        symbols = np.ascontiguousarray(symbols, dtype=np.int16).reshape(-1)
        if self._native:
            self._lib.rve_enc_y(
                self._h,
                symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                symbols.size, cdf_group_index)
        else:
            self._impl.encode_y(symbols, cdf_group_index)

    def encode_z(self, symbols, cdf_group_index, start_offset,
                 per_channel_size, interleaved=False, idx_base=0):
        symbols = np.ascontiguousarray(symbols, dtype=np.int8).reshape(-1)
        if self._native:
            self._lib.rve_enc_z(
                self._h,
                symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                symbols.size, cdf_group_index, start_offset,
                per_channel_size, 1 if interleaved else 0, idx_base)
        else:
            self._impl.encode_z(symbols, cdf_group_index, start_offset,
                                per_channel_size, 1 if interleaved else 0,
                                idx_base)

    def flush(self):
        if self._native:
            self._lib.rve_enc_flush(self._h)
        else:
            self._impl.flush()

    def get_encoded_stream(self):
        if self._native:
            n = self._lib.rve_enc_stream_size(self._h)
            out = np.zeros(n, dtype=np.uint8)
            if n:
                self._lib.rve_enc_get_stream(
                    self._h,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return out.tobytes()
        return self._impl.get_stream()


class RansDecoder:
    def __init__(self, threaded=None):
        if threaded is None:
            threaded = _threaded_default()
        self._native = _use_native()
        if self._native:
            self._lib = load_library()
            self._h = self._lib.rve_dec_new(1 if threaded else 0)
        else:
            self._impl = rans_py.PyDecoderPair()

    def __del__(self):
        try:
            if getattr(self, "_native", False) and self._h:
                self._lib.rve_dec_free(self._h)
                self._h = None
        except Exception:
            pass

    def add_cdf(self, cdfs, cdf_sizes, offsets, build_lut=False):
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        sizes = np.ascontiguousarray(cdf_sizes, dtype=np.int32).reshape(-1)
        offs = np.ascontiguousarray(offsets, dtype=np.int32).reshape(-1)
        if self._native:
            n, row_len = cdfs.shape
            return self._lib.rve_dec_add_cdf(
                self._h,
                cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, row_len,
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                1 if build_lut else 0)
        return self._impl.add_cdf(cdfs, sizes, offs)

    def empty_cdf_buffer(self):
        if self._native:
            self._lib.rve_dec_clear_cdfs(self._h)
        else:
            self._impl.clear_cdfs()

    def set_use_two_decoders(self, b):
        if self._native:
            self._lib.rve_dec_set_two(self._h, 1 if b else 0)
        else:
            self._impl.set_two(b)

    def set_stream(self, stream):
        data = np.frombuffer(bytes(stream), dtype=np.uint8)
        if self._native:
            data = np.ascontiguousarray(data)
            self._lib.rve_dec_set_stream(
                self._h,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                data.size)
        else:
            self._impl.set_stream(data.tobytes())

    def decode_y(self, indexes, cdf_group_index):
        indexes = np.ascontiguousarray(indexes, dtype=np.uint8).reshape(-1)
        if self._native:
            self._lib.rve_dec_y(
                self._h,
                indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                indexes.size, cdf_group_index)
        else:
            self._impl.decode_y(indexes, cdf_group_index)

    def decode_and_get_y(self, indexes, cdf_group_index):
        self.decode_y(indexes, cdf_group_index)
        return self.get_decoded_tensor()

    def decode_z(self, total_size, cdf_group_index, start_offset,
                 per_channel_size, interleaved=False, idx_base=0):
        if self._native:
            self._lib.rve_dec_z(self._h, total_size, cdf_group_index,
                                start_offset, per_channel_size,
                                1 if interleaved else 0, idx_base)
        else:
            self._impl.decode_z(total_size, cdf_group_index, start_offset,
                                per_channel_size, 1 if interleaved else 0,
                                idx_base)

    def get_decoded_tensor(self):
        if self._native:
            n = self._lib.rve_dec_size(self._h)
            out = np.zeros(n, dtype=np.int8)
            if n:
                self._lib.rve_dec_get(
                    self._h,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
            return out
        return np.asarray(self._impl.get_decoded(), dtype=np.int8)
