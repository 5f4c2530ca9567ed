"""Lazy build + load of the native rANS library.

Compiles rans.cpp with g++ on first use (cached by source mtime/hash).
If no compiler is available the caller falls back to the pure-Python
reference coder (opendcvc_tpu.entropy.rans_py).
"""

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rans.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir():
    d = os.environ.get("OPENDCVC_TPU_BUILD_DIR",
                       os.path.join(_HERE, "_build"))
    os.makedirs(d, exist_ok=True)
    return d


def _source_tag():
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _compile():
    tag = _source_tag()
    out = os.path.join(_build_dir(), f"librans_tpu_{tag}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", out + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(out + ".tmp", out)
    return out


def load_library():
    """Returns the ctypes CDLL with argtypes configured, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            path = _compile()
            lib = ctypes.CDLL(path)
        except Exception:
            _LIB = None
            return None
        c = ctypes
        p = c.c_void_p
        i32p = c.POINTER(c.c_int32)
        u8p = c.POINTER(c.c_uint8)
        i8p = c.POINTER(c.c_int8)
        i16p = c.POINTER(c.c_int16)

        lib.rve_enc_new.restype = p
        lib.rve_enc_new.argtypes = [c.c_int]
        lib.rve_enc_free.argtypes = [p]
        lib.rve_enc_add_cdf.restype = c.c_int
        lib.rve_enc_add_cdf.argtypes = [p, i32p, c.c_int, c.c_int, i32p,
                                        i32p, c.c_int]
        lib.rve_enc_clear_cdfs.argtypes = [p]
        lib.rve_enc_set_two.argtypes = [p, c.c_int]
        lib.rve_enc_reset.argtypes = [p]
        lib.rve_enc_y.argtypes = [p, i16p, c.c_int, c.c_int]
        lib.rve_enc_z.argtypes = [p, i8p, c.c_int, c.c_int, c.c_int,
                                  c.c_int, c.c_int, c.c_int]
        lib.rve_enc_flush.argtypes = [p]
        lib.rve_enc_stream_size.restype = c.c_int
        lib.rve_enc_stream_size.argtypes = [p]
        lib.rve_enc_get_stream.argtypes = [p, u8p]

        lib.rve_dec_new.restype = p
        lib.rve_dec_new.argtypes = [c.c_int]
        lib.rve_dec_free.argtypes = [p]
        lib.rve_dec_add_cdf.restype = c.c_int
        lib.rve_dec_add_cdf.argtypes = [p, i32p, c.c_int, c.c_int, i32p,
                                        i32p, c.c_int]
        lib.rve_dec_clear_cdfs.argtypes = [p]
        lib.rve_dec_set_two.argtypes = [p, c.c_int]
        lib.rve_dec_set_stream.argtypes = [p, u8p, c.c_int]
        lib.rve_dec_y.argtypes = [p, u8p, c.c_int, c.c_int]
        lib.rve_dec_z.argtypes = [p, c.c_int, c.c_int, c.c_int, c.c_int,
                                  c.c_int, c.c_int]
        lib.rve_dec_size.restype = c.c_int
        lib.rve_dec_size.argtypes = [p]
        lib.rve_dec_get.argtypes = [p, i8p]
        _LIB = lib
        return _LIB


def library_available():
    return load_library() is not None
