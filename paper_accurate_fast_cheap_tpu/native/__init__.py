"""Native C++ helpers (ctypes) with build-on-demand and python fallback.

`lib()` returns the loaded shared library or None.  The first call compiles
`pafc_native.cpp` with g++ -O3 into this directory (cached); failures fall
back to the pure-python implementations in the callers.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)
_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pafc_native.cpp")
_SO = os.path.join(_DIR, "libpafc_native.so")
_AV_SRC = os.path.join(_DIR, "pafc_av.cpp")
_AV_SO = os.path.join(_DIR, "libpafc_av.so")
_lock = threading.Lock()
_lib = None
_tried = False
_av_lib = None
_av_tried = False


def build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        log.info("native build unavailable (%s); using python fallbacks", e)
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not build():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError as e:
            log.info("native load failed: %s", e)
            return None
        L.levenshtein_counts.restype = ctypes.c_int
        L.levenshtein_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.parse_wav.restype = ctypes.c_int64
        L.parse_wav.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.resample_linear.restype = None
        L.resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        if hasattr(L, "flac_decode"):
            L.flac_decode.restype = ctypes.c_int64
            L.flac_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
        _lib = L
        return _lib


def levenshtein_counts(ref: np.ndarray,
                       hyp: np.ndarray) -> Optional[Tuple[int, int, int]]:
    """(sub, del, ins) via native DP, or None if unavailable."""
    L = lib()
    if L is None:
        return None
    ref = np.ascontiguousarray(ref, np.int32)
    hyp = np.ascontiguousarray(hyp, np.int32)
    out = np.zeros(3, np.int32)
    L.levenshtein_counts(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref),
        hyp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return int(out[0]), int(out[1]), int(out[2])


def build_av() -> bool:
    """Compile the ffmpeg-backed shim (kept out of the base lib so
    libpafc_native.so carries no libav* link dependency)."""
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _AV_SRC,
           "-o", _AV_SO, "-lavformat", "-lavcodec", "-lavutil",
           "-lswresample"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        log.info("libav shim build unavailable (%s); m4a ingestion will "
                 "raise with re-pack guidance", e)
        return False


def av_lib() -> Optional[ctypes.CDLL]:
    """The ffmpeg shim, or None when libav*/g++ are absent.

    Strict version gate: the shim is compiled against the image's
    lavf-59 headers, so refuse to use it if the runtime library reports
    a different major (a mismatched ABI would corrupt, not error)."""
    global _av_lib, _av_tried
    with _lock:
        if _av_lib is not None or _av_tried:
            return _av_lib
        _av_tried = True
        if not os.path.exists(_AV_SO) or (
            os.path.exists(_AV_SRC)
            and os.path.getmtime(_AV_SRC) > os.path.getmtime(_AV_SO)
        ):
            if not build_av():
                return None
        try:
            L = ctypes.CDLL(_AV_SO)
        except OSError as e:
            log.info("libav shim load failed: %s", e)
            return None
        L.pafc_av_version.restype = ctypes.c_uint32
        L.pafc_av_version.argtypes = []
        built_major = 59
        run_major = int(L.pafc_av_version()) >> 16
        if run_major != built_major:
            log.warning("libavformat major %d != built-against %d; "
                        "disabling the libav shim", run_major, built_major)
            return None
        L.pafc_av_decode.restype = ctypes.c_int64
        L.pafc_av_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.pafc_av_free.restype = None
        L.pafc_av_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        L.pafc_av_encode_m4a.restype = ctypes.c_int64
        L.pafc_av_encode_m4a.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        L.pafc_av_free_u8.restype = None
        L.pafc_av_free_u8.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _av_lib = L
        return _av_lib


def av_decode(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """(mono float32, native sample_rate) via libavformat, or None when
    the shim is unavailable or the payload does not decode."""
    L = av_lib()
    if L is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int32(0)
    n = L.pafc_av_decode(buf, len(data), ctypes.byref(out),
                         ctypes.byref(sr))
    if n <= 0 or not out:
        return None
    try:
        x = np.ctypeslib.as_array(out, shape=(int(n),)).copy()
    finally:
        L.pafc_av_free(out)
    return x, int(sr.value)


def av_encode_m4a(pcm: np.ndarray, sample_rate: int) -> Optional[bytes]:
    """Mono float32 -> AAC .m4a bytes (test-fixture helper), or None."""
    L = av_lib()
    if L is None:
        return None
    x = np.ascontiguousarray(pcm, np.float32)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = L.pafc_av_encode_m4a(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        int(sample_rate), ctypes.byref(out))
    if n <= 0 or not out:
        return None
    try:
        return bytes(np.ctypeslib.as_array(out, shape=(int(n),)))
    finally:
        L.pafc_av_free_u8(out)


def parse_wav(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """(float32 mono samples, sample_rate) via native decode, or None."""
    L = lib()
    if L is None:
        return None
    max_out = len(data) // 1  # generous upper bound in samples
    out = np.empty(max_out, np.float32)
    sr = ctypes.c_int32(0)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    n = L.parse_wav(buf, len(data),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    max_out, ctypes.byref(sr))
    if n < 0:
        return None
    return out[:n].copy(), int(sr.value)
