"""ctypes binding to the C++ host runtime (csrc/libcsnappy_host.so).

Provides the ``"native"`` backend: fast host fallback codec, oracle
cross-check for device kernels, and the ragged-output compactor used when
assembling device-padded block outputs into a contiguous stream.
"""
from __future__ import annotations

import ctypes
import functools
import os
import pathlib
import subprocess

import numpy as np

from ..errors import SnappyError, raise_for_code

_LIB_ENV = "CSNAPPY_HOST_LIB"


def _lib_path() -> pathlib.Path:
    if _LIB_ENV in os.environ:
        return pathlib.Path(os.environ[_LIB_ENV])
    return pathlib.Path(__file__).resolve().parents[2] / "csrc" / "libcsnappy_host.so"


def build(force: bool = False) -> pathlib.Path:
    """Build the library in-tree if missing (make -C csrc)."""
    path = _lib_path()
    if force or not path.exists():
        subprocess.run(["make", "-C", str(path.parent)], check=True, capture_output=True)
    return path


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    path = _lib_path()
    if not path.exists():
        build()
    lib = ctypes.CDLL(str(path))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.csnappy_host_max_compressed.restype = ctypes.c_uint64
    lib.csnappy_host_max_compressed.argtypes = [ctypes.c_uint64]
    lib.csnappy_host_compress.restype = ctypes.c_int
    lib.csnappy_host_compress.argtypes = [u8p, ctypes.c_uint32, u8p, u32p]
    lib.csnappy_host_compress_fragment.restype = ctypes.c_int
    lib.csnappy_host_compress_fragment.argtypes = [u8p, ctypes.c_uint32, u8p, u32p]
    lib.csnappy_host_decompress.restype = ctypes.c_int
    lib.csnappy_host_decompress.argtypes = [u8p, ctypes.c_uint32, u8p, ctypes.c_uint32, u32p]
    lib.csnappy_host_decompress_noheader.restype = ctypes.c_int
    lib.csnappy_host_decompress_noheader.argtypes = [u8p, ctypes.c_uint32, u8p, u32p]
    lib.csnappy_host_compact.restype = ctypes.c_uint64
    lib.csnappy_host_compact.argtypes = [u8p, ctypes.c_uint32, ctypes.c_uint32, u32p, u8p]
    lib.csnappy_host_scan_segments.restype = ctypes.c_int
    lib.csnappy_host_scan_segments.argtypes = [
        u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        u32p, ctypes.c_uint32, u32p, u32p,
    ]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress(data: bytes) -> bytes:
    lib = _lib()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(int(lib.csnappy_host_max_compressed(len(data))) + 8, np.uint8)
    olen = ctypes.c_uint32(0)
    rc = lib.csnappy_host_compress(_as_u8p(src), len(data), _as_u8p(out), ctypes.byref(olen))
    raise_for_code(rc)
    return out[: olen.value].tobytes()


def compress_fragment(data: bytes) -> bytes:
    lib = _lib()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(int(lib.csnappy_host_max_compressed(len(data))) + 8, np.uint8)
    olen = ctypes.c_uint32(0)
    rc = lib.csnappy_host_compress_fragment(
        _as_u8p(src), len(data), _as_u8p(out), ctypes.byref(olen)
    )
    raise_for_code(rc)
    return out[: olen.value].tobytes()


def decompress(data: bytes, dst_cap: int) -> bytes:
    lib = _lib()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(max(dst_cap, 1), np.uint8)
    produced = ctypes.c_uint32(0)
    rc = lib.csnappy_host_decompress(
        _as_u8p(src), len(data), _as_u8p(out), dst_cap, ctypes.byref(produced)
    )
    raise_for_code(rc)
    return out[: produced.value].tobytes()


def decompress_noheader(data: bytes, dst_cap: int) -> bytes:
    lib = _lib()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(max(dst_cap, 1), np.uint8)
    dlen = ctypes.c_uint32(dst_cap)
    rc = lib.csnappy_host_decompress_noheader(
        _as_u8p(src), len(data), _as_u8p(out), ctypes.byref(dlen)
    )
    raise_for_code(rc)
    return out[: dlen.value].tobytes()


SCAN_SEGMENTABLE = 0
SCAN_CROSSING = 1


def scan_segments(data: np.ndarray | bytes, dst_cap: int, seg: int = 32768):
    """One-pass native tag-boundary scan (routing leg for whole-stream
    decode).  Returns (rc, seg_offs, produced): rc 0 = the stream splits
    into independent ``seg``-output blocks starting at compressed offsets
    ``seg_offs``; rc 1 = legal-looking but crossing (a tag straddles a
    boundary or a copy reaches a prior segment); any other rc is the exact
    E_* error, decided in sequential stream order."""
    lib = _lib()
    src = np.ascontiguousarray(
        np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else data
    )
    max_segs = dst_cap // seg + 2
    offs = np.zeros(max_segs, np.uint32)
    nseg = ctypes.c_uint32(0)
    produced = ctypes.c_uint32(0)
    rc = lib.csnappy_host_scan_segments(
        _as_u8p(src), len(src), dst_cap, seg,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), max_segs,
        ctypes.byref(nseg), ctypes.byref(produced),
    )
    return rc, offs[: nseg.value].astype(np.int64), int(produced.value)


def compact(padded: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate padded[i, :lens[i]] rows natively (memcpy loop)."""
    lib = _lib()
    padded = np.ascontiguousarray(padded, np.uint8)
    lens32 = np.ascontiguousarray(lens, np.uint32)
    out = np.empty(int(lens32.sum()), np.uint8)
    n = lib.csnappy_host_compact(
        _as_u8p(padded.reshape(-1)),
        padded.shape[0],
        padded.shape[1],
        lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _as_u8p(out),
    )
    return out[:n].tobytes()
