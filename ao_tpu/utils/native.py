"""ctypes loader for the native host kernel library (csrc/ao_tpu_host.cpp).

(ref analog: torchao's compiled C++ extensions loaded at import,
torchao/__init__.py so-file loading; here the library is built on first use
with g++ into a cache dir — no torch extension machinery — and every entry
point has a pure numpy fallback, the same spirit as
TORCHAO_FORCE_SKIP_LOADING_SO_FILES.)

Set ``AO_TPU_DISABLE_NATIVE=1`` to force the numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "ao_tpu_host.cpp",
)


def _build_and_load() -> Optional[ctypes.CDLL]:
    if os.environ.get("AO_TPU_DISABLE_NATIVE"):
        return None
    cache = os.environ.get(
        "AO_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ao_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libao_tpu_host.so")
    if not (os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-march=native", _SRC, "-o", so + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except Exception:
            try:  # retry without -march=native (portability)
                cmd.remove("-march=native")
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(so + ".tmp", so)
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(so)
        assert lib.ao_tpu_host_abi_version() == 1
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# ---------------------------------------------------------------------------
# Entry points (numpy in/out, host memory). Each falls back to numpy.
# ---------------------------------------------------------------------------


def pack_int4_host(u: np.ndarray, group_size: int) -> np.ndarray:
    """u (K, N) uint8 nibbles → packed (K/2, N), group-local split-half."""
    u = np.ascontiguousarray(u, dtype=np.uint8)
    k, n = u.shape
    lib = get_lib()
    out = np.empty((k // 2, n), np.uint8)
    if lib is not None:
        lib.pack_int4_splithalf(
            _ptr(u, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(group_size),
        )
        return out
    g = group_size
    ub = u.reshape(k // g, g, n)
    lo, hi = ub[:, : g // 2], ub[:, g // 2:]
    return (lo | (hi << 4)).reshape(k // 2, n)


def unpack_int4_host(packed: np.ndarray, group_size: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    kp, n = packed.shape
    k = kp * 2
    lib = get_lib()
    if lib is not None:
        out = np.empty((k, n), np.uint8)
        lib.unpack_int4_splithalf(
            _ptr(packed, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(group_size),
        )
        return out
    gh = group_size // 2
    pb = packed.reshape(kp // gh, gh, n)
    return np.concatenate([pb & 0xF, pb >> 4], axis=1).reshape(k, n)


def pack_bits_host(vals: np.ndarray, bits: int) -> np.ndarray:
    """Flat uint8 values → little-endian bit-stream (uint8 bytes)."""
    vals = np.ascontiguousarray(vals.reshape(-1), dtype=np.uint8)
    count = vals.size
    nbytes = (count * bits + 7) // 8
    lib = get_lib()
    if lib is not None:
        out = np.zeros(nbytes, np.uint8)
        lib.pack_bits(
            _ptr(vals, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            ctypes.c_int64(count), ctypes.c_int(bits),
        )
        return out
    bitbuf = np.unpackbits(
        vals[:, None], axis=1, count=bits, bitorder="little"
    ).reshape(-1)
    return np.packbits(bitbuf, bitorder="little")


def unpack_bits_host(packed: np.ndarray, count: int, bits: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed.reshape(-1), dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        out = np.empty(count, np.uint8)
        lib.unpack_bits(
            _ptr(packed, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
            ctypes.c_int64(count), ctypes.c_int(bits),
        )
        return out
    bitbuf = np.unpackbits(packed, bitorder="little")[: count * bits]
    return np.packbits(
        bitbuf.reshape(count, bits), axis=1, bitorder="little"
    ).reshape(-1)


def quantize_int4_tinygemm_host(w: np.ndarray, group_size: int):
    """Fused minmax→qparams→quantize→pack for float32 (K, N) weights.
    Returns (packed (K/2, N) uint8, scale (K/g, N) f32, zp (K/g, N) f32)
    with tinygemm float-zero-point semantics."""
    w = np.ascontiguousarray(w, dtype=np.float32)
    k, n = w.shape
    g = group_size
    lib = get_lib()
    if lib is not None:
        packed = np.empty((k // 2, n), np.uint8)
        scale = np.empty((k // g, n), np.float32)
        zp = np.empty((k // g, n), np.float32)
        lib.quantize_int4_tinygemm(
            _ptr(w, ctypes.c_float), _ptr(packed, ctypes.c_uint8),
            _ptr(scale, ctypes.c_float), _ptr(zp, ctypes.c_float),
            ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(g),
        )
        return packed, scale, zp
    import ml_dtypes

    eps = np.float32(np.finfo(np.float32).eps)
    wb = w.reshape(k // g, g, n)
    mx, mn = wb.max(1), wb.min(1)
    # bf16-rounded qparams, matching choose_qparams_affine_tinygemm
    scale = np.maximum((mx - mn) / np.float32(15.0), eps).astype(
        ml_dtypes.bfloat16).astype(np.float32)
    zp = mn.astype(ml_dtypes.bfloat16).astype(np.float32)
    u = np.clip(
        np.rint((wb - zp[:, None, :]) / scale[:, None, :]), 0, 15
    ).astype(np.uint8).reshape(k, n)
    return pack_int4_host(u, g), scale, zp


def repack_int4_magic_host(ph: np.ndarray, group_size: int) -> np.ndarray:
    """Split-half packed (K/2, N) uint8 → "magic" int32 words (K/8, N)
    (the bf16 weight-only kernel's layout; see qarrays/int4.py)."""
    ph = np.ascontiguousarray(ph, dtype=np.uint8)
    kp, n = ph.shape
    k, g = kp * 2, group_size
    lib = get_lib()
    if lib is not None:
        out = np.empty((k // 8, n), np.int32)
        lib.repack_int4_magic(
            _ptr(ph, ctypes.c_uint8), _ptr(out, ctypes.c_int32),
            ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(g),
        )
        return out
    u = unpack_int4_host(ph, g)
    ug = u.reshape(k // (4 * g), 4, g // 2, 2, n).astype(np.int32)
    word = np.zeros((k // (4 * g), g // 2, n), np.int32)
    for j in range(4):
        for h in range(2):
            word |= ug[:, j, :, h] << (4 * j + 16 * h)
    return word.reshape(k // 8, n)


def repack_int4_magic8_host(ph: np.ndarray, group_size: int) -> np.ndarray:
    """Split-half packed (K/2, N) uint8 → 2-plane "magic8" int32 words
    (K/8, N) (the W4A8 int8-MXU kernel's layout)."""
    ph = np.ascontiguousarray(ph, dtype=np.uint8)
    kp, n = ph.shape
    k, g = kp * 2, group_size
    lib = get_lib()
    if lib is not None:
        out = np.empty((k // 8, n), np.int32)
        lib.repack_int4_magic8(
            _ptr(ph, ctypes.c_uint8), _ptr(out, ctypes.c_int32),
            ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(g),
        )
        return out
    u = unpack_int4_host(ph, g)
    pair = u.reshape(k // (2 * g), 2, g, n)
    a = pair[:, 0].reshape(k // 8, 4, n).astype(np.int32)
    b = pair[:, 1].reshape(k // 8, 4, n).astype(np.int32)
    word = np.zeros((k // 8, n), np.int32)
    for byte in range(4):
        word |= (a[:, byte] << (8 * byte)) | (b[:, byte] << (8 * byte + 4))
    return word


def quantize_int8_symmetric_host(w: np.ndarray, group_size: int):
    """Returns (q int8 (K, N), scale (K/g, N) f32)."""
    w = np.ascontiguousarray(w, dtype=np.float32)
    k, n = w.shape
    g = group_size
    lib = get_lib()
    if lib is not None:
        q = np.empty((k, n), np.int8)
        scale = np.empty((k // g, n), np.float32)
        lib.quantize_int8_symmetric(
            _ptr(w, ctypes.c_float), _ptr(q, ctypes.c_int8),
            _ptr(scale, ctypes.c_float),
            ctypes.c_int64(k), ctypes.c_int64(n), ctypes.c_int64(g),
        )
        return q, scale
    wb = w.reshape(k // g, g, n)
    eps = np.float32(np.finfo(np.float32).eps)
    scale = np.maximum(np.abs(wb).max(1) / np.float32(127.5), eps).astype(
        np.float32)
    q = np.clip(np.rint(wb / scale[:, None, :]), -128, 127).astype(np.int8)
    return q.reshape(k, n), scale


def quantize_nf4_host(w: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """Nearest-code assignment against a sorted 16-entry codebook."""
    w = np.ascontiguousarray(w, dtype=np.float32)
    codebook = np.ascontiguousarray(codebook, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        codes = np.empty(w.size, np.uint8)
        lib.quantize_nf4(
            _ptr(w, ctypes.c_float), _ptr(codebook, ctypes.c_float),
            _ptr(codes, ctypes.c_uint8), ctypes.c_int64(w.size),
        )
        return codes.reshape(w.shape)
    return np.argmin(
        np.abs(w.reshape(-1, 1) - codebook[None, :]), axis=1
    ).astype(np.uint8).reshape(w.shape)
