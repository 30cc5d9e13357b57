"""GGUF v3 file writer/reader (llama.cpp interchange format).

(ref analog: the GGUF export intent of prototype/quantization/gguf — the
reference quantizes to gguf-style super-blocks but leaves file emission to
external tooling; here the container format itself is implemented so
ao_tpu checkpoints can ship as .gguf. Spec:
github.com/ggml-org/ggml/blob/master/docs/gguf.md — little-endian, magic
"GGUF", version 3, aligned tensor data; GGML dims are stored innermost
first (reversed numpy order).)

Supported tensor codings: F32, F16, Q8_0 (32-elem blocks: fp16 scale +
32 int8 — bit-exact, simple, universally loadable) and Q4_K emission
(``quantize_2d="q4_k"``: 256-elem superblocks, 6-bit sub-scales/mins).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

MAGIC = b"GGUF"
VERSION = 3
ALIGNMENT = 32

# ggml tensor type ids
GGML_F32 = 0
GGML_F16 = 1
GGML_Q8_0 = 8
GGML_Q4_K = 12

# gguf metadata value types
_T_U32, _T_I32, _T_F32, _T_BOOL, _T_STR, _T_U64 = 4, 5, 6, 7, 8, 10


def _pack_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _pack_kv(key: str, value) -> bytes:
    out = _pack_str(key)
    if isinstance(value, bool):
        out += struct.pack("<IB", _T_BOOL, int(value))
    elif isinstance(value, int):
        if -(2 ** 31) <= value < 2 ** 31:
            out += struct.pack("<Ii", _T_I32, value)
        else:
            out += struct.pack("<IQ", _T_U64, value)
    elif isinstance(value, float):
        out += struct.pack("<If", _T_F32, value)
    elif isinstance(value, str):
        out += struct.pack("<I", _T_STR) + _pack_str(value)
    else:
        raise TypeError(f"unsupported metadata value {type(value)}")
    return out


def quantize_q8_0(a: np.ndarray) -> bytes:
    """Row-major Q8_0 blocks: per 32 values, fp16 scale + 32 int8."""
    flat = np.ascontiguousarray(a, np.float32).reshape(-1)
    if flat.size % 32:
        raise ValueError("Q8_0 needs a multiple of 32 elements")
    blocks = flat.reshape(-1, 32)
    amax = np.abs(blocks).max(axis=1)
    d = (amax / 127.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    q = np.clip(np.rint(blocks / df[:, None]), -128, 127).astype(np.int8)
    out = np.zeros((blocks.shape[0], 34), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


def dequantize_q8_0(raw: bytes, n: int) -> np.ndarray:
    buf = np.frombuffer(raw, np.uint8).reshape(-1, 34)
    d = buf[:, :2].copy().view(np.float16).astype(np.float32)
    q = buf[:, 2:].copy().view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)[:n]


def quantize_q4_k(a: np.ndarray) -> bytes:
    """Row-major Q4_K super-blocks: 256 values → 144 bytes.

    Layout (ggml block_q4_K): fp16 d (scale-of-scales) + fp16 dmin
    (scale-of-mins) + 12 bytes of 6-bit sub-block scales/mins + 128 bytes
    of 4-bit quants. Dequant: x̂ = (d·sc[j])·q − (dmin·m[j]) per 32-value
    sub-block j. Simple asymmetric qparams (min/max per sub-block) rather
    than llama.cpp's search — bit-compatible layout, slightly higher MSE."""
    flat = np.ascontiguousarray(a, np.float32).reshape(-1)
    if flat.size % 256:
        raise ValueError("Q4_K needs a multiple of 256 elements")
    nb = flat.size // 256
    x = flat.reshape(nb, 8, 32)

    mins_f = -np.minimum(x.min(axis=2), 0.0)  # encodable mins are >= 0
    scales_f = np.maximum((x.max(axis=2) + mins_f) / 15.0, 0.0)  # (nb, 8)

    d = (scales_f.max(axis=1) / 63.0).astype(np.float16)  # (nb,)
    dmin = (mins_f.max(axis=1) / 63.0).astype(np.float16)
    df = d.astype(np.float32)
    dmf = dmin.astype(np.float32)
    df[df == 0] = 1.0
    dmf[dmf == 0] = 1.0
    sc = np.clip(np.rint(scales_f / df[:, None]), 0, 63).astype(np.uint8)
    m = np.clip(np.rint(mins_f / dmf[:, None]), 0, 63).astype(np.uint8)

    eff_scale = df[:, None] * sc  # (nb, 8)
    eff_min = dmf[:, None] * m
    es = eff_scale.copy()
    es[es == 0] = 1.0
    q = np.clip(np.rint((x + eff_min[:, :, None]) / es[:, :, None]),
                0, 15).astype(np.uint8)  # (nb, 8, 32)

    # 6-bit scale/min packing (ggml get_scale_min_k4 inverse)
    scales_b = np.zeros((nb, 12), np.uint8)
    scales_b[:, 0:4] = sc[:, 0:4] & 63
    scales_b[:, 4:8] = m[:, 0:4] & 63
    scales_b[:, 8:12] = (sc[:, 4:8] & 0xF) | ((m[:, 4:8] & 0xF) << 4)
    scales_b[:, 0:4] |= (sc[:, 4:8] >> 4) << 6
    scales_b[:, 4:8] |= (m[:, 4:8] >> 4) << 6

    # 4-bit quant packing: per 64-value chunk, byte l = q[l] | q[l+32]<<4
    qq = q.reshape(nb, 4, 64)
    qs = (qq[:, :, :32] | (qq[:, :, 32:] << 4)).reshape(nb, 128)

    out = np.zeros((nb, 144), np.uint8)
    out[:, 0:2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = dmin.view(np.uint8).reshape(-1, 2)
    out[:, 4:16] = scales_b
    out[:, 16:] = qs
    return out.tobytes()


def dequantize_q4_k(raw: bytes, n: int) -> np.ndarray:
    buf = np.frombuffer(raw, np.uint8).reshape(-1, 144)
    nb = buf.shape[0]
    d = buf[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
    dmin = buf[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(nb)
    sb = buf[:, 4:16]
    sc = np.empty((nb, 8), np.float32)
    m = np.empty((nb, 8), np.float32)
    sc[:, 0:4] = sb[:, 0:4] & 63
    m[:, 0:4] = sb[:, 4:8] & 63
    sc[:, 4:8] = (sb[:, 8:12] & 0xF) | ((sb[:, 0:4] >> 6) << 4)
    m[:, 4:8] = (sb[:, 8:12] >> 4) | ((sb[:, 4:8] >> 6) << 4)
    qs = buf[:, 16:].reshape(nb, 4, 32)
    q = np.concatenate([qs & 0xF, qs >> 4], axis=2).astype(np.float32)
    x = (d[:, None] * sc)[:, :, None] * q.reshape(nb, 8, 32) \
        - (dmin[:, None] * m)[:, :, None]
    return x.reshape(-1)[:n]


def write_gguf(
    path: str,
    tensors: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, Any]] = None,
    quantize_2d: str = "q8_0",  # "q8_0" | "f16" | "f32"
) -> None:
    """Write arrays to a GGUF v3 file. 2-D float tensors are coded per
    ``quantize_2d``; everything else ships as F32/F16."""
    metadata = dict(metadata or {})
    metadata.setdefault("general.architecture", "ao_tpu")

    infos = []
    blobs = []
    offset = 0
    for name, a in tensors.items():
        a = np.asarray(a)
        if a.dtype == np.float16:
            a32 = a.astype(np.float32)
        else:
            a32 = np.asarray(a, np.float32)
        if a.ndim == 2 and quantize_2d == "q4_k" and a.shape[-1] % 256 == 0:
            ttype = GGML_Q4_K
            blob = quantize_q4_k(a32)
        elif a.ndim == 2 and quantize_2d in ("q8_0", "q4_k") \
                and a.size % 32 == 0:
            # q4_k requested but row length not 256-aligned → Q8_0 fallback
            ttype = GGML_Q8_0
            blob = quantize_q8_0(a32)
        elif quantize_2d == "f16" or a.dtype == np.float16:
            ttype = GGML_F16
            blob = a32.astype(np.float16).tobytes()
        else:
            ttype = GGML_F32
            blob = a32.tobytes()
        pad = (-offset) % ALIGNMENT
        offset += pad
        blobs.append((pad, blob))
        # ggml dims: innermost first (reverse of numpy shape)
        dims = tuple(reversed(a.shape)) if a.ndim else (1,)
        infos.append((name, dims, ttype, offset))
        offset += len(blob)

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IQQ", VERSION, len(infos), len(metadata)))
        for k, v in metadata.items():
            f.write(_pack_kv(k, v))
        for name, dims, ttype, off in infos:
            f.write(_pack_str(name))
            f.write(struct.pack("<I", len(dims)))
            for dim in dims:
                f.write(struct.pack("<Q", dim))
            f.write(struct.pack("<IQ", ttype, off))
        # pad header to alignment, then data section
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % ALIGNMENT))
        for pad, blob in blobs:
            f.write(b"\x00" * pad)
            f.write(blob)


def read_gguf(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Minimal reader for files this module writes (roundtrip validation)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == MAGIC, "not a GGUF file"
    version, n_tensors, n_kv = struct.unpack_from("<IQQ", data, 4)
    assert version == VERSION
    pos = 4 + 4 + 16

    def read_str():
        nonlocal pos
        (ln,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        s = data[pos:pos + ln].decode()
        pos += ln
        return s

    meta: Dict[str, Any] = {}
    for _ in range(n_kv):
        key = read_str()
        (vt,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if vt == _T_BOOL:
            meta[key] = bool(data[pos]); pos += 1
        elif vt == _T_I32:
            (meta[key],) = struct.unpack_from("<i", data, pos); pos += 4
        elif vt == _T_F32:
            (meta[key],) = struct.unpack_from("<f", data, pos); pos += 4
        elif vt == _T_STR:
            meta[key] = read_str()
        elif vt == _T_U64:
            (meta[key],) = struct.unpack_from("<Q", data, pos); pos += 8
        else:
            raise ValueError(f"metadata type {vt} not handled")

    infos = []
    for _ in range(n_tensors):
        name = read_str()
        (nd,) = struct.unpack_from("<I", data, pos)
        pos += 4
        dims = struct.unpack_from(f"<{nd}Q", data, pos)
        pos += 8 * nd
        ttype, off = struct.unpack_from("<IQ", data, pos)
        pos += 12
        infos.append((name, dims, ttype, off))

    base = pos + ((-pos) % ALIGNMENT)
    tensors: Dict[str, np.ndarray] = {}
    for name, dims, ttype, off in infos:
        shape = tuple(reversed(dims))
        n = int(np.prod(shape))
        start = base + off
        if ttype == GGML_F32:
            a = np.frombuffer(data, np.float32, n, start).reshape(shape)
        elif ttype == GGML_F16:
            a = np.frombuffer(data, np.float16, n, start).reshape(shape)
        elif ttype == GGML_Q8_0:
            nbytes = n // 32 * 34
            a = dequantize_q8_0(data[start:start + nbytes], n).reshape(shape)
        elif ttype == GGML_Q4_K:
            nbytes = n // 256 * 144
            a = dequantize_q4_k(data[start:start + nbytes], n).reshape(shape)
        else:
            raise ValueError(f"tensor type {ttype} not handled")
        tensors[name] = a.copy()
    return tensors, meta


def export_params_gguf(
    path: str,
    params,
    metadata: Optional[Mapping[str, Any]] = None,
    quantize_2d: str = "q8_0",
) -> None:
    """Export an ao_tpu params pytree (QuantizedArray leaves included) to a
    GGUF file: quantized leaves dequantize to hp, then re-code per
    ``quantize_2d`` — the interchange path to llama.cpp-family runtimes."""
    import jax

    from ao_tpu.quantization.qarrays.base import QuantizedArray
    from ao_tpu.quantization.quantize import path_to_fqn

    flat: Dict[str, np.ndarray] = {}

    def visit(p, leaf):
        fqn = path_to_fqn(p)
        if isinstance(leaf, QuantizedArray):
            flat[fqn] = np.asarray(leaf.dequantize(np.float32))
        else:
            flat[fqn] = np.asarray(leaf, np.float32)
        return leaf

    jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
    write_gguf(path, flat, metadata, quantize_2d=quantize_2d)
