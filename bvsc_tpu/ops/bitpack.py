"""Bitstream packing of binary codes (wire format).

Packs the first-k priority bits of each frame into a contiguous little-endian
bitstream (k bits per 11.6 ms frame = the actual transmitted payload).  Uses
the native C kernel (``bvsc_tpu/native/bitpack.c``, compiled on first use
and cached) with a pure-numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "bitpack.c")
_lib = None
_tried = False


def _load_native():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so_path = os.path.join(_NATIVE_DIR, "libbvscbitpack.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
            with tempfile.NamedTemporaryFile(suffix=".so", dir=_NATIVE_DIR, delete=False) as tmp:
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", tmp.name, _SRC],
                    check=True, capture_output=True,
                )
                os.replace(tmp.name, so_path)
        lib = ctypes.CDLL(so_path)
        lib.bvsc_pack.restype = ctypes.c_long
        lib.bvsc_pack.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.bvsc_unpack.restype = ctypes.c_long
        lib.bvsc_unpack.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:  # pragma: no cover - toolchain missing
        _lib = None
    return _lib


def _as_bits(bits_per_frame, frames: int) -> np.ndarray:
    bits = np.asarray(bits_per_frame, np.int32)
    if bits.ndim == 0:
        bits = np.full(frames, int(bits), np.int32)
    return np.ascontiguousarray(bits)


def pack_codes(codes: np.ndarray, bits_per_frame) -> bytes:
    """codes: (frames, z_dim) of {0,1} (0.5 midpoints allowed in masked
    positions); bits_per_frame: scalar or (frames,).  Returns the packed
    payload (ceil(sum(k)/8) bytes)."""
    codes = np.ascontiguousarray(np.asarray(codes), np.float32)
    frames, z_dim = codes.shape
    bits = _as_bits(bits_per_frame, frames)
    hard = (codes > 0.5 + 1e-6).astype(np.uint8)
    total_bits = int(np.minimum(bits, z_dim).sum())
    out = np.zeros((total_bits + 7) // 8, np.uint8)
    lib = _load_native()
    if lib is not None:
        n = lib.bvsc_pack(
            np.ascontiguousarray(hard).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            frames, z_dim, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out[:n].tobytes()
    # numpy fallback
    flat = np.concatenate(
        [hard[t, : min(int(bits[t]), z_dim)] for t in range(frames)]
    ) if frames else np.zeros(0, np.uint8)
    return np.packbits(flat, bitorder="little").tobytes()


def unpack_codes(payload: bytes, bits_per_frame, frames: int, z_dim: int) -> np.ndarray:
    """Inverse of :func:`pack_codes`: (frames, z_dim) float32 with 0.5 in
    untransmitted positions."""
    bits = _as_bits(bits_per_frame, frames)
    out = np.empty((frames, z_dim), np.float32)
    buf = np.frombuffer(payload, np.uint8)
    lib = _load_native()
    if lib is not None:
        lib.bvsc_unpack(
            np.ascontiguousarray(buf).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            frames, z_dim, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    flat = np.unpackbits(buf, bitorder="little")
    out[:] = 0.5
    pos = 0
    for t in range(frames):
        k = min(int(bits[t]), z_dim)
        out[t, :k] = flat[pos : pos + k]
        pos += k
    return out
