"""ctypes bridge to the native quant codec library (native/quantops.cpp).

Auto-builds libquantops.so with `make -C native` on first use if a compiler is
available; every entry point degrades to the numpy codecs in quants.py when the
library is missing or LLAMATPU_NO_NATIVE=1.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libquantops.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LLAMATPU_NO_NATIVE") == "1":
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i8 = ctypes.POINTER(ctypes.c_int8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    for name, argtypes in [
        ("dequant_q8_0", (u8, i64, f32)),
        ("dequant_q4_0", (u8, i64, f32)),
        ("dequant_q4_k", (u8, i64, f32)),
        ("dequant_q5_k", (u8, i64, f32)),
        ("dequant_q6_k", (u8, i64, f32)),
        ("quantize_q8_0", (f32, i64, u8)),
        ("depack_q8_0", (u8, i64, i8, f32)),
        ("depack_q4_0", (u8, i64, i8, f32)),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = list(argtypes)
        fn.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def dequant(kind: str, raw: np.ndarray, n_blocks: int, block_elems: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(n_blocks * block_elems, np.float32)
    getattr(lib, f"dequant_{kind}")(_ptr(raw, ctypes.c_uint8), n_blocks,
                                    _ptr(out, ctypes.c_float))
    return out


def quantize_q8_0(values: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.float32)
    nb = values.size // 32
    out = np.empty(nb * 34, np.uint8)
    lib.quantize_q8_0(_ptr(values, ctypes.c_float), nb, _ptr(out, ctypes.c_uint8))
    return out


def depack(kind: str, raw: np.ndarray, n_blocks: int) -> tuple[np.ndarray, np.ndarray] | None:
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    qs = np.empty((n_blocks, 32), np.int8)
    scales = np.empty(n_blocks, np.float32)
    getattr(lib, f"depack_{kind}")(_ptr(raw, ctypes.c_uint8), n_blocks,
                                   _ptr(qs, ctypes.c_int8), _ptr(scales, ctypes.c_float))
    return qs, scales
