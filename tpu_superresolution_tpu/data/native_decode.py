"""ctypes binding for the native C++ PNG decode pipeline (native/decoder.cpp).

The native path decodes a whole batch with a C++ thread pool straight
into one float32 [N, H, W, C] buffer — replacing the reference's
spawned-DataLoader-worker PIL decode (train.py:59-76) on the host side.
Falls back to the PIL path (data/decode.py) when the shared library
isn't built; `ensure_built()` compiles it on first use when a toolchain
is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsrnative.so"

_lib = None
_load_failed = False


def ensure_built(quiet: bool = True) -> bool:
    """Build libsrnative.so if missing; returns availability."""
    if _LIB_PATH.exists():
        return True
    if not (_NATIVE_DIR / "decoder.cpp").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.srn_decode_batch.restype = ctypes.c_int
    lib.srn_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.srn_probe.restype = ctypes.c_int
    lib.srn_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def probe(path) -> Tuple[int, int, int, int]:
    """(h, w, channels, bit_depth) of a PNG."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    rc = lib.srn_probe(str(path).encode(), h, w, c, b)
    if rc != 0:
        raise IOError(f"srn_probe failed for {path}")
    return h.value, w.value, c.value, b.value


def decode_batch_native(
    paths: Sequence,
    out_h: int,
    out_w: int,
    grayscale: bool = True,
    channels: int = 1,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode uniform-size PNGs into float32 [N, out_h, out_w, channels]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, channels), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.srn_decode_batch(
        arr,
        n,
        out_h,
        out_w,
        1 if grayscale else 0,
        channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]}")
    return out
