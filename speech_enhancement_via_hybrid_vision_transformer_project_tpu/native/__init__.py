"""ctypes bindings for the native C++ audio runtime.

Loads ``libsevit_audio.so`` (built from sevit_audio.cpp via the Makefile;
auto-built on first import when a compiler is available). All entry points
degrade gracefully: ``available()`` is False and callers fall back to the
pure-numpy implementations in ``data.wavio`` / ``ops.audio``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libsevit_audio.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True, capture_output=True, timeout=120
        )
        return _SO.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.sevit_wav_info.restype = ctypes.c_long
    lib.sevit_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.sevit_wav_read.restype = ctypes.c_long
    lib.sevit_wav_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sevit_wav_write.restype = ctypes.c_int
    lib.sevit_wav_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
    ]
    lib.sevit_peak_normalize.restype = ctypes.c_float
    lib.sevit_peak_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_float,
    ]
    lib.sevit_pre_emphasis.restype = None
    lib.sevit_pre_emphasis.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_float,
    ]
    lib.sevit_decode_batch.restype = None
    lib.sevit_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Decode one WAV to mono float32 (native fast path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sr = ctypes.c_int(0)
    n = lib.sevit_wav_info(str(path).encode(), ctypes.byref(sr))
    if n < 0:
        raise IOError(f"native decode failed: {path}")
    buf = np.empty(n, np.float32)
    got = lib.sevit_wav_read(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.byref(sr),
    )
    if got < 0:
        raise IOError(f"native decode failed: {path}")
    return buf[:got], sr.value


def write_wav(path: str | Path, x: np.ndarray, sample_rate: int) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    rc = lib.sevit_wav_write(
        str(path).encode(),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        sample_rate,
    )
    if rc != 0:
        raise IOError(f"native write failed: {path}")


def decode_batch(
    paths: Sequence[str | Path],
    max_len: int,
    *,
    normalize: bool = False,
    target: float = 0.95,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Threaded batch decode into one padded [B, max_len] matrix.

    Returns (batch, lengths, sample_rates); lengths[i] == -1 on error.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    count = len(paths)
    out = np.zeros((count, max_len), np.float32)
    lengths = np.zeros(count, np.int64)
    rates = np.zeros(count, np.int32)
    arr = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    lib.sevit_decode_batch(
        arr,
        count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        1 if normalize else 0,
        target,
        num_threads,
    )
    return out, lengths, rates


def peak_normalize_inplace(x: np.ndarray, target: float = 0.95) -> float:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    assert x.dtype == np.float32 and x.flags.c_contiguous
    return lib.sevit_peak_normalize(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), target
    )


def pre_emphasis_inplace(x: np.ndarray, coef: float = 0.97) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    assert x.dtype == np.float32 and x.flags.c_contiguous
    lib.sevit_pre_emphasis(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), coef
    )
