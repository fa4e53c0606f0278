"""Window functions for framed DSP.

TPU-first equivalents of the window support the reference obtains from
librosa/scipy (reference: utils/audio_processing.py:67-132 uses
``window='hann'`` everywhere; librosa resolves that with
``scipy.signal.get_window(..., fftbins=True)`` i.e. *periodic* windows).
Everything here is computed with numpy at trace time — windows are static
constants baked into the compiled program.
"""

from __future__ import annotations

import numpy as np


def hann(win_length: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, matching librosa/torch defaults."""
    if win_length == 1:
        return np.ones((1,), dtype=dtype)
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return w.astype(dtype)


def hamming(win_length: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    if win_length == 1:
        return np.ones((1,), dtype=dtype)
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * k / n)
    return w.astype(dtype)


def rectangular(win_length: int, dtype=np.float32) -> np.ndarray:
    return np.ones((win_length,), dtype=dtype)


def blackman(win_length: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    if win_length == 1:
        return np.ones((1,), dtype=dtype)
    n = win_length if periodic else win_length - 1
    k = np.arange(win_length, dtype=np.float64)
    w = (
        0.42
        - 0.5 * np.cos(2.0 * np.pi * k / n)
        + 0.08 * np.cos(4.0 * np.pi * k / n)
    )
    return w.astype(dtype)


_WINDOWS = {
    "hann": hann,
    "hamming": hamming,
    "blackman": blackman,
    "rectangular": rectangular,
    "ones": rectangular,
    "boxcar": rectangular,
}


def get_window(name: str, win_length: int, dtype=np.float32) -> np.ndarray:
    """Resolve a window by name (reference passes the string from YAML,
    config/model_config.yaml audio.window)."""
    try:
        fn = _WINDOWS[name.lower()]
    except KeyError as e:
        raise ValueError(
            f"Unknown window {name!r}; available: {sorted(_WINDOWS)}"
        ) from e
    if fn is rectangular:
        return rectangular(win_length, dtype=dtype)
    return fn(win_length, dtype=dtype)
