"""Waveform-domain utilities (numpy host-side + jnp on-device variants).

TPU-native rebuild of the reference's audio helpers (reference:
utils/audio_processing.py:135-339 and data/preprocessing.py:64-285). Host
preprocessing stays numpy (it runs in the input pipeline on CPU hosts);
anything that can sit inside a jitted graph has a jnp twin.
"""

from __future__ import annotations

import numpy as np

try:  # scipy is available in-image; used for IIR de-emphasis + resample
    from scipy import signal as _scipy_signal
except Exception:  # pragma: no cover
    _scipy_signal = None


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def peak_normalize(x: np.ndarray, target_level: float = 0.95):
    """Scale so max |x| == target_level; returns (normalized, peak).

    (reference: utils/audio_processing.py:135-156; inference/enhancer.py:71-79
    normalizes to 0.95 and rescales the output by the original peak.)
    """
    peak = float(np.max(np.abs(x))) if x.size else 0.0
    if peak > 0:
        return (x * (target_level / peak)).astype(np.float32), peak
    return x.astype(np.float32), peak


def rms_energy(x: np.ndarray, frame_length: int = 2048, hop_length: int = 512):
    """Framewise RMS energy (reference: utils/audio_processing.py:282-304)."""
    n = max(1 + (len(x) - frame_length) // hop_length, 0)
    if n == 0:
        return np.sqrt(np.mean(x**2, keepdims=True)).astype(np.float32)
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = x[idx]
    return np.sqrt(np.mean(frames**2, axis=1)).astype(np.float32)


# ---------------------------------------------------------------------------
# Pre/de-emphasis
# ---------------------------------------------------------------------------


def pre_emphasis(x: np.ndarray, coef: float = 0.97) -> np.ndarray:
    """y[n] = x[n] - coef*x[n-1] (reference: data/preprocessing.py:85-103)."""
    return np.concatenate([x[:1], x[1:] - coef * x[:-1]]).astype(np.float32)


def de_emphasis(x: np.ndarray, coef: float = 0.97) -> np.ndarray:
    """Inverse IIR filter of pre-emphasis (reference:
    data/preprocessing.py:105-117 uses scipy.signal.lfilter)."""
    if _scipy_signal is not None:
        return _scipy_signal.lfilter([1.0], [1.0, -coef], x).astype(np.float32)
    y = np.empty_like(x, dtype=np.float64)
    acc = 0.0
    for i, v in enumerate(x):  # small fallback
        acc = v + coef * acc
        y[i] = acc
    return y.astype(np.float32)


# ---------------------------------------------------------------------------
# Silence trimming / VAD
# ---------------------------------------------------------------------------


def trim_silence_db(
    x: np.ndarray,
    top_db: float = 30.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> np.ndarray:
    """Trim leading/trailing frames more than top_db below peak RMS
    (reference: utils/audio_processing.py:254-279, librosa.effects.trim)."""
    rms = rms_energy(x, frame_length, hop_length)
    ref = np.max(rms)
    if ref <= 0:
        return x
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    keep = np.nonzero(db > -top_db)[0]
    if keep.size == 0:
        return x
    start = keep[0] * hop_length
    end = min(keep[-1] * hop_length + frame_length, len(x))
    return x[start:end]


def energy_vad_trim(
    x: np.ndarray,
    threshold: float = 0.01,
    frame_length: int = 400,
    hop_length: int = 160,
) -> np.ndarray:
    """Energy-threshold VAD trim (reference: data/preprocessing.py:119-164)."""
    rms = rms_energy(x, frame_length, hop_length)
    keep = np.nonzero(rms > threshold)[0]
    if keep.size == 0:
        return x
    start = keep[0] * hop_length
    end = min(keep[-1] * hop_length + frame_length, len(x))
    return x[start:end]


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample (reference: utils/audio_processing.py:230-251 uses
    librosa.resample; scipy.resample_poly is the equivalent host-side op)."""
    if orig_sr == target_sr:
        return x.astype(np.float32)
    if _scipy_signal is None:  # pragma: no cover
        raise RuntimeError("scipy unavailable; cannot resample")
    g = np.gcd(int(orig_sr), int(target_sr))
    return _scipy_signal.resample_poly(
        x.astype(np.float64), target_sr // g, orig_sr // g
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Dynamic range compression / noise mixing / SNR
# ---------------------------------------------------------------------------


def dynamic_range_compress(
    x: np.ndarray, threshold_db: float = -20.0, ratio: float = 4.0
) -> np.ndarray:
    """Simple static compressor above a dB threshold (reference:
    data/preprocessing.py:188-222)."""
    eps = 1e-10
    db = 20.0 * np.log10(np.maximum(np.abs(x), eps))
    over = db > threshold_db
    comp_db = np.where(over, threshold_db + (db - threshold_db) / ratio, db)
    return (np.sign(x) * 10.0 ** (comp_db / 20.0) * (np.abs(x) > eps)).astype(
        np.float32
    )


def compute_snr_db(clean: np.ndarray, noisy: np.ndarray) -> float:
    """SNR of noisy w.r.t. clean (reference: data/preprocessing.py:262-285)."""
    n = min(len(clean), len(noisy))
    clean, noisy = clean[:n], noisy[:n]
    noise = noisy - clean
    sp = float(np.sum(clean**2))
    npow = float(np.sum(noise**2))
    if npow <= 0:
        return float("inf")
    return 10.0 * np.log10(sp / npow) if sp > 0 else float("-inf")


def mix_at_snr(
    clean: np.ndarray, noise: np.ndarray, snr_db: float, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Additively mix noise into clean at a target SNR (reference:
    data/preprocessing.py:224-260). Noise is tiled/cropped to length."""
    if rng is None:
        rng = np.random.default_rng()
    n = len(clean)
    if len(noise) < n:
        reps = int(np.ceil(n / len(noise)))
        noise = np.tile(noise, reps)
    if len(noise) > n:
        start = int(rng.integers(0, len(noise) - n + 1))
        noise = noise[start : start + n]
    cp = np.mean(clean**2)
    npow = np.mean(noise**2)
    if npow <= 0 or cp <= 0:
        return clean.astype(np.float32)
    scale = np.sqrt(cp / (npow * 10.0 ** (snr_db / 10.0)))
    return (clean + scale * noise).astype(np.float32)
