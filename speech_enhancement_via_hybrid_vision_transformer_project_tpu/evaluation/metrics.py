"""Objective speech-quality metrics (host-side numpy).

Rebuild of the reference metrics (reference: evaluation/metrics.py):
SI-SDR, SNR, SegSNR and LSD from scratch in numpy; **STOI implemented
natively** (Taal et al. 2011 — the image has no pystoi); **PESQ implemented
natively** too (`pesq_native.pesq_p862`, the ITU-T P.862 perceptual model in
numpy) and used automatically whenever the optional ``pesq`` C-extension
package is absent.

Failure policy differs from the reference deliberately: unavailable
metrics return ``nan`` and are *excluded* from aggregation instead of
degrading to 0.0 and silently corrupting averages (reference:
evaluation/metrics.py:50-55 — SURVEY.md §4 calls this out).
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional

import numpy as np

from ..ops.audio import resample as _resample

EPS = np.finfo(np.float64).eps


def _match(ref: np.ndarray, deg: np.ndarray):
    n = min(len(ref), len(deg))
    return ref[:n].astype(np.float64), deg[:n].astype(np.float64)


# ---------------------------------------------------------------------------
# SI-SDR / SNR / SegSNR / LSD (reference: evaluation/metrics.py:100-296)
# ---------------------------------------------------------------------------


def si_sdr(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Scale-invariant SDR in dB (zero-mean, alpha-projection;
    reference: evaluation/metrics.py:100-145)."""
    ref, est = _match(reference, estimate)
    ref = ref - ref.mean()
    est = est - est.mean()
    denom = np.sum(ref**2)
    if denom <= 0:
        return float("nan")
    alpha = np.dot(est, ref) / denom
    target = alpha * ref
    noise = est - target
    npow = np.sum(noise**2)
    if npow <= 0:
        return float("inf")
    return float(10.0 * np.log10(np.sum(target**2) / npow + EPS))


def snr(reference: np.ndarray, estimate: np.ndarray) -> float:
    """Plain SNR in dB (reference: evaluation/metrics.py:148-184)."""
    ref, est = _match(reference, estimate)
    noise = est - ref
    sp = np.sum(ref**2)
    npow = np.sum(noise**2)
    if npow <= 0:
        return float("inf")
    if sp <= 0:
        return float("-inf")
    return float(10.0 * np.log10(sp / npow))


def segmental_snr(
    reference: np.ndarray,
    estimate: np.ndarray,
    frame_length: int = 512,
    hop_length: int = 256,
    min_db: float = -10.0,
    max_db: float = 35.0,
) -> float:
    """Framewise SNR averaged, clipped to [-10, 35] dB
    (reference: evaluation/metrics.py:187-243)."""
    ref, est = _match(reference, estimate)
    n_frames = 1 + max(0, (len(ref) - frame_length)) // hop_length
    if n_frames == 0:
        return snr(ref, est)
    vals = []
    for i in range(n_frames):
        s = i * hop_length
        r = ref[s : s + frame_length]
        e = est[s : s + frame_length]
        sp = np.sum(r**2)
        npow = np.sum((e - r) ** 2)
        if sp <= 0:
            continue
        val = 10.0 * np.log10(sp / (npow + EPS) + EPS)
        vals.append(np.clip(val, min_db, max_db))
    return float(np.mean(vals)) if vals else float("nan")


# 20/ln(10): converts an RMS of natural-log magnitude differences to an
# RMS of dB (20*log10) magnitude differences — the two LSD conventions.
_LN_TO_DB = 20.0 / np.log(10.0)


def _centered_mag_spec(x: np.ndarray, n_fft: int, hop_length: int) -> np.ndarray:
    """[T, F] magnitude spectrogram with librosa.stft>=0.10 semantics:
    center=True zero padding by n_fft//2, periodic hann, win_length=n_fft."""
    win = np.hanning(n_fft + 1)[:-1]  # periodic hann
    x = np.pad(x, (n_fft // 2, n_fft // 2))
    n_frames = 1 + (len(x) - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return np.abs(np.fft.rfft(x[idx] * win, axis=1))


def log_spectral_distance(
    reference: np.ndarray,
    estimate: np.ndarray,
    n_fft: int = 512,
    hop_length: int = 128,
    eps: float = 1e-10,
) -> float:
    """Log-spectral distance on the **reference's scale** (reference:
    evaluation/metrics.py:246-296): per-frame RMS over frequency of
    *natural-log magnitude* differences, averaged over frames, with the
    reference's eps=1e-10 and librosa.stft framing (center=True zero pad,
    periodic hann). Lower is better. Multiply by ``20/ln(10) ≈ 8.6859``
    for the dB-magnitude convention (reported as ``lsd_db``)."""
    ref, est = _match(reference, estimate)
    if len(ref) == 0:
        return float("nan")
    r_mag = _centered_mag_spec(ref, n_fft, hop_length)
    e_mag = _centered_mag_spec(est, n_fft, hop_length)
    d = np.log(r_mag + eps) - np.log(e_mag + eps)
    # reference: mean over frequency (axis=0 of [F,T]) -> sqrt -> frame mean
    return float(np.mean(np.sqrt(np.mean(d**2, axis=1))))


# ---------------------------------------------------------------------------
# STOI — native implementation (Taal et al., ICASSP 2011)
# ---------------------------------------------------------------------------

_STOI_SR = 10000
_STOI_FRAME = 256
_STOI_HOP = 128
_STOI_NFFT = 512
_STOI_NBANDS = 15
_STOI_MINFREQ = 150.0
_STOI_SEG = 30  # frames per intelligibility segment (384 ms)
_STOI_BETA = -15.0  # clipping lower SDR bound, dB
_STOI_DYN_RANGE = 40.0


def _stoi_band_matrix(sr: int, n_fft: int) -> np.ndarray:
    """[n_bands, n_bins] 1/3-octave band membership matrix."""
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    cf = _STOI_MINFREQ * 2.0 ** (np.arange(_STOI_NBANDS) / 3.0)
    lo = cf / 2.0 ** (1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    mat = np.zeros((_STOI_NBANDS, len(freqs)))
    for b in range(_STOI_NBANDS):
        mat[b] = (freqs >= lo[b]) & (freqs < hi[b])
    return mat


def _frames(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    n = 1 + max(0, (len(x) - frame)) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    return x[idx]


def _remove_silent_frames(x, y, frame=_STOI_FRAME, hop=_STOI_HOP):
    w = np.hanning(frame + 2)[1:-1]
    xf = _frames(x, frame, hop) * w
    yf = _frames(y, frame, hop) * w
    energies = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + EPS)
    mask = energies > energies.max() - _STOI_DYN_RANGE
    xf, yf = xf[mask], yf[mask]
    n_out = frame + (len(xf) - 1) * hop if len(xf) else 0
    xs = np.zeros(n_out)
    ys = np.zeros(n_out)
    for i in range(len(xf)):  # overlap-add (hann 50% sums to 1)
        xs[i * hop : i * hop + frame] += xf[i]
        ys[i * hop : i * hop + frame] += yf[i]
    return xs, ys


def stoi(
    reference: np.ndarray, estimate: np.ndarray, sample_rate: int = 16000
) -> float:
    """Short-Time Objective Intelligibility in [0, 1] (native
    implementation of the pystoi algorithm the reference calls,
    evaluation/metrics.py:58-97).

    Value-validated against a faithful independent reimplementation of the
    pystoi algorithm (tests/golden_stoi.py): max observed deviation 0.006
    absolute at 16 kHz input (resampler window difference), 0.002 at the
    algorithm-native 10 kHz — see tests/test_metric_golden.py."""
    ref, est = _match(reference, estimate)
    if sample_rate != _STOI_SR:
        ref = _resample(ref.astype(np.float32), sample_rate, _STOI_SR).astype(
            np.float64
        )
        est = _resample(est.astype(np.float32), sample_rate, _STOI_SR).astype(
            np.float64
        )
    ref, est = _remove_silent_frames(ref, est)
    if len(ref) < _STOI_FRAME * 2:
        return float("nan")
    w = np.hanning(_STOI_FRAME + 2)[1:-1]
    rf = _frames(ref, _STOI_FRAME, _STOI_HOP) * w
    ef = _frames(est, _STOI_FRAME, _STOI_HOP) * w
    r_spec = np.abs(np.fft.rfft(rf, n=_STOI_NFFT, axis=1)) ** 2
    e_spec = np.abs(np.fft.rfft(ef, n=_STOI_NFFT, axis=1)) ** 2
    band = _stoi_band_matrix(_STOI_SR, _STOI_NFFT)
    # [T, bands]
    x = np.sqrt(r_spec @ band.T + EPS)
    y = np.sqrt(e_spec @ band.T + EPS)
    n_seg = x.shape[0] - _STOI_SEG + 1
    if n_seg <= 0:
        return float("nan")
    clip = 10.0 ** (-_STOI_BETA / 20.0)
    corrs = []
    for m in range(n_seg):
        xs = x[m : m + _STOI_SEG]  # [N, bands]
        ys = y[m : m + _STOI_SEG]
        alpha = np.sqrt(
            np.sum(xs**2, axis=0) / (np.sum(ys**2, axis=0) + EPS)
        )
        ys_c = np.minimum(ys * alpha, xs * (1.0 + clip))
        xm = xs - xs.mean(axis=0)
        ym = ys_c - ys_c.mean(axis=0)
        num = np.sum(xm * ym, axis=0)
        den = np.linalg.norm(xm, axis=0) * np.linalg.norm(ym, axis=0) + EPS
        corrs.append(num / den)
    return float(np.mean(corrs))


# ---------------------------------------------------------------------------
# PESQ — optional (needs the ITU reference C implementation)
# ---------------------------------------------------------------------------


_NATIVE_PESQ_WARNED = False


def pesq_implementation() -> str:
    """Which implementation :func:`pesq_score` will use: ``'itu'`` when the
    ITU reference ``pesq`` package is importable, else ``'native'`` (the
    first-party P.862 model). The Evaluator records this in its output so
    downstream consumers never mix the two scales unknowingly."""
    try:
        import pesq  # noqa: F401

        return "itu"
    except ImportError:
        return "native"


def _native_pesq(ref, est, sample_rate, mode) -> float:
    global _NATIVE_PESQ_WARNED
    if not _NATIVE_PESQ_WARNED:
        warnings.warn(
            "PESQ is being scored by the first-party native P.862 model "
            "(ITU 'pesq' package unavailable or failed). Native scores are "
            "not conformance-tested against the ITU implementation — do not "
            "compare them with ITU-scored results.",
            stacklevel=3,
        )
        _NATIVE_PESQ_WARNED = True
    from .pesq_native import pesq_p862

    try:
        return pesq_p862(ref, est, sample_rate, mode)
    except Exception as e:
        warnings.warn(f"native PESQ failed: {e}")
        return float("nan")


def pesq_score(
    reference: np.ndarray,
    estimate: np.ndarray,
    sample_rate: int = 16000,
    mode: str = "auto",
    allow_native: bool = True,
) -> float:
    """PESQ MOS-LQO. Prefers the ITU reference C code via the ``pesq``
    package when installed (reference: evaluation/metrics.py:16-55 uses the
    same package); otherwise falls back to the first-party numpy
    implementation of the P.862 perceptual model (`pesq_native.pesq_p862` —
    structurally faithful, not conformance-tested; see its module docstring).
    ``mode='auto'`` resolves to wideband (P.862.2) at 16 kHz and narrowband
    (P.862.1) at 8 kHz — wideband is undefined at 8 kHz. Set
    ``allow_native=False`` to get nan instead of the native score when
    the ITU implementation is unavailable."""
    if mode == "auto":
        mode = "wb" if sample_rate >= 16000 else "nb"
    ref, est = _match(reference, estimate)
    try:
        from pesq import pesq as _pesq
    except ImportError:
        if not allow_native:
            warnings.warn("pesq package unavailable; PESQ reported as nan")
            return float("nan")
        return _native_pesq(ref, est, sample_rate, mode)
    try:
        return float(_pesq(sample_rate, ref, est, mode))
    except Exception as e:  # pragma: no cover
        # ITU raises on e.g. short/quiet clips (NoUtterancesError); keep
        # behavior consistent with the package-absent path
        if allow_native:
            warnings.warn(f"ITU PESQ failed ({e}); trying native fallback")
            return _native_pesq(ref, est, sample_rate, mode)
        warnings.warn(f"PESQ failed: {e}")
        return float("nan")


# ---------------------------------------------------------------------------
# Aggregation (reference: evaluation/metrics.py:299-368)
# ---------------------------------------------------------------------------


def compute_all_metrics(
    clean: np.ndarray,
    enhanced: np.ndarray,
    noisy: Optional[np.ndarray] = None,
    sample_rate: int = 16000,
    include_pesq: bool = True,
) -> Dict[str, float]:
    """All metrics for one utterance, plus improvement-over-noisy deltas
    (reference: evaluation/metrics.py:299-349).

    ``lsd`` is on the reference's natural-log scale; ``lsd_db`` is the same
    distance in dB-magnitude convention (×20/ln10). Improvement semantics:
    every ``*_improvement`` is signed so that **positive = better** —
    ``enhanced − noisy`` for the higher-is-better metrics (pesq, stoi,
    si_sdr, snr, seg_snr — the reference emits the first four,
    evaluation/metrics.py:337-348) and ``noisy − enhanced`` for LSD, the
    one lower-is-better metric (a positive ``lsd_improvement`` is a
    *reduction* in log-spectral distance)."""
    out = {
        "si_sdr": si_sdr(clean, enhanced),
        "snr": snr(clean, enhanced),
        "seg_snr": segmental_snr(clean, enhanced),
        "lsd": log_spectral_distance(clean, enhanced),
        "stoi": stoi(clean, enhanced, sample_rate),
    }
    out["lsd_db"] = out["lsd"] * _LN_TO_DB
    if include_pesq:
        out["pesq"] = pesq_score(clean, enhanced, sample_rate)
    if noisy is not None:
        base = {
            "si_sdr": si_sdr(clean, noisy),
            "snr": snr(clean, noisy),
            "seg_snr": segmental_snr(clean, noisy),
            "lsd": log_spectral_distance(clean, noisy),
            "stoi": stoi(clean, noisy, sample_rate),
        }
        base["lsd_db"] = base["lsd"] * _LN_TO_DB
        if include_pesq:
            base["pesq"] = pesq_score(clean, noisy, sample_rate)
        lower_is_better = {"lsd", "lsd_db"}
        for k, v in base.items():
            out[f"noisy_{k}"] = v
            delta = (v - out[k]) if k in lower_is_better else (out[k] - v)
            out[f"{k}_improvement"] = delta
    return out


def metrics_task(args) -> Dict[str, float]:
    """Process-pool entry point for parallel metric scoring (round 5;
    VERDICT r4 task 6). ``args = (clean, enhanced, noisy, sample_rate,
    include_pesq)``. Metric computation is embarrassingly parallel per
    file and pure numpy, so worker results are bit-identical to an
    in-process call (asserted by tests/test_round5.py). The reference
    scores files serially in its eval loop
    (reference: evaluation/evaluator.py:157-231)."""
    clean, enhanced, noisy, sample_rate, include_pesq = args
    return compute_all_metrics(
        clean, enhanced, noisy, sample_rate, include_pesq=include_pesq
    )


def metrics_pool_init() -> None:
    """Worker initializer: keep pool workers CPU-only and quiet. Workers
    never touch a device, but the environment preimports jax — pinning the
    platform guarantees a spawned worker can never open a second client
    against the single-client TPU relay."""
    import warnings

    warnings.filterwarnings(
        "ignore", message=".*native P.862.*", category=UserWarning
    )
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def print_metrics(metrics: Dict[str, float]) -> str:
    """(reference: evaluation/metrics.py:352-368)"""
    lines = ["=" * 48, "Speech Enhancement Metrics", "=" * 48]
    for k in sorted(metrics):
        lines.append(f"{k:>24s}: {metrics[k]: .4f}")
    lines.append("=" * 48)
    text = "\n".join(lines)
    print(text)
    return text
