"""STFT / iSTFT core, designed TPU-first.

This replaces the librosa STFT/iSTFT calls the reference makes everywhere
(reference: data/dataset.py:169-196, inference/enhancer.py:82-129,
utils/audio_processing.py:67-132) with a JAX implementation built for the
MXU:

* **Framing** uses a block-reshape trick: when ``hop_length`` divides
  ``n_fft`` (the reference's 512/128 case), overlapped frames are a
  concatenation of ``R = n_fft//hop`` consecutive hop-blocks, so framing is
  R static slices + a concat — no gather, no dynamic shapes, fully fusable
  by XLA. A gather fallback covers arbitrary hops.
* **The DFT is a matmul.** For n_fft=512 a real DFT is a ``[N,512]@[512,257]``
  matmul per real/imag part — exactly what the 128x128 systolic array wants,
  and the analysis window folds into the DFT matrix for free (one fused op
  instead of window-multiply + FFT). An ``method='fft'`` path via
  ``jnp.fft.rfft`` is kept for cross-checking and for very large n_fft.
* **Overlap-add** for iSTFT is the inverse phase-split: each frame's R
  hop-blocks are scattered by static pads + adds — no scatter op.

Numerics match librosa's ``stft``/``istft`` defaults (center=True, reflect
padding, periodic Hann, window-sum normalization with tiny-threshold) to
fp32 tolerance; tests/test_stft.py golden-tests against torch.stft.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .windows import get_window

Array = jax.Array


@dataclass(frozen=True)
class STFTConfig:
    """Static STFT parameters (reference: config/model_config.yaml audio.*)."""

    n_fft: int = 512
    hop_length: int = 128
    win_length: int = 512
    window: str = "hann"
    center: bool = True
    pad_mode: str = "reflect"

    def __post_init__(self):
        if self.win_length > self.n_fft:
            raise ValueError("win_length must be <= n_fft")

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, length: int) -> int:
        pad = self.n_fft // 2 if self.center else 0
        total = length + 2 * pad
        if total < self.n_fft:
            raise ValueError(f"signal too short: {length}")
        return 1 + (total - self.n_fft) // self.hop_length

    def padded_window(self, dtype=np.float32) -> np.ndarray:
        """Analysis window, zero-padded (centered) to n_fft like librosa."""
        w = get_window(self.window, self.win_length, dtype=np.float64)
        if self.win_length < self.n_fft:
            lpad = (self.n_fft - self.win_length) // 2
            w = np.pad(w, (lpad, self.n_fft - self.win_length - lpad))
        return w.astype(dtype)


# ---------------------------------------------------------------------------
# DFT matrices (static constants, computed once per config)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _forward_dft_mats(n_fft: int):
    """Real-DFT as two [n_fft, n_bins] matrices: re = x@C, im = x@S."""
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang), -np.sin(ang)


@functools.lru_cache(maxsize=None)
def _inverse_dft_mats(n_fft: int):
    """Inverse real-DFT as two [n_bins, n_fft] matrices: x = re@A + im@B."""
    nb = n_fft // 2 + 1
    k = np.arange(nb)[:, None].astype(np.float64)
    n = np.arange(n_fft)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((nb, 1), 2.0)
    c[0] = 1.0
    c[-1] = 1.0  # DC and Nyquist counted once
    a = c * np.cos(ang) / n_fft
    b = -c * np.sin(ang) / n_fft
    return a, b


# ---------------------------------------------------------------------------
# Framing / overlap-add
# ---------------------------------------------------------------------------


def frame_signal(x: Array, cfg: STFTConfig) -> Array:
    """Slice ``x [..., L]`` into overlapped frames ``[..., N, n_fft]``.

    Center-pads with the configured pad mode first (librosa semantics).
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if cfg.center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=cfg.pad_mode)
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    if n_fft % hop == 0:
        r = n_fft // hop
        usable = (n_frames - 1 + r) * hop
        blocks = x[..., :usable].reshape(*x.shape[:-1], -1, hop)
        parts = [
            jax.lax.slice_in_dim(blocks, p, p + n_frames, axis=-2)
            for p in range(r)
        ]
        return jnp.concatenate(parts, axis=-1)
    # general hop: one gather
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def overlap_add(frames: Array, cfg: STFTConfig) -> Array:
    """Inverse of framing: ``[..., N, n_fft] -> [..., n_fft + (N-1)*hop]``."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n_frames = frames.shape[-2]
    out_len = n_fft + (n_frames - 1) * hop
    if n_fft % hop == 0:
        r = n_fft // hop
        m = n_frames - 1 + r  # output hop-blocks
        total = None
        for p in range(r):
            chunk = frames[..., p * hop : (p + 1) * hop]  # [..., N, hop]
            pads = [(0, 0)] * (frames.ndim - 2) + [(p, m - n_frames - p), (0, 0)]
            shifted = jnp.pad(chunk, pads)
            total = shifted if total is None else total + shifted
        return total.reshape(*frames.shape[:-2], m * hop)[..., :out_len]
    out = jnp.zeros((*frames.shape[:-2], out_len), frames.dtype)
    for i in range(n_frames):  # rare path; static unroll
        out = out.at[..., i * hop : i * hop + n_fft].add(frames[..., i, :])
    return out


@functools.lru_cache(maxsize=None)
def _window_sumsquare(cfg: STFTConfig, n_frames: int) -> np.ndarray:
    """Sum of squared synthesis windows at each output sample (librosa's
    ``window_sumsquare``), as a static numpy constant."""
    w2 = cfg.padded_window(np.float64) ** 2
    out_len = cfg.n_fft + (n_frames - 1) * cfg.hop_length
    s = np.zeros(out_len)
    for i in range(n_frames):
        s[i * cfg.hop_length : i * cfg.hop_length + cfg.n_fft] += w2
    return s.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / iSTFT
# ---------------------------------------------------------------------------


def stft(
    x: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    method: str = "matmul",
    precision=jax.lax.Precision.HIGHEST,
) -> tuple[Array, Array]:
    """Short-time Fourier transform.

    Args:
      x: real signal ``[..., L]``.
      method: ``'matmul'`` (windowed DFT as MXU matmuls — default on TPU)
        or ``'fft'`` (jnp.fft.rfft; reference semantics cross-check).

    Returns:
      ``(real, imag)`` each ``[..., n_bins, n_frames]`` float32 — the
      bins-first layout the reference uses (librosa's ``[F, T]``).
    """
    if method in ("auto", "pallas"):
        from .pallas_stft import stft_auto

        return stft_auto(x, cfg, method=method)
    x = x.astype(jnp.float32)
    frames = frame_signal(x, cfg)  # [..., N, n_fft]
    if method == "matmul":
        w = cfg.padded_window(np.float64)
        c, s = _forward_dft_mats(cfg.n_fft)
        wc = jnp.asarray((w[:, None] * c), dtype=jnp.float32)
        ws = jnp.asarray((w[:, None] * s), dtype=jnp.float32)
        re = jnp.matmul(frames, wc, precision=precision)
        im = jnp.matmul(frames, ws, precision=precision)
    elif method == "fft":
        w = jnp.asarray(cfg.padded_window())
        spec = jnp.fft.rfft(frames * w, n=cfg.n_fft, axis=-1)
        re, im = jnp.real(spec), jnp.imag(spec)
    else:
        raise ValueError(f"unknown stft method {method!r}")
    # [..., N, F] -> [..., F, N]
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def istft(
    re: Array,
    im: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    length: int | None = None,
    method: str = "matmul",
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Inverse STFT with synthesis-window overlap-add and window-sum
    normalization (librosa ``istft`` semantics incl. ``length`` trim;
    reference: inference/enhancer.py:122-129)."""
    if method in ("auto", "pallas"):
        from .pallas_stft import istft_auto

        return istft_auto(
            re, im, cfg, length=length, method=method, precision=precision
        )
    re = jnp.swapaxes(re.astype(jnp.float32), -1, -2)  # [..., N, F]
    im = jnp.swapaxes(im.astype(jnp.float32), -1, -2)
    n_frames = re.shape[-2]
    if method == "matmul":
        a, b = _inverse_dft_mats(cfg.n_fft)
        frames = jnp.matmul(re, jnp.asarray(a, jnp.float32), precision=precision)
        frames = frames + jnp.matmul(
            im, jnp.asarray(b, jnp.float32), precision=precision
        )
    elif method == "fft":
        frames = jnp.fft.irfft(jax.lax.complex(re, im), n=cfg.n_fft, axis=-1)
    else:
        raise ValueError(f"unknown istft method {method!r}")
    w = jnp.asarray(cfg.padded_window())
    y = overlap_add(frames * w, cfg)
    wss = _window_sumsquare(cfg, n_frames)
    tiny = np.finfo(np.float32).tiny
    denom = jnp.asarray(np.where(wss > tiny, wss, 1.0))
    y = y / denom
    if cfg.center:
        y = y[..., cfg.n_fft // 2 :]
    if length is not None:
        y = y[..., :length]
        deficit = length - y.shape[-1]
        if deficit > 0:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, deficit)])
    elif cfg.center:
        y = y[..., : max(y.shape[-1] - cfg.n_fft // 2, 0)]
    return y


def magphase(re: Array, im: Array, eps: float = 0.0) -> tuple[Array, Array]:
    """Magnitude and phase from a complex spectrum (reference:
    utils/audio_processing.py:159-176)."""
    mag = jnp.sqrt(re * re + im * im + eps)
    phase = jnp.arctan2(im, re)
    return mag, phase


def polar(mag: Array, phase: Array) -> tuple[Array, Array]:
    """Recombine magnitude+phase into (re, im) (reference:
    utils/audio_processing.py:179-193)."""
    return mag * jnp.cos(phase), mag * jnp.sin(phase)


def spectrogram(x: Array, cfg: STFTConfig = STFTConfig(), **kw) -> tuple[Array, Array]:
    """Waveform -> (magnitude, phase), the dataset front-end transform
    (reference: data/dataset.py:169-196)."""
    re, im = stft(x, cfg, **kw)
    return magphase(re, im)


def reconstruct(
    mag: Array,
    phase: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    length: int | None = None,
    **kw,
) -> Array:
    """(magnitude, phase) -> waveform (reference: enhancer.py:117-129).

    With ``method='auto'|'pallas'`` on TPU the polar recombination fuses
    into the Pallas iSTFT kernel (mag/phase are read once; the complex
    spectrum never exists in HBM)."""
    method = kw.pop("method", "matmul")
    if method in ("auto", "pallas"):
        from .pallas_stft import istft_auto

        return istft_auto(
            mag, phase, cfg, length=length, method=method, polar=True, **kw
        )
    re, im = polar(mag, phase)
    return istft(re, im, cfg, length=length, method=method, **kw)


def griffin_lim(
    mag: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    n_iter: int = 32,
    length: int | None = None,
    key: Array | None = None,
) -> Array:
    """Griffin-Lim phase reconstruction (reference:
    utils/audio_processing.py:196-227 — a utility, not on the main path).

    Implemented as a ``lax.fori_loop`` over jitted STFT/iSTFT round trips so
    the whole iteration compiles to one XLA program.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    ang = jax.random.uniform(key, mag.shape, minval=0.0, maxval=2.0 * np.pi)
    re, im = mag * jnp.cos(ang), mag * jnp.sin(ang)
    # iSTFT length for intermediate rounds: implied signal length
    n_frames = mag.shape[-1]
    # largest length whose STFT has exactly n_frames frames
    implied = (n_frames - 1) * cfg.hop_length if cfg.center else (
        cfg.n_fft + (n_frames - 1) * cfg.hop_length
    )

    def body(_, carry):
        re, im = carry
        y = istft(re, im, cfg, length=implied)
        r2, i2 = stft(y, cfg)
        m = jnp.sqrt(r2 * r2 + i2 * i2)
        scale = mag / jnp.maximum(m, 1e-16)
        return r2 * scale, i2 * scale

    re, im = jax.lax.fori_loop(0, n_iter, body, (re, im))
    return istft(re, im, cfg, length=length if length is not None else implied)
