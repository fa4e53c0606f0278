"""Plotting utilities (matplotlib, headless Agg).

Equivalent of the reference's visualization toolkit (reference:
utils/visualization.py:16-394): waveforms, dB spectrograms, 3x2
noisy/clean/enhanced comparison grids, loss curves, attention heatmaps and
metric bar charts. librosa.display is replaced by direct imshow of our own
STFT output.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..ops.stft import STFTConfig, magphase, stft  # noqa: E402


def _save_or_return(fig, save_path):
    if save_path is not None:
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig


def _to_db(mag: np.ndarray, ref: Optional[float] = None, floor_db: float = -80.0):
    ref = ref or max(float(np.max(mag)), 1e-10)
    db = 20.0 * np.log10(np.maximum(mag, 1e-10) / ref)
    return np.maximum(db, floor_db)


def plot_waveform(
    audio: np.ndarray,
    sample_rate: int = 16000,
    title: str = "Waveform",
    save_path=None,
):
    """(reference: utils/visualization.py:16-51)"""
    fig, ax = plt.subplots(figsize=(10, 3))
    t = np.arange(len(audio)) / sample_rate
    ax.plot(t, audio, linewidth=0.5)
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Amplitude")
    ax.set_title(title)
    ax.grid(alpha=0.3)
    return _save_or_return(fig, save_path)


def plot_spectrogram(
    audio_or_mag: np.ndarray,
    sample_rate: int = 16000,
    stft_config: STFTConfig = STFTConfig(),
    title: str = "Spectrogram",
    save_path=None,
    ax=None,
):
    """dB spectrogram (reference: utils/visualization.py:54-117)."""
    if audio_or_mag.ndim == 1:
        re, im = stft(audio_or_mag, stft_config)
        mag, _ = magphase(re, im)
        mag = np.asarray(mag)
    else:
        mag = np.asarray(audio_or_mag)
    db = _to_db(mag)
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(10, 4))
    else:
        fig = ax.figure
    extent = [
        0,
        mag.shape[1] * stft_config.hop_length / sample_rate,
        0,
        sample_rate / 2 / 1000.0,
    ]
    im_ = ax.imshow(
        db, origin="lower", aspect="auto", extent=extent, cmap="magma"
    )
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Frequency (kHz)")
    ax.set_title(title)
    if own_fig:
        fig.colorbar(im_, ax=ax, format="%+2.0f dB")
        return _save_or_return(fig, save_path)
    return ax


def plot_comparison(
    noisy: np.ndarray,
    clean: np.ndarray,
    enhanced: np.ndarray,
    sample_rate: int = 16000,
    stft_config: STFTConfig = STFTConfig(),
    save_path=None,
):
    """3x2 grid: waveform + spectrogram for noisy/clean/enhanced
    (reference: utils/visualization.py:120-258)."""
    fig, axes = plt.subplots(3, 2, figsize=(14, 10))
    names = ["Noisy", "Clean", "Enhanced"]
    for row, (name, sig) in enumerate(zip(names, [noisy, clean, enhanced])):
        t = np.arange(len(sig)) / sample_rate
        axes[row, 0].plot(t, sig, linewidth=0.4)
        axes[row, 0].set_title(f"{name} waveform")
        axes[row, 0].set_xlabel("Time (s)")
        plot_spectrogram(
            sig, sample_rate, stft_config,
            title=f"{name} spectrogram", ax=axes[row, 1],
        )
    fig.tight_layout()
    return _save_or_return(fig, save_path)


def plot_loss_curves(
    train_losses: Sequence[float],
    val_losses: Optional[Sequence[float]] = None,
    title: str = "Training Progress",
    save_path=None,
):
    """(reference: utils/visualization.py:261-302)"""
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(train_losses, label="train")
    if val_losses is not None:
        ax.plot(val_losses, label="val")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    return _save_or_return(fig, save_path)


def plot_attention_map(
    attention: np.ndarray,
    head: int = 0,
    title: str = "Attention",
    save_path=None,
):
    """Heatmap of one head's [N, N] attention
    (reference: utils/visualization.py:305-343). Accepts [H, N, N] or
    [B, H, N, N] (first batch element)."""
    a = np.asarray(attention)
    while a.ndim > 2:
        a = a[0] if a.shape[0] != a.shape[-1] or a.ndim > 3 else a[head]
        if a.ndim == 3:
            a = a[head]
    fig, ax = plt.subplots(figsize=(6, 5))
    im_ = ax.imshow(a, cmap="viridis", aspect="auto")
    ax.set_xlabel("Key position")
    ax.set_ylabel("Query position")
    ax.set_title(title)
    fig.colorbar(im_, ax=ax)
    return _save_or_return(fig, save_path)


def plot_metrics_comparison(
    metrics: Dict[str, Dict[str, float]],
    title: str = "Metrics",
    save_path=None,
):
    """Bar chart of noisy-vs-enhanced metric means
    (reference: utils/visualization.py:346-394). Expects
    ``{metric: {"noisy": x, "enhanced": y}}`` or flat means."""
    keys = list(metrics.keys())
    fig, ax = plt.subplots(figsize=(max(6, len(keys) * 1.2), 5))
    if keys and isinstance(next(iter(metrics.values())), dict):
        noisy = [metrics[k].get("noisy", np.nan) for k in keys]
        enh = [metrics[k].get("enhanced", np.nan) for k in keys]
        x = np.arange(len(keys))
        ax.bar(x - 0.2, noisy, width=0.4, label="noisy")
        ax.bar(x + 0.2, enh, width=0.4, label="enhanced")
        ax.legend()
    else:
        x = np.arange(len(keys))
        ax.bar(x, [float(metrics[k]) for k in keys], width=0.6)
    ax.set_xticks(np.arange(len(keys)))
    ax.set_xticklabels(keys, rotation=30, ha="right")
    ax.set_title(title)
    ax.grid(alpha=0.3, axis="y")
    return _save_or_return(fig, save_path)
