"""On-device featurization: waveform batch -> normalized spectrogram batch.

This is where the reference's per-item CPU work (librosa STFT + min-max
normalize + SpecAugment, reference: data/dataset.py:169-287) moves onto the
TPU: one jitted function turns a padded waveform batch into model inputs,
with the DFT on the MXU and augmentation via on-device PRNG. Called from
inside the train/eval step so XLA fuses it with the model forward.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.stft import STFTConfig, magphase, stft
from .augmentation import SpecAugmentConfig, spec_augment_batch

Array = jax.Array


class FeaturizedBatch(NamedTuple):
    noisy_spec: Array  # [B, F, T, 1] normalized magnitudes
    clean_spec: Array  # [B, F, T, 1]
    noisy_phase: Array  # [B, F, T]
    frame_mask: Array  # [B, T] True on frames from real audio
    noisy_min: Array  # [B] per-utterance stats for denormalization
    noisy_max: Array  # [B]
    clean_min: Array  # [B]
    clean_max: Array  # [B]
    # mask-head training pair (model.output_mode: "mask"): both raw
    # magnitudes on a SHARED per-utterance scale (noisy max), so
    # pred = mask * noisy_over_max compares directly against
    # clean_over_max. Un-augmented: the mask multiplies the physical
    # mixture, not the SpecAugment-ed model input.
    noisy_over_max: Array  # [B, F, T] noisy_mag / noisy_max
    clean_over_max: Array  # [B, F, T] clean_mag / noisy_max


def int16_to_float(x: Array) -> Array:
    """PCM16 loader batches (transfer_dtype='int16') -> the float path's
    exact values; float input passes through as float32."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x.astype(jnp.float32)


def minmax_normalize(
    mag: Array, frame_mask: Optional[Array] = None
) -> tuple[Array, Array, Array]:
    """Per-utterance min-max to [0,1] over valid frames
    (reference: data/dataset.py:198-227). mag: [B, F, T]."""
    if frame_mask is None:
        mn = jnp.min(mag, axis=(1, 2))
        mx = jnp.max(mag, axis=(1, 2))
    else:
        m = frame_mask[:, None, :]
        big = jnp.float32(jnp.finfo(jnp.float32).max)
        mn = jnp.min(jnp.where(m, mag, big), axis=(1, 2))
        mx = jnp.max(jnp.where(m, mag, -big), axis=(1, 2))
    denom = jnp.maximum(mx - mn, 1e-8)
    normed = (mag - mn[:, None, None]) / denom[:, None, None]
    if frame_mask is not None:
        normed = jnp.where(frame_mask[:, None, :], normed, 0.0)
    return normed, mn, mx


def featurize_batch(
    noisy_audio: Array,
    clean_audio: Array,
    lengths: Array,
    stft_config: STFTConfig = STFTConfig(),
    *,
    augment_key: Optional[Array] = None,
    augment_config: SpecAugmentConfig = SpecAugmentConfig(),
    stft_method: str = "matmul",
    mask_stats: bool = True,
) -> FeaturizedBatch:
    """Waveforms [B, L] + lengths -> normalized spec batch (jit-friendly).

    ``mask_stats``: compute min/max over the utterance's own frames only —
    the faithful equivalent of the reference normalizing before padding.

    int16 batches (loader ``transfer_dtype='int16'``, round 5) are PCM16
    shipped at half the host->device cost and rescaled to the float path's
    exact values here, on device.
    """
    noisy_audio = int16_to_float(noisy_audio)
    clean_audio = int16_to_float(clean_audio)
    re_n, im_n = stft(noisy_audio, stft_config, method=stft_method)
    re_c, im_c = stft(clean_audio, stft_config, method=stft_method)
    noisy_mag, noisy_phase = magphase(re_n, im_n)
    clean_mag, _ = magphase(re_c, im_c)

    t = noisy_mag.shape[-1]
    n_valid = 1 + lengths // stft_config.hop_length  # center=True frame count
    frame_mask = jnp.arange(t)[None, :] < n_valid[:, None]

    stats_mask = frame_mask if mask_stats else None
    noisy_n, n_min, n_max = minmax_normalize(noisy_mag, stats_mask)
    clean_n, c_min, c_max = minmax_normalize(clean_mag, stats_mask)

    if augment_key is not None:
        noisy_n = spec_augment_batch(augment_key, noisy_n, augment_config)

    inv_nmax = 1.0 / jnp.maximum(n_max, 1e-8)[:, None, None]
    return FeaturizedBatch(
        noisy_spec=noisy_n[..., None],
        clean_spec=clean_n[..., None],
        noisy_phase=noisy_phase,
        frame_mask=frame_mask,
        noisy_min=n_min,
        noisy_max=n_max,
        clean_min=c_min,
        clean_max=c_max,
        noisy_over_max=noisy_mag * inv_nmax,
        clean_over_max=clean_mag * inv_nmax,
    )
