"""Spectrogram + audio augmentation.

TPU-native re-design of the reference's augmenters (reference:
data/augmentation.py). The reference runs SpecAugment per-item in numpy on
DataLoader workers; here the spectrogram augmentations are **jittable
jax functions** applied on-device inside the train step (masks built from
``broadcasted_iota`` comparisons — no dynamic shapes), batched via vmap
with per-example PRNG keys. Augmentation hits the *noisy* input only,
never the clean target (SURVEY.md §7.6).

Waveform-domain augmenters (time-stretch / pitch-shift / reverb — disabled
by default in the reference's config) stay host-side numpy.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class SpecAugmentConfig:
    """(reference: config/data_config.yaml augmentation.* defaults)"""

    freq_mask_num: int = 2
    freq_mask_width: int = 15
    time_mask_num: int = 2
    time_mask_width: int = 30
    gain_prob: float = 0.5
    gain_db_range: tuple[float, float] = (-3.0, 3.0)
    enabled: bool = True
    gain_enabled: bool = True


def _band_mask(key: Array, size: int, max_width: int) -> Array:
    """Boolean [size] vector masking one random band of width U[0,max_width]."""
    kw, ks = jax.random.split(key)
    width = jax.random.randint(kw, (), 0, max_width + 1)
    start = jax.random.randint(ks, (), 0, jnp.maximum(size - width, 1))
    idx = jnp.arange(size)
    return (idx >= start) & (idx < start + width)


def spec_augment(
    key: Array, spec: Array, cfg: SpecAugmentConfig = SpecAugmentConfig()
) -> Array:
    """Apply SpecAugment + random gain to one spectrogram ``[F, T]``
    (reference: data/augmentation.py:48-118)."""
    f, t = spec.shape
    keys = jax.random.split(key, cfg.freq_mask_num + cfg.time_mask_num + 2)
    out = spec
    if cfg.enabled:
        for i in range(cfg.freq_mask_num):
            m = _band_mask(keys[i], f, cfg.freq_mask_width)
            out = jnp.where(m[:, None], 0.0, out)
        for i in range(cfg.time_mask_num):
            m = _band_mask(keys[cfg.freq_mask_num + i], t, cfg.time_mask_width)
            out = jnp.where(m[None, :], 0.0, out)
    if cfg.gain_enabled:
        kp, kg = keys[-2], keys[-1]
        apply = jax.random.uniform(kp) < cfg.gain_prob
        db = jax.random.uniform(
            kg, (), minval=cfg.gain_db_range[0], maxval=cfg.gain_db_range[1]
        )
        gain = jnp.where(apply, 10.0 ** (db / 20.0), 1.0)
        out = out * gain
    return out.astype(spec.dtype)


def spec_augment_batch(
    key: Array, specs: Array, cfg: SpecAugmentConfig = SpecAugmentConfig()
) -> Array:
    """vmapped SpecAugment over ``[B, F, T]`` with per-example keys."""
    keys = jax.random.split(key, specs.shape[0])
    return jax.vmap(lambda k, s: spec_augment(k, s, cfg))(keys, specs)


class SpectrogramAugmenter:
    """Object wrapper mirroring the reference class surface
    (reference: data/augmentation.py:14-118)."""

    def __init__(self, config: dict | None = None):
        aug = (config or {}).get("augmentation", {})
        sa = aug.get("spec_augment", {})
        rg = aug.get("random_gain", {})
        self.cfg = SpecAugmentConfig(
            freq_mask_num=sa.get("freq_mask_num", 2),
            freq_mask_width=sa.get("freq_mask_width", 15),
            time_mask_num=sa.get("time_mask_num", 2),
            time_mask_width=sa.get("time_mask_width", 30),
            gain_prob=rg.get("probability", 0.5),
            gain_db_range=tuple(rg.get("gain_db_range", (-3.0, 3.0))),
            enabled=sa.get("enabled", True) and aug.get("enabled", True),
            gain_enabled=rg.get("enabled", True) and aug.get("enabled", True),
        )

    def augment(self, key: Array, spec: Array) -> Array:
        return spec_augment(key, spec, self.cfg)

    def augment_batch(self, key: Array, specs: Array) -> Array:
        return spec_augment_batch(key, specs, self.cfg)


# ---------------------------------------------------------------------------
# Waveform-domain augmenters (host-side; disabled by default in config —
# reference: data/augmentation.py:229-302, unused in the main path)
# ---------------------------------------------------------------------------


class AudioAugmenter:
    def __init__(
        self,
        sample_rate: int = 16000,
        rng: np.random.Generator | None = None,
    ):
        self.sample_rate = sample_rate
        self.rng = rng or np.random.default_rng()

    def time_stretch(self, x: np.ndarray, rate: float) -> np.ndarray:
        """Resample-based stretch (changes duration AND pitch; the reference
        uses librosa's phase-vocoder — for the default-off path this
        polyphase approximation is the TPU-host equivalent)."""
        from ..ops.audio import resample

        stretched = resample(
            x, int(self.sample_rate * rate), self.sample_rate
        )
        return stretched.astype(np.float32)

    def pitch_shift(self, x: np.ndarray, n_steps: float) -> np.ndarray:
        """Shift pitch by resample-then-stretch back to length."""
        from ..ops.audio import resample

        factor = 2.0 ** (n_steps / 12.0)
        shifted = resample(x, int(self.sample_rate * factor), self.sample_rate)
        if len(shifted) >= len(x):
            return shifted[: len(x)].astype(np.float32)
        return np.pad(shifted, (0, len(x) - len(shifted))).astype(np.float32)

    def add_reverb(
        self, x: np.ndarray, delay_ms: float = 50.0, decay: float = 0.3
    ) -> np.ndarray:
        """Comb-filter reverb (reference: data/augmentation.py:261-302)."""
        d = int(self.sample_rate * delay_ms / 1000.0)
        out = x.copy().astype(np.float32)
        if d < len(x):
            out[d:] += decay * x[:-d]
        peak = np.max(np.abs(out))
        if peak > 1.0:
            out /= peak
        return out
