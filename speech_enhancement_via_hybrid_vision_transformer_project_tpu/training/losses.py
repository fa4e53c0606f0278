"""Loss functions (pure jittable jnp).

TPU-native rebuild of the reference's losses (reference: training/losses.py)
as stateless functions returning ``(total, components)`` — components stay
as traced scalars (no ``.item()`` host syncs inside the step; the reference
syncs per-batch, training/losses.py:362-383).

Adds optional frame masking so padded frames can be excluded (the reference
lets padding contribute to the loss, SURVEY.md §7.8 — maskless is default
for parity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.stft import STFTConfig, stft

Array = jax.Array


def log_compress(x: Array, eps: float = 1e-8) -> Array:
    """NaN-safe log compression: ``log(|x| + eps)``.

    The reference uses ``log(x + eps)`` (reference: training/losses.py:46-57),
    which produces NaN gradients the moment the Tanh head emits a value
    below ``-eps`` — i.e. on the first real training step with
    ``use_log_compression: true`` (the flag is off in its shipped config,
    so the bug is latent there). ``|x|`` is the faithful *usable* form: a
    negative predicted "magnitude" is a phase flip at reconstruction
    (SURVEY.md §7.3), so its magnitude is what the compression should see.
    """
    return jnp.log(jnp.abs(x) + eps)


def masked_mean(err: Array, mask: Optional[Array]) -> Array:
    """Mean of err [B, F, T, C], optionally over valid frames only."""
    if mask is None:
        return jnp.mean(err)
    m = jnp.broadcast_to(mask[:, None, :, None], err.shape).astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def spectrogram_loss(
    pred: Array,
    target: Array,
    loss_type: str = "l1",
    use_log_compression: bool = False,
    frame_mask: Optional[Array] = None,
) -> Array:
    """L1 / MSE / L1+MSE on (optionally log-compressed) spectrograms
    (reference: training/losses.py:15-85)."""
    if use_log_compression:
        pred = log_compress(pred)
        target = log_compress(target)
    l1 = masked_mean(jnp.abs(pred - target), frame_mask)
    mse = masked_mean((pred - target) ** 2, frame_mask)
    if loss_type == "l1":
        return l1
    if loss_type == "mse":
        return mse
    if loss_type == "l1+mse":
        return l1 + mse
    raise ValueError(f"Unknown loss type: {loss_type}")


def stoi_proxy_loss(
    pred: Array,
    target: Array,
    frame_mask: Optional[Array] = None,
    sample_weight: Optional[Array] = None,
) -> Array:
    """1 - cosine-similarity of flattened specs, per sample, averaged —
    the reference's differentiable "STOI" proxy
    (reference: training/losses.py:88-141)."""
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    if frame_mask is not None:
        m = jnp.broadcast_to(
            frame_mask[:, None, :, None], pred.shape
        ).reshape(b, -1)
        p = jnp.where(m, p, 0.0)
        t = jnp.where(m, t, 0.0)
    # F.normalize uses eps=1e-12 clamping on the norm
    pn = p / jnp.maximum(jnp.linalg.norm(p, axis=1, keepdims=True), 1e-12)
    tn = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    corr = jnp.sum(pn * tn, axis=1)
    per_sample = 1.0 - corr
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def multi_resolution_stft_loss(
    pred_wav: Array,
    target_wav: Array,
    fft_sizes: Sequence[int] = (512, 1024, 2048),
    hop_sizes: Sequence[int] = (128, 256, 512),
    win_sizes: Sequence[int] = (512, 1024, 2048),
) -> Array:
    """Spectral-convergence + log-magnitude L1 over several resolutions on
    waveforms (reference: training/losses.py:144-252 — defined but unused by
    the reference trainer; available here for waveform fine-tuning).

    Note: the reference calls torch.stft with default center=True and a
    *symmetric-by-default? no — torch.hann_window(periodic=True)* window; we
    match that (periodic hann, center reflect pad).
    """
    total = jnp.float32(0.0)
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_sizes):
        cfg = STFTConfig(n_fft=n_fft, hop_length=hop, win_length=win)
        re_p, im_p = stft(pred_wav, cfg)
        re_t, im_t = stft(target_wav, cfg)
        mp = jnp.sqrt(re_p**2 + im_p**2 + 1e-12)
        mt = jnp.sqrt(re_t**2 + im_t**2 + 1e-12)
        sc = jnp.linalg.norm((mt - mp).reshape(-1)) / jnp.maximum(
            jnp.linalg.norm(mt.reshape(-1)), 1e-12
        )
        log_l1 = jnp.mean(jnp.abs(jnp.log(mp + 1e-5) - jnp.log(mt + 1e-5)))
        total = total + sc + log_l1
    return total / len(fft_sizes)


def perceptual_loss(pred: Array, target: Array) -> Array:
    """Placeholder perceptual loss == L1 (reference:
    training/losses.py:255-283 is explicitly a placeholder)."""
    return jnp.mean(jnp.abs(pred - target))


@dataclass(frozen=True)
class LossConfig:
    l1_weight: float = 1.0
    mse_weight: float = 0.0
    stoi_weight: float = 0.1
    perceptual_weight: float = 0.0
    # Blended log-magnitude L1 term ADDED to the linear losses (no
    # reference counterpart). Distinct from ``use_log_compression``,
    # which REPLACES the linear domain entirely and is a measured dead
    # end (PERF.md #15: -31 dB SI-SDR as sole loss). A small blended
    # weight keeps the linear term in charge of signal fidelity while
    # constraining the near-silent bins that drive LSD.
    # ``log_eps`` is the log floor: d/dx log(|x|+eps) = 1/(|x|+eps), so
    # eps bounds the gradient a near-silent bin can draw. The default
    # 1e-2 is the measured working point (PERF.md #16): at eps 1e-8
    # even a 0.02 blend destroys SI-SDR (-9.9 dB); at eps 1e-2 a 0.05
    # blend turns the LSD regression positive (+1.4) while keeping
    # ~1.9 dB SI-SDR gain.
    log_l1_weight: float = 0.0
    log_eps: float = 1e-2
    use_log_compression: bool = False
    use_frame_mask: bool = False
    # Time-domain SI-SDR term (round-5 framework extension, no reference
    # counterpart): the train step reconstructs the estimated waveform
    # (predicted magnitude + noisy phase, the exact inference pipeline)
    # inside the jitted program and ADDS -w * mean SI-SDR(dB) to the
    # loss — directly optimizing the benchmark metric the magnitude L1
    # only proxies. Applied in training/trainer.py:make_step_fns (needs
    # phase + waveforms, which combined_loss never sees). 0 = off
    # (reference loss parity).
    si_sdr_weight: float = 0.0

    @classmethod
    def from_config(cls, config: dict) -> "LossConfig":
        lc = config.get("training", config).get("loss", {})
        return cls(
            l1_weight=lc.get("l1_weight", 1.0),
            mse_weight=lc.get("mse_weight", 0.0),
            stoi_weight=lc.get("stoi_weight", 0.1),
            perceptual_weight=lc.get("perceptual_weight", 0.0),
            log_l1_weight=lc.get("log_l1_weight", 0.0),
            log_eps=lc.get("log_eps", 1e-2),
            use_log_compression=lc.get("use_log_compression", False),
            use_frame_mask=lc.get("use_frame_mask", False),
            si_sdr_weight=lc.get("si_sdr_weight", 0.0),
        )


def batch_si_sdr_db(
    ref: Array, est: Array, valid: Optional[Array] = None
) -> Array:
    """Differentiable mean SI-SDR (dB) over valid batch rows.

    Same definition as evaluation.metrics.si_sdr (zero-mean, scale-
    invariant projection, 10*log10 power ratio; reference:
    evaluation/metrics.py:100-145) but in jax and batched, with eps
    floors so silent/degenerate rows produce a large-negative finite
    value instead of NaN (the non-finite-update guard would otherwise
    discard the step)."""
    ref = ref.astype(jnp.float32)
    est = est.astype(jnp.float32)
    ref = ref - ref.mean(axis=-1, keepdims=True)
    est = est - est.mean(axis=-1, keepdims=True)
    ref_energy = jnp.maximum((ref * ref).sum(axis=-1), 1e-8)
    alpha = (ref * est).sum(axis=-1) / ref_energy
    proj = alpha[:, None] * ref
    noise = est - proj
    ratio = (proj * proj).sum(axis=-1) / jnp.maximum(
        (noise * noise).sum(axis=-1), 1e-8
    )
    si = 10.0 * jnp.log10(jnp.maximum(ratio, 1e-8))
    if valid is None:
        return si.mean()
    w = valid.astype(jnp.float32)
    return (si * w).sum() / jnp.maximum(w.sum(), 1.0)


def combined_loss(
    pred: Array,
    target: Array,
    cfg: LossConfig = LossConfig(),
    frame_mask: Optional[Array] = None,
    sample_valid: Optional[Array] = None,
) -> tuple[Array, Dict[str, Array]]:
    """Weighted sum of the enabled losses, with per-component breakdown
    (reference: training/losses.py:286-387; default weights L1=1.0,
    STOI=0.1 from train_config.yaml:44-52).

    ``sample_valid [B]`` excludes batch-padding rows (our loader pads
    batches to a static size for jit; the reference has no such rows, so
    excluding them is the faithful equivalent, not a behavior change).
    """
    mask = frame_mask if cfg.use_frame_mask else None
    if sample_valid is not None:
        row = sample_valid[:, None]
        if mask is None:
            mask = jnp.broadcast_to(row, (pred.shape[0], pred.shape[2]))
        else:
            mask = mask & row
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if cfg.use_log_compression:
        pred_in = log_compress(pred)
        target_in = log_compress(target)
    else:
        pred_in, target_in = pred, target

    components: Dict[str, Array] = {}
    total = jnp.float32(0.0)
    if cfg.l1_weight > 0:
        l1 = masked_mean(jnp.abs(pred_in - target_in), mask)
        components["l1"] = l1
        total = total + cfg.l1_weight * l1
    if cfg.mse_weight > 0:
        mse = masked_mean((pred_in - target_in) ** 2, mask)
        components["mse"] = mse
        total = total + cfg.mse_weight * mse
    if cfg.log_l1_weight > 0:
        ll1 = masked_mean(
            jnp.abs(
                log_compress(pred, cfg.log_eps) - log_compress(target, cfg.log_eps)
            ),
            mask,
        )
        components["log_l1"] = ll1
        total = total + cfg.log_l1_weight * ll1
    if cfg.stoi_weight > 0:
        st = stoi_proxy_loss(pred, target, mask, sample_weight=sample_valid)
        components["stoi"] = st
        total = total + cfg.stoi_weight * st
    if cfg.perceptual_weight > 0:
        pc = perceptual_loss(pred, target)
        components["perceptual"] = pc
        total = total + cfg.perceptual_weight * pc
    components["total"] = total
    return total, components


def create_loss_function(config: dict):
    """Factory mirroring the reference (training/losses.py:390-408):
    returns ``loss_fn(pred, target, frame_mask=None) -> (total, dict)``."""
    cfg = LossConfig.from_config(config)

    def loss_fn(pred, target, frame_mask=None, sample_valid=None):
        return combined_loss(pred, target, cfg, frame_mask, sample_valid)

    loss_fn.config = cfg
    return loss_fn
