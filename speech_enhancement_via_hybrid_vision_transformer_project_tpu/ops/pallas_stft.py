"""Fused STFT as a Pallas TPU kernel.

One kernel performs frame-extraction + windowing + real DFT (+ magnitude)
for a block of 128 frames: the signal stays in VMEM, overlapped frames are
materialized *in VMEM only* via the block-phase concat trick (hop divides
n_fft), and the windowed DFT is a single [128, n_fft] x [n_fft, 2*n_bins]
MXU matmul. Compared to the XLA path (ops.stft), the 4x-amplified frame
matrix and the separate re/im intermediates never round-trip to HBM.

Used by the featurization and enhancement pipelines on TPU via
``stft(..., method='pallas')``; falls back to the XLA matmul path off-TPU
or for shapes the kernel does not cover (hop not dividing n_fft, signals
too long for VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import STFTConfig, _forward_dft_mats

Array = jax.Array

_FRAME_BLOCK = 128  # frames per grid step


def _stft_kernel(sig_ref, w_ref, out_ref, *, hop, n_fft, want_mag):
    """sig_ref [1, 1, L]; w_ref [n_fft, 2F]; out [1, BLOCK, 2F or 3F]."""
    import jax.experimental.pallas as pl

    i = pl.program_id(1)
    r = n_fft // hop
    start = i * _FRAME_BLOCK * hop
    # frames @ W decomposed by hop-phase: frame j's p-th hop-chunk is
    # signal[start+(j+p)*hop : +hop], so chunk-p of ALL frames is one
    # contiguous [BLOCK*hop] load reshaped [BLOCK, hop], matmul'd against
    # the matching W row-band and accumulated. (A concat of
    # sublane-shifted slices is not lowerable by Mosaic; a sum of r
    # aligned matmuls is — and costs identical FLOPs.)
    spec = None
    for p in range(r):
        seg = sig_ref[0, 0, pl.ds(start + p * hop, _FRAME_BLOCK * hop)]
        chunk = seg.reshape(_FRAME_BLOCK, hop)
        wband = w_ref[p * hop : (p + 1) * hop, :]
        term = jnp.dot(
            chunk,
            wband,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # fp32 parity w/ librosa
        )
        spec = term if spec is None else spec + term  # [BLOCK, 2F]
    if want_mag:
        f = spec.shape[-1] // 2
        re = spec[:, :f]
        im = spec[:, f:]
        mag = jnp.sqrt(re * re + im * im)
        out_ref[0, :, :] = jnp.concatenate([spec, mag], axis=-1)
    else:
        out_ref[0, :, :] = spec


@functools.lru_cache(maxsize=None)
def _window_dft(cfg: STFTConfig) -> np.ndarray:
    c, s = _forward_dft_mats(cfg.n_fft)
    w = cfg.padded_window(np.float64)
    return np.concatenate(
        [w[:, None] * c, w[:, None] * s], axis=1
    ).astype(np.float32)


def pallas_stft(
    x: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    return_mag: bool = False,
):
    """STFT via the fused Pallas kernel.

    Args:
      x: ``[..., L]`` real signal.
      return_mag: also fuse the magnitude computation into the kernel.

    Returns ``(re, im)`` or ``(re, im, mag)``, each ``[..., F, N]``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_fft, hop = cfg.n_fft, cfg.hop_length
    if n_fft % hop != 0:
        raise ValueError("pallas stft requires hop | n_fft")
    lead = x.shape[:-1]
    x = x.astype(jnp.float32).reshape(-1, x.shape[-1])

    # center pad + pad so every frame block reads a full span
    if cfg.center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=cfg.pad_mode)
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    n_blocks = -(-n_frames // _FRAME_BLOCK)
    r = n_fft // hop
    need = ((n_blocks * _FRAME_BLOCK) - 1 + r) * hop
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    b = x.shape[0]
    f = cfg.num_bins
    width = 3 * f if return_mag else 2 * f

    wmat = jnp.asarray(_window_dft(cfg))
    kernel = functools.partial(
        _stft_kernel, hop=hop, n_fft=n_fft, want_mag=return_mag
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, n_blocks * _FRAME_BLOCK, width), jnp.float32
        ),
        grid=(b, n_blocks),
        in_specs=[
            # [B,1,L] so the block equals the trailing array dims
            # (Mosaic requires last-two block dims (8,128)-divisible or full)
            pl.BlockSpec((1, 1, x.shape[-1]), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * f), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _FRAME_BLOCK, width), lambda bb, i: (bb, i, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_blocks * _FRAME_BLOCK * n_fft * 2 * f,
            bytes_accessed=4 * (b * x.shape[-1] + n_fft * 2 * f
                                + b * n_blocks * _FRAME_BLOCK * width),
            transcendentals=0,
        ),
    )(x[:, None, :], wmat)

    out = out[:, :n_frames, :]  # trim tail frames
    out = jnp.swapaxes(out, -1, -2).reshape(*lead, width, n_frames)
    re = out[..., :f, :]
    im = out[..., f : 2 * f, :]
    if return_mag:
        return re, im, out[..., 2 * f :, :]
    return re, im


def stft_auto(x: Array, cfg: STFTConfig = STFTConfig(), method: str = "auto"):
    """Dispatch: Pallas on TPU when applicable, else the XLA matmul path."""
    from .stft import stft as _stft

    if method == "auto":
        use = (
            jax.default_backend() == "tpu"
            and cfg.n_fft % cfg.hop_length == 0
            # VMEM budget: full signal + DFT matrix must fit comfortably
            and x.shape[-1] * 4 < 6 * 1024 * 1024
        )
        method = "pallas" if use else "matmul"
    if method == "pallas":
        return pallas_stft(x, cfg)
    return _stft(x, cfg, method=method)
