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


# ---------------------------------------------------------------------------
# Fused iSTFT (synthesis): [polar recombine] + windowed iDFT + overlap-add
# ---------------------------------------------------------------------------
#
# One kernel per 128-frame block: frames = re@Wa + im@Wb (window folded into
# the inverse-DFT matrices, two MXU matmuls), then the overlap-add is done in
# VMEM by decomposing each frame into its r = n_fft/hop hop-phase chunks and
# accumulating sublane-rolled copies; the (r-1)-hop overlap into the next
# block rides a VMEM carry scratch across (sequential) grid steps. Neither
# the complex spectrum, the synthesis frames, nor the r shifted OLA copies
# ever round-trip to HBM — the XLA path materializes all three. With
# ``polar=True`` the inputs are (magnitude, phase) and the cos/sin
# recombination (reference: inference/enhancer.py:117-119) fuses in too.

_PAD = 8  # carry rows; must be >= r-1 and sublane-aligned


def _istft_kernel(a_ref, b_ref, wa_ref, wb_ref, out_ref, carry_ref,
                  *, hop, n_fft, polar):
    """a/b: [1, BLOCK, F'] (re/im, or mag/phase when polar); wa/wb:
    [F', n_fft]; out: [1, BLOCK, hop]; carry: [PAD, hop] VMEM scratch."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(1)
    r = n_fft // hop
    block = a_ref.shape[1]
    pad = carry_ref.shape[0]
    a = a_ref[0]
    b = b_ref[0]
    if polar:
        re = a * jnp.cos(b)
        im = a * jnp.sin(b)
    else:
        re, im = a, b
    frames = jnp.dot(
        re, wa_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # fp32 parity w/ librosa
    ) + jnp.dot(
        im, wb_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BLOCK, n_fft], synthesis window pre-folded into wa/wb
    # OLA: frame j's p-th hop-chunk lands at output hop-block j+p. Shift
    # each chunk down p sublanes (roll of a zero-padded copy — p < pad, so
    # nothing wraps into live rows) and accumulate.
    acc = jnp.zeros((block + pad, hop), jnp.float32)
    for p in range(r):
        chunk = jnp.pad(frames[:, p * hop:(p + 1) * hop], ((0, pad), (0, 0)))
        acc = acc + (pltpu.roll(chunk, shift=p, axis=0) if p else chunk)

    @pl.when(i == 0)
    def _():  # new batch row: no spill from a previous block
        carry_ref[:] = jnp.zeros((pad, hop), jnp.float32)

    spill_in = carry_ref[:]
    out_ref[0] = acc[:block] + jnp.pad(spill_in, ((0, block - pad), (0, 0)))
    carry_ref[:] = acc[block:]


@functools.lru_cache(maxsize=None)
def _inv_window_dft(cfg: STFTConfig):
    from .stft import _inverse_dft_mats

    a, b = _inverse_dft_mats(cfg.n_fft)  # [F, n_fft] each
    w = cfg.padded_window(np.float64)
    return (
        (a * w[None, :]).astype(np.float32),
        (b * w[None, :]).astype(np.float32),
    )


def pallas_istft(
    re: Array,
    im: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    length: int | None = None,
    polar: bool = False,
    align_lanes: bool = True,
    frame_block: int = _FRAME_BLOCK,
) -> Array:
    """Inverse STFT via the fused Pallas kernel (librosa ``istft``
    semantics: window-sum normalization, center crop, ``length`` trim —
    reference: inference/enhancer.py:122-129).

    Args:
      re, im: ``[..., F, N]`` spectrum halves — or (magnitude, phase)
        when ``polar=True``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .stft import _window_sumsquare

    n_fft, hop = cfg.n_fft, cfg.hop_length
    if n_fft % hop != 0:
        raise ValueError("pallas istft requires hop | n_fft")
    r = n_fft // hop
    pad_rows = max(_PAD, -(-(r - 1) // 8) * 8)
    lead = re.shape[:-2]
    f = cfg.num_bins
    n_frames = re.shape[-1]
    # lane-align the bin axis: 257 lanes would force a relayout on every
    # block load; zero-padding to a 128 multiple is free accuracy-wise
    # (matching zero rows in wa/wb) and keeps copies aligned
    fp = -(-f // 128) * 128 if align_lanes else f
    # frames-on-sublanes layout for the MXU matmul
    a = jnp.swapaxes(re.astype(jnp.float32), -1, -2).reshape(-1, n_frames, f)
    b = jnp.swapaxes(im.astype(jnp.float32), -1, -2).reshape(-1, n_frames, f)
    # cover the (r-1)-frame spill of the final true frame block
    n_blocks = -(-(n_frames + r - 1) // frame_block)
    n_pad = n_blocks * frame_block
    if n_pad > n_frames or fp > f:
        a = jnp.pad(a, ((0, 0), (0, n_pad - n_frames), (0, fp - f)))
        b = jnp.pad(b, ((0, 0), (0, n_pad - n_frames), (0, fp - f)))
    bsz = a.shape[0]

    wa, wb = _inv_window_dft(cfg)
    if fp > f:
        wa = np.pad(wa, ((0, fp - f), (0, 0)))
        wb = np.pad(wb, ((0, fp - f), (0, 0)))
    kernel = functools.partial(
        _istft_kernel, hop=hop, n_fft=n_fft, polar=polar
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, hop), jnp.float32),
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec((1, frame_block, fp), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, frame_block, fp), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, n_fft), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, n_fft), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, frame_block, hop), lambda bb, i: (bb, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((pad_rows, hop), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * n_pad * fp * n_fft,
            bytes_accessed=4 * (2 * bsz * n_pad * fp + 2 * fp * n_fft
                                + bsz * n_pad * hop),
            transcendentals=2 * bsz * n_pad * fp if polar else 0,
        ),
    )(a, b, jnp.asarray(wa), jnp.asarray(wb))

    y = out.reshape(bsz, n_pad * hop)
    out_len = n_fft + (n_frames - 1) * hop
    y = y[:, :out_len]
    # librosa tail: window-sum normalize, center crop, length trim
    wss = _window_sumsquare(cfg, n_frames)
    tiny = np.finfo(np.float32).tiny
    y = y / jnp.asarray(np.where(wss > tiny, wss, 1.0))
    if cfg.center:
        y = y[..., n_fft // 2:]
    if length is not None:
        y = y[..., :length]
        deficit = length - y.shape[-1]
        if deficit > 0:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, deficit)])
    elif cfg.center:
        y = y[..., : max(y.shape[-1] - n_fft // 2, 0)]
    return y.reshape(*lead, y.shape[-1])


def istft_auto(
    re: Array,
    im: Array,
    cfg: STFTConfig = STFTConfig(),
    *,
    length: int | None = None,
    method: str = "auto",
    polar: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> Array:
    """Dispatch for iSTFT method 'auto'/'pallas'.

    Measured on v5e (batch 32 x 3 s, fp32 HIGHEST): XLA matmul path
    0.95 ms vs this kernel 1.21 ms — the synthesis direction is dominated
    by the OLA/window-sum elementwise tail that XLA already fuses well, so
    unlike the forward STFT the fusion does not pay here. ``auto``
    therefore selects the XLA path; ``method='pallas'`` forces the kernel
    (PERF.md has the measurement history)."""
    from .stft import istft as _istft, polar as _polar

    if method == "pallas":
        # the kernel's in-VMEM matmuls are fixed at HIGHEST (fp32 parity)
        if cfg.n_fft % cfg.hop_length != 0:
            raise ValueError("pallas istft requires hop | n_fft")
        return pallas_istft(re, im, cfg, length=length, polar=polar)
    if polar:
        re, im = _polar(re, im)
    return _istft(re, im, cfg, length=length, method="matmul",
                  precision=precision)
