"""Spatial resize ops with exact torch ``F.interpolate`` semantics.

The reference model leans on two resize flavors (reference:
models/hybrid_vit.py:380-386 and :459-465 use ``bilinear,
align_corners=False``; models/components.py:144-150 uses
``nn.Upsample(mode='nearest')``). ``jax.image.resize`` is *not* a drop-in
match: it antialiases on downscale and its 'nearest' rounds differently, so
we build the interpolation as static matrices instead — a separable resize
is a pair of tiny matmuls, which is both exactly torch-equivalent and
MXU-friendly (the [out,in] operators are constants folded into the program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _linear_interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out,in] matrix applying 1-D linear interpolation with half-pixel
    centers (torch bilinear align_corners=False, antialias off)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m[np.arange(out_size), lo] += (1.0 - frac).astype(np.float32)
    m[np.arange(out_size), hi] += frac.astype(np.float32)
    return m


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch ``mode='nearest'`` source index per output position
    (floor(dst * in/out) — torch's legacy nearest, not round-half-even)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def resize_bilinear(x: Array, out_hw: tuple[int, int]) -> Array:
    """Bilinear-resize the trailing two axes of ``x [..., H, W]``.

    Exactly matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False)`` — including on *downscale*, where
    ``jax.image.resize`` would antialias (the reference does not).
    """
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        mh = jnp.asarray(_linear_interp_matrix(in_h, out_h))
        xf = jnp.einsum("oh,...hw->...ow", mh, xf)
    if in_w != out_w:
        mw = jnp.asarray(_linear_interp_matrix(in_w, out_w))
        xf = jnp.einsum("ow,...hw->...ho", mw, xf)
    return xf.astype(dt)


@functools.lru_cache(maxsize=None)
def _linear_interp_taps(
    in_size: int, out_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo, hi, frac) per output position — the two taps of the same
    half-pixel linear map ``_linear_interp_matrix`` encodes densely."""
    if in_size == 1:
        z = np.zeros(out_size, np.int64)
        return z, z, np.zeros(out_size, np.float32)
    scale = in_size / out_size
    src = np.clip(
        (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5,
        0.0,
        in_size - 1,
    )
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def resize_bilinear_taps(x: Array, out_hw: tuple[int, int]) -> Array:
    """Bilinear resize of the trailing two axes via two-tap gathers.

    Numerically equivalent to ``resize_bilinear`` (same half-pixel map,
    fp32 arithmetic, tested to 2.4e-7) but O(out·C) FLOPs instead of the
    dense ``[out, in]`` matmul per axis. MEASURED CAVEAT (r5, v5e): on
    TPU the row-gathers this lowers to are far SLOWER than the dense
    matmul despite the FLOP saving — swapping it into the fullres head's
    256->257 nudge cost ~16 ms/step at batch 32 while the dense form is
    ~25 GF ≈ 0.3 ms there. Use the dense ``resize_bilinear`` on TPU;
    this variant exists for gather-friendly backends and as the
    numerical cross-check of the dense operator."""
    out_h, out_w = out_hw
    dt = x.dtype
    xf = x.astype(jnp.float32)
    for axis, out_size in ((-2, out_h), (-1, out_w)):
        in_size = xf.shape[axis]
        if in_size == out_size:
            continue
        lo, hi, frac = _linear_interp_taps(in_size, out_size)
        a = jnp.take(xf, jnp.asarray(lo), axis=axis)
        b = jnp.take(xf, jnp.asarray(hi), axis=axis)
        shape = [1] * xf.ndim
        shape[axis] = out_size
        w = jnp.asarray(frac).reshape(shape)
        xf = (1.0 - w) * a + w * b
    return xf.astype(dt)


def upsample_nearest(x: Array, factors: tuple[int, int]) -> Array:
    """Integer nearest-neighbor upsample of the trailing two axes — the
    decoder's ``nn.Upsample(scale_factor=k, mode='nearest')``. For integer
    factors this is an exact repeat."""
    fh, fw = factors
    if fh == 1 and fw == 1:
        return x
    if fh != 1:
        x = jnp.repeat(x, fh, axis=-2)
    if fw != 1:
        x = jnp.repeat(x, fw, axis=-1)
    return x


def resize_nearest(x: Array, out_hw: tuple[int, int]) -> Array:
    """General nearest resize matching torch ``mode='nearest'``."""
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    if in_h != out_h:
        x = jnp.take(x, jnp.asarray(_nearest_index(in_h, out_h)), axis=-2)
    if in_w != out_w:
        x = jnp.take(x, jnp.asarray(_nearest_index(in_w, out_w)), axis=-1)
    return x
