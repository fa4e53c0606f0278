"""DSP-core tests: STFT/iSTFT parity vs torch.stft (the reference's numeric
substrate — librosa and torch.stft agree for these params) and round-trip
reconstruction accuracy."""

import numpy as np
import pytest
import jax.numpy as jnp

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops import (
    STFTConfig,
    frame_signal,
    griffin_lim,
    istft,
    magphase,
    overlap_add,
    polar,
    stft,
)

CFG = STFTConfig(n_fft=512, hop_length=128, win_length=512, window="hann")


def _torch_stft(x, cfg):
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(np.asarray(x, np.float32))
    spec = torch.stft(
        xt,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length, periodic=True),
        center=cfg.center,
        pad_mode="reflect",
        return_complex=True,
    )
    return spec.numpy()


@pytest.mark.parametrize("method", ["matmul", "fft"])
@pytest.mark.parametrize("length", [16000, 16001, 24123])
def test_stft_matches_torch(method, length, rng):
    x = rng.standard_normal(length).astype(np.float32)
    re, im = stft(x, CFG, method=method)
    ref = _torch_stft(x, CFG)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3, rtol=1e-4)
    assert re.shape == (CFG.num_bins, CFG.num_frames(length))


def test_methods_agree(rng):
    x = rng.standard_normal(8000).astype(np.float32)
    r1, i1 = stft(x, CFG, method="matmul")
    r2, i2 = stft(x, CFG, method="fft")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-3)


@pytest.mark.parametrize("method", ["matmul", "fft"])
@pytest.mark.parametrize("length", [16000, 16001, 5000])
def test_roundtrip(method, length, rng):
    x = rng.standard_normal(length).astype(np.float32)
    re, im = stft(x, CFG, method=method)
    y = istft(re, im, CFG, length=length, method=method)
    assert y.shape[-1] == length
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_batched(rng):
    x = rng.standard_normal((3, 2, 4000)).astype(np.float32)
    re, im = stft(x, CFG)
    assert re.shape == (3, 2, CFG.num_bins, CFG.num_frames(4000))
    y = istft(re, im, CFG, length=4000)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)
    # batched result equals per-item result
    re0, _ = stft(x[0, 0], CFG)
    np.testing.assert_allclose(np.asarray(re[0, 0]), np.asarray(re0), atol=1e-4)


def test_frame_overlap_add_inverse(rng):
    cfg = STFTConfig(center=False)
    x = rng.standard_normal(512 + 128 * 9).astype(np.float32)
    frames = frame_signal(x, cfg)
    assert frames.shape == (10, 512)
    # direct OLA of unwindowed frames: each sample counted n_fft/hop times
    # in the fully-overlapped interior
    y = overlap_add(frames, cfg)
    interior = slice(512, len(x) - 512)
    np.testing.assert_allclose(
        np.asarray(y)[interior], 4.0 * x[interior], rtol=1e-5
    )


def test_general_hop_gather_path(rng):
    cfg = STFTConfig(n_fft=512, hop_length=100)  # hop does not divide n_fft
    x = rng.standard_normal(6000).astype(np.float32)
    re, im = stft(x, cfg)
    ref = _torch_stft(x, cfg)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3, rtol=1e-4)
    y = istft(re, im, cfg, length=6000)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_magphase_polar_roundtrip(rng):
    re = rng.standard_normal((5, 7)).astype(np.float32)
    im = rng.standard_normal((5, 7)).astype(np.float32)
    mag, ph = magphase(jnp.asarray(re), jnp.asarray(im))
    r2, i2 = polar(mag, ph)
    np.testing.assert_allclose(np.asarray(r2), re, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i2), im, atol=1e-5)


def test_griffin_lim_reduces_error(sine_wav):
    clean, _, _ = sine_wav
    x = clean[:8000]
    re, im = stft(x, CFG)
    mag, _ = magphase(re, im)
    y = griffin_lim(mag, CFG, n_iter=16, length=len(x))
    # Griffin-Lim should land near the true magnitude spectrum
    r2, i2 = stft(np.asarray(y), CFG)
    m2, _ = magphase(r2, i2)
    rel = float(
        jnp.linalg.norm(m2 - mag) / jnp.maximum(jnp.linalg.norm(mag), 1e-9)
    )
    assert rel < 0.35, rel


def test_win_shorter_than_nfft(rng):
    cfg = STFTConfig(n_fft=512, win_length=400, hop_length=128)
    x = rng.standard_normal(4000).astype(np.float32)
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(x)
    ref = torch.stft(
        xt,
        n_fft=512,
        hop_length=128,
        win_length=400,
        window=torch.hann_window(400, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    re, im = stft(x, cfg)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# Pallas fused STFT (interpret mode on CPU)
# ---------------------------------------------------------------------------


def test_pallas_stft_matches_matmul(rng):
    from jax.experimental.pallas import tpu as pltpu

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.pallas_stft import (
        pallas_stft,
    )

    x = rng.standard_normal((2, 16000)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        re_p, im_p, mag_p = pallas_stft(jnp.asarray(x), CFG, return_mag=True)
    re, im = stft(x, CFG, method="matmul")
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im), atol=2e-3)
    mag = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)
    np.testing.assert_allclose(np.asarray(mag_p), mag, atol=2e-3)
    assert re_p.shape == re.shape


def test_pallas_stft_odd_length(rng):
    from jax.experimental.pallas import tpu as pltpu

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.pallas_stft import (
        pallas_stft,
    )

    x = rng.standard_normal(5123).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        re_p, im_p = pallas_stft(jnp.asarray(x), CFG)
    re, im = stft(x, CFG, method="matmul")
    assert re_p.shape == re.shape == (CFG.num_bins, CFG.num_frames(5123))
    np.testing.assert_allclose(np.asarray(re_p), np.asarray(re), atol=2e-3)
    np.testing.assert_allclose(np.asarray(im_p), np.asarray(im), atol=2e-3)


def test_pallas_istft_matches_matmul(rng):
    """Fused iSTFT (iDFT + OLA + carry across frame blocks) == XLA path.

    48000 samples -> 376 frames: 3 grid blocks + spill, exercising the
    VMEM carry between blocks."""
    from jax.experimental.pallas import tpu as pltpu

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.pallas_stft import (
        pallas_istft,
    )

    x = rng.standard_normal((2, 48000)).astype(np.float32)
    re, im = stft(x, CFG, method="matmul")
    ref = istft(re, im, CFG, length=48000, method="matmul")
    with pltpu.force_tpu_interpret_mode():
        y = pallas_istft(re, im, CFG, length=48000)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
    # and the whole round trip reconstructs the signal
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-3)


def test_pallas_istft_polar_fusion(rng):
    """polar=True (mag/phase in, cos/sin fused in-kernel) == polar + istft."""
    from jax.experimental.pallas import tpu as pltpu

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.pallas_stft import (
        pallas_istft,
    )

    x = rng.standard_normal(16000).astype(np.float32)
    re, im = stft(x, CFG, method="matmul")
    mag, phase = magphase(re, im)
    ref = istft(*polar(mag, phase), CFG, length=16000, method="matmul")
    with pltpu.force_tpu_interpret_mode():
        y = pallas_istft(mag, phase, CFG, length=16000, polar=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_pallas_istft_no_length_and_short(rng):
    """Default-length trim semantics match; single-block input."""
    from jax.experimental.pallas import tpu as pltpu

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.pallas_stft import (
        pallas_istft,
    )

    x = rng.standard_normal(5123).astype(np.float32)
    re, im = stft(x, CFG, method="matmul")
    ref = istft(re, im, CFG, method="matmul")
    with pltpu.force_tpu_interpret_mode():
        y = pallas_istft(re, im, CFG)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
