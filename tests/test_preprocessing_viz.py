"""Tests for the host-side preprocessing chain (reference:
data/preprocessing.py:14-337, utils/audio_processing.py:135-339) and the
visualization toolkit (reference: utils/visualization.py:16-394)."""

import numpy as np
import pytest

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.preprocessing import (
    AudioPreprocessor,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.wavio import (
    load_audio,
    save_wav,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops import audio as A


# ---------------------------------------------------------------------------
# ops/audio.py
# ---------------------------------------------------------------------------


def test_pre_de_emphasis_roundtrip(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    y = A.de_emphasis(A.pre_emphasis(x, 0.97), 0.97)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_peak_normalize_hits_target(rng):
    x = (0.1 * rng.standard_normal(1000)).astype(np.float32)
    y, peak = A.peak_normalize(x, 0.95)
    assert np.isclose(np.max(np.abs(y)), 0.95, atol=1e-5)
    assert np.isclose(peak, np.max(np.abs(x)))
    # silent input: untouched, peak 0
    z, p0 = A.peak_normalize(np.zeros(100, np.float32))
    assert p0 == 0.0 and not z.any()


def test_trim_silence_db_strips_edges(rng):
    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
    x = np.concatenate([np.zeros(8000), tone, np.zeros(8000)]).astype(np.float32)
    y = A.trim_silence_db(x, top_db=30.0)
    assert len(y) < len(x)
    # the loud region survives (energy preserved within 1%)
    assert np.sum(y**2) > 0.99 * np.sum(tone**2)


def test_energy_vad_trim(rng):
    sr = 16000
    tone = 0.5 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr)
    x = np.concatenate([np.zeros(4000), tone, np.zeros(4000)]).astype(np.float32)
    y = A.energy_vad_trim(x, threshold=0.01)
    assert len(tone) <= len(y) < len(x)
    # all-silence input is returned unchanged (reference behavior)
    s = np.zeros(2000, np.float32)
    assert A.energy_vad_trim(s, 0.01) is s


def test_dynamic_range_compress():
    # -40 dB sample (below -20 dB threshold): unchanged
    # 0 dB sample (20 dB over): compressed to 20/4=5 dB over threshold
    x = np.array([0.01, 1.0, -1.0], np.float32)
    y = A.dynamic_range_compress(x, threshold_db=-20.0, ratio=4.0)
    assert np.isclose(y[0], 0.01, atol=1e-6)
    expected = 10.0 ** ((-20.0 + 20.0 / 4.0) / 20.0)
    np.testing.assert_allclose(y[1], expected, rtol=1e-5)
    np.testing.assert_allclose(y[2], -expected, rtol=1e-5)  # sign kept


def test_mix_at_snr_achieves_target(rng):
    sr = 16000
    clean = (0.5 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(
        np.float32
    )
    noise = rng.standard_normal(sr).astype(np.float32)  # shorter: gets tiled
    for target in (0.0, 10.0):
        noisy = A.mix_at_snr(clean, noise, target, rng)
        achieved = A.compute_snr_db(clean, noisy)
        assert abs(achieved - target) < 0.2


def test_compute_snr_known_value():
    clean = np.ones(1000, np.float32)
    noisy = clean + 0.1  # noise power = 1% of signal power -> 20 dB
    assert np.isclose(A.compute_snr_db(clean, noisy), 20.0, atol=1e-3)
    assert A.compute_snr_db(clean, clean) == float("inf")


def test_resample_sine_preserved(rng):
    sr, target = 16000, 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = A.resample(x, sr, target)
    assert len(y) == sr // 2
    # dominant frequency bin still 440 Hz at the new rate
    spec = np.abs(np.fft.rfft(y))
    freq = np.fft.rfftfreq(len(y), 1.0 / target)
    assert abs(freq[np.argmax(spec)] - 440.0) < 5.0
    # identity when rates match
    assert A.resample(x, sr, sr) is not x  # copies to float32
    np.testing.assert_array_equal(A.resample(x, sr, sr), x)


def test_rms_energy_constant_signal():
    x = np.full(5000, 0.5, np.float32)
    rms = A.rms_energy(x, frame_length=2048, hop_length=512)
    np.testing.assert_allclose(rms, 0.5, rtol=1e-6)


# ---------------------------------------------------------------------------
# AudioPreprocessor chain (reference: data/preprocessing.py:40-62)
# ---------------------------------------------------------------------------


def test_default_chain_is_peak_normalize_only(rng):
    x = (0.3 * rng.standard_normal(4000)).astype(np.float32)
    pre = AudioPreprocessor()  # defaults mirror data_config.yaml: all off
    y = pre.process(x)
    ref, _ = A.peak_normalize(x, 0.95)
    np.testing.assert_array_equal(y, ref)


def test_from_config_flags():
    cfg = {
        "data": {
            "sample_rate": 8000,
            "normalize_audio": False,
            "preprocessing": {"apply_pre_emphasis": True, "pre_emphasis_coef": 0.9},
        }
    }
    pre = AudioPreprocessor.from_config(cfg)
    assert pre.sample_rate == 8000
    assert pre.apply_pre_emphasis and pre.pre_emphasis_coef == 0.9
    assert not pre.normalize
    x = np.array([1.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(pre.process(x), A.pre_emphasis(x, 0.9))


def test_full_chain_order(rng):
    """pre-emphasis -> VAD -> trim -> compress -> normalize, as reference."""
    sr = 16000
    tone = (0.8 * np.sin(2 * np.pi * 250 * np.arange(sr) / sr)).astype(np.float32)
    x = np.concatenate([np.zeros(4000, np.float32), tone])
    pre = AudioPreprocessor(
        apply_pre_emphasis=True,
        apply_vad=True,
        apply_compression=True,
        normalize=True,
    )
    y = pre.process(x)
    assert len(y) < len(x)  # VAD trimmed the silence
    assert np.isclose(np.max(np.abs(y)), 0.95, atol=1e-5)  # normalized last


def test_process_file_and_directory(tmp_path, rng):
    sr = 16000
    for i in range(3):
        x = (0.2 * rng.standard_normal(sr)).astype(np.float32)
        save_wav(tmp_path / "in" / f"u{i}.wav", x, sr)
    pre = AudioPreprocessor()
    n = pre.process_directory(tmp_path / "in", tmp_path / "out")
    assert n == 3
    for i in range(3):
        y, got_sr = load_audio(tmp_path / "out" / f"u{i}.wav", sr)
        assert got_sr == sr
        assert np.max(np.abs(y)) == pytest.approx(0.95, abs=0.01)  # PCM16 quant


# ---------------------------------------------------------------------------
# Visualization smoke tests (headless Agg; files written and non-empty)
# ---------------------------------------------------------------------------


def test_visualization_suite(tmp_path, sine_wav):
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        visualization as V,
    )

    clean, noisy, sr = sine_wav
    paths = {
        "wave.png": lambda p: V.plot_waveform(noisy, sr, save_path=p),
        "spec.png": lambda p: V.plot_spectrogram(noisy, sr, save_path=p),
        "cmp.png": lambda p: V.plot_comparison(noisy, clean, clean, sr, save_path=p),
        "loss.png": lambda p: V.plot_loss_curves(
            [1.0, 0.5, 0.3], [1.1, 0.6, 0.4], save_path=p
        ),
        "attn.png": lambda p: V.plot_attention_map(
            np.random.default_rng(0).random((8, 16, 16)), head=2, save_path=p
        ),
        "metrics.png": lambda p: V.plot_metrics_comparison(
            {"pesq": {"noisy": 1.9, "enhanced": 2.8},
             "stoi": {"noisy": 0.92, "enhanced": 0.96}},
            save_path=p,
        ),
    }
    for name, fn in paths.items():
        out = tmp_path / name
        fn(out)
        assert out.exists() and out.stat().st_size > 1000, name


def test_plot_spectrogram_accepts_magnitude(tmp_path, sine_wav):
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
        magphase,
        stft,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        visualization as V,
    )

    clean, _, sr = sine_wav
    mag, _ = magphase(*stft(clean, STFTConfig()))
    out = tmp_path / "mag.png"
    V.plot_spectrogram(np.asarray(mag), sr, save_path=out)
    assert out.exists() and out.stat().st_size > 1000
