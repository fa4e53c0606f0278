"""Unit tests: config system, losses, metrics, augmentation, wav I/O,
optimizer schedules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import speech_enhancement_via_hybrid_vision_transformer_project_tpu as sevit
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
    SpecAugmentConfig,
    load_audio,
    save_wav,
    spec_augment,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.pipeline import (
    featurize_batch,
    minmax_normalize,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation import (
    metrics as M,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
    LossConfig,
    combined_loss,
    create_scheduler,
    multi_resolution_stft_loss,
    stoi_proxy_loss,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
    get_config_value,
    load_all_configs,
    set_config_value,
    validate_config,
)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


def test_config_merge_order_and_dotpath(tmp_path):
    (tmp_path / "data_config.yaml").write_text("a: 1\nshared: {x: 1, y: 1}\n")
    (tmp_path / "model_config.yaml").write_text("shared: {x: 2}\nb: 2\n")
    (tmp_path / "train_config.yaml").write_text("shared: {y: 3}\n")
    cfg = load_all_configs(tmp_path)
    assert cfg == {"a": 1, "b": 2, "shared": {"x": 2, "y": 3}}
    assert get_config_value(cfg, "shared.y") == 3
    assert get_config_value(cfg, "missing.path", "dflt") == "dflt"
    set_config_value(cfg, "new.deep.key", 7)
    assert cfg["new"]["deep"]["key"] == 7


def test_repo_config_valid():
    cfg = load_all_configs("config")
    assert validate_config(cfg) == []
    assert get_config_value(cfg, "model.transformer.embed_dim") == 512
    assert get_config_value(cfg, "audio.n_fft") == 512
    assert get_config_value(cfg, "training.loss.stoi_weight") == 0.1


def test_validate_catches_problems():
    bad = {"model": {"transformer": {"embed_dim": 100, "num_heads": 8}}}
    assert any("divisible" in p for p in validate_config(bad))


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def test_combined_loss_default_weights(rng):
    pred = jnp.asarray(rng.random((2, 9, 8, 1)), jnp.float32)
    tgt = jnp.asarray(rng.random((2, 9, 8, 1)), jnp.float32)
    total, comps = combined_loss(pred, tgt)
    l1 = float(jnp.mean(jnp.abs(pred - tgt)))
    assert comps.keys() == {"l1", "stoi", "total"}
    np.testing.assert_allclose(float(comps["l1"]), l1, rtol=1e-6)
    np.testing.assert_allclose(
        float(total), l1 + 0.1 * float(comps["stoi"]), rtol=1e-6
    )


def test_combined_loss_blended_log_l1(rng):
    """log_l1_weight ADDS a log-magnitude L1 on the raw (linear) specs —
    it must not replace the linear term (that is use_log_compression,
    the measured dead end, PERF.md #15) and must be NaN-safe on negative
    Tanh-range predictions."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        log_compress,
    )

    pred = jnp.asarray(rng.random((2, 9, 8, 1)) - 0.5, jnp.float32)  # negatives
    tgt = jnp.asarray(rng.random((2, 9, 8, 1)), jnp.float32)
    cfg = LossConfig(log_l1_weight=0.02)
    total, comps = combined_loss(pred, tgt, cfg)
    assert {"l1", "log_l1", "stoi", "total"} <= comps.keys()
    assert np.isfinite(float(total))
    expected_ll1 = float(
        jnp.mean(
            jnp.abs(log_compress(pred, cfg.log_eps) - log_compress(tgt, cfg.log_eps))
        )
    )
    np.testing.assert_allclose(float(comps["log_l1"]), expected_ll1, rtol=1e-6)
    np.testing.assert_allclose(
        float(total),
        float(comps["l1"]) + 0.02 * expected_ll1 + 0.1 * float(comps["stoi"]),
        rtol=1e-5,
    )
    # config round-trip
    cfg2 = LossConfig.from_config(
        {"training": {"loss": {"log_l1_weight": 0.05, "log_eps": 0.02}}}
    )
    assert cfg2.log_l1_weight == 0.05
    assert cfg2.log_eps == 0.02
    # the floor bounds the gradient: a near-silent target bin must not
    # dominate (PERF.md #16) — grad magnitude <= 1/log_eps
    g = jax.grad(
        lambda p: combined_loss(p, jnp.zeros_like(pred), cfg)[0]
    )(jnp.zeros_like(pred) + 1e-7)
    assert float(jnp.max(jnp.abs(g))) < 1.0 / cfg.log_eps + 1.0


def test_stoi_proxy_identical_is_zero(rng):
    x = jnp.asarray(rng.random((3, 5, 7, 1)), jnp.float32)
    assert float(stoi_proxy_loss(x, x)) < 1e-6


def test_sample_valid_excludes_padding_rows(rng):
    pred = jnp.asarray(rng.random((4, 9, 8, 1)), jnp.float32)
    tgt = jnp.asarray(rng.random((4, 9, 8, 1)), jnp.float32)
    valid = jnp.asarray([True, True, False, False])
    total_masked, _ = combined_loss(pred, tgt, sample_valid=valid)
    total_first2, _ = combined_loss(pred[:2], tgt[:2])
    np.testing.assert_allclose(
        float(total_masked), float(total_first2), rtol=1e-5
    )


def test_mrstft_loss_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    val = float(multi_resolution_stft_loss(x, x))
    assert val < 1e-3


# ---------------------------------------------------------------------------
# Schedulers
# ---------------------------------------------------------------------------


def test_cosine_schedule_ignores_warmup():
    cfg = {"training": {"num_epochs": 10,
                        "optimizer": {"lr": 1e-2},
                        "scheduler": {"name": "cosine", "min_lr": 1e-4,
                                      "warmup_epochs": 5}}}
    sched = create_scheduler(cfg)
    assert sched(0) == pytest.approx(1e-2)  # no warmup ramp (ref quirk §7.5)
    assert sched(10) == pytest.approx(1e-4)


def test_warmup_cosine_ramps():
    cfg = {"training": {"num_epochs": 10,
                        "optimizer": {"lr": 1e-2},
                        "scheduler": {"name": "warmup_cosine", "min_lr": 0.0,
                                      "warmup_epochs": 4}}}
    sched = create_scheduler(cfg)
    assert sched(0) == pytest.approx(1e-2 / 4)
    assert sched(3) == pytest.approx(1e-2)
    assert sched(10) < 1e-3


def test_plateau_reduces_on_stall():
    cfg = {"training": {"num_epochs": 50,
                        "optimizer": {"lr": 1e-2},
                        "scheduler": {"name": "plateau", "patience": 1,
                                      "factor": 0.5, "min_lr": 1e-5}}}
    sched = create_scheduler(cfg)
    lr = sched(0, 1.0)
    for e in range(1, 5):
        lr = sched(e, 1.0)  # no improvement
    assert lr < 1e-2


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_si_sdr_scale_invariant(sine_wav):
    clean, noisy, sr = sine_wav
    assert M.si_sdr(clean, clean * 3.0) > 60
    v = M.si_sdr(clean, noisy)
    assert 5 < v < 40


def test_snr_known_value(rng):
    clean = rng.standard_normal(16000)
    noise = rng.standard_normal(16000)
    noise *= np.sqrt(np.sum(clean**2) / np.sum(noise**2)) / np.sqrt(10)
    val = M.snr(clean, clean + noise)
    assert val == pytest.approx(10.0, abs=0.1)


def test_segsnr_clipped_range(sine_wav):
    clean, noisy, _ = sine_wav
    v = M.segmental_snr(clean, noisy)
    assert -10.0 <= v <= 35.0


def test_lsd_zero_for_identical(sine_wav):
    clean, noisy, _ = sine_wav
    assert M.log_spectral_distance(clean, clean) < 1e-6
    assert M.log_spectral_distance(clean, noisy) > 0.1


def test_stoi_properties(sine_wav):
    clean, _, sr = sine_wav
    rng = np.random.default_rng(1)
    assert M.stoi(clean, clean, sr) > 0.99
    light = clean + 0.02 * rng.standard_normal(len(clean)).astype(np.float32)
    heavy = clean + 1.0 * rng.standard_normal(len(clean)).astype(np.float32)
    s_light = M.stoi(clean, light, sr)
    s_heavy = M.stoi(clean, heavy, sr)
    assert s_heavy < s_light <= 1.0


def test_compute_all_metrics_has_improvements(sine_wav):
    clean, noisy, sr = sine_wav
    out = M.compute_all_metrics(clean, clean, noisy, sr, include_pesq=False)
    assert out["si_sdr_improvement"] > 0
    assert "noisy_snr" in out


def test_native_pesq_properties(sine_wav):
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.pesq_native import (  # noqa: E501
        pesq_p862,
    )

    clean, _, sr = sine_wav
    rng = np.random.default_rng(2)
    # identity maps to the MOS-LQO ceiling
    assert pesq_p862(clean, clean, sr, "wb") == pytest.approx(4.64, abs=0.05)
    # monotonic in additive-noise level, in both modes
    scores = {}
    for mode in ("wb", "nb"):
        vals = []
        for sigma in (0.01, 0.1, 0.5):
            deg = clean + sigma * rng.standard_normal(len(clean))
            vals.append(pesq_p862(clean, deg, sr, mode))
        assert vals[0] > vals[1] > vals[2], (mode, vals)
        assert all(1.0 <= v <= 5.0 for v in vals)
        scores[mode] = vals
    # amplitude-scale invariance from level alignment
    s1 = pesq_p862(clean, clean + 0.1 * rng.standard_normal(len(clean)), sr)
    s2 = pesq_p862(
        3.0 * clean, 3.0 * (clean + 0.1 * rng.standard_normal(len(clean))), sr
    )
    assert s1 == pytest.approx(s2, abs=0.25)
    # global-delay robustness (crude time alignment): a 20 ms shift must
    # stay near the ceiling (bound loosened 4.0 -> 3.9 with the round-4
    # _D_CAL=11 recalibration, which scores every residual disturbance
    # slightly lower; the property is "near-ceiling", not an exact value)
    shifted = np.concatenate([np.zeros(320, np.float32), clean])[: len(clean)]
    assert pesq_p862(clean, shifted, sr, "wb") > 3.9


def test_pesq_score_falls_back_to_native(sine_wav):
    clean, noisy, sr = sine_wav
    v = M.pesq_score(clean, noisy, sr)
    assert np.isfinite(v) and 1.0 <= v <= 5.0
    try:
        import pesq  # noqa: F401

        has_itu = True
    except ImportError:
        has_itu = False
    if not has_itu:  # native fallback in play; nan when disallowed
        assert np.isnan(M.pesq_score(clean, noisy, sr, allow_native=False))
    out = M.compute_all_metrics(clean, clean, noisy, sr, include_pesq=True)
    assert out["pesq_improvement"] > 0
    # 8 kHz resolves to narrowband instead of erroring into nan
    v8 = M.pesq_score(clean[::2].copy(), noisy[::2].copy(), 8000)
    assert np.isfinite(v8) and 1.0 <= v8 <= 5.0


def test_pesq_silence_is_nan_not_ceiling():
    """Digital silence has no active-band energy; level alignment must not
    blow it up to a near-ceiling score (ADVICE r1)."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.pesq_native import (  # noqa: E501
        pesq_p862,
    )

    z = np.zeros(16000, np.float64)
    assert np.isnan(pesq_p862(z, z, 16000, "wb"))
    assert np.isnan(pesq_p862(z, z + 1e-9, 16000, "wb"))


def test_pesq_provenance(sine_wav):
    """pesq_implementation() says which scale produced the numbers, and the
    first native-scored call warns once (ADVICE r1)."""
    import warnings as W

    impl = M.pesq_implementation()
    try:
        import pesq  # noqa: F401

        assert impl == "itu"
    except ImportError:
        assert impl == "native"
        clean, noisy, sr = sine_wav
        M._NATIVE_PESQ_WARNED = False
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            M.pesq_score(clean, noisy, sr)
            M.pesq_score(clean, noisy, sr)
        msgs = [str(r.message) for r in rec if "native P.862" in str(r.message)]
        assert len(msgs) == 1, msgs


# ---------------------------------------------------------------------------
# Augmentation + featurize
# ---------------------------------------------------------------------------


def test_spec_augment_masks_and_gain(rng):
    spec = jnp.ones((257, 100), jnp.float32)
    cfg = SpecAugmentConfig(gain_prob=0.0)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), spec, cfg))
    assert out.min() == 0.0  # some band masked
    assert (out == 0).mean() < 0.5  # but not everything
    cfg2 = SpecAugmentConfig(enabled=False, gain_prob=1.0,
                             gain_db_range=(-3.0, -3.0))
    out2 = np.asarray(spec_augment(jax.random.PRNGKey(1), spec, cfg2))
    np.testing.assert_allclose(out2, 10 ** (-3 / 20), rtol=1e-5)


def test_minmax_normalize_masked(rng):
    mag = jnp.asarray(rng.random((2, 5, 10)), jnp.float32) + 1.0
    mask = jnp.asarray(np.arange(10)[None, :] < np.asarray([[6], [10]]))
    normed, mn, mx = minmax_normalize(mag, mask)
    n = np.asarray(normed)
    assert n[0, :, :6].max() == pytest.approx(1.0, abs=1e-6)
    assert (n[0, :, 6:] == 0).all()  # masked-out region zeroed


def test_featurize_shapes(rng):
    wav = jnp.asarray(rng.standard_normal((2, 63 * 128)), jnp.float32)
    lengths = jnp.asarray([63 * 128, 4000], jnp.int32)
    feats = featurize_batch(wav, wav, lengths)
    assert feats.noisy_spec.shape == (2, 257, 64, 1)
    assert feats.frame_mask.shape == (2, 64)
    assert int(feats.frame_mask[1].sum()) == 1 + 4000 // 128
    assert float(feats.noisy_spec.max()) <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# WAV I/O
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("subtype", ["pcm16", "float32"])
def test_wav_roundtrip(tmp_path, subtype, rng):
    x = (rng.random(8000).astype(np.float32) * 1.6 - 0.8)
    p = tmp_path / f"t_{subtype}.wav"
    save_wav(p, x, 16000, subtype=subtype)
    y, sr = load_audio(p, None)
    assert sr == 16000
    tol = 1e-4 if subtype == "pcm16" else 1e-7
    np.testing.assert_allclose(y, x, atol=tol)


def test_wav_resample_on_load(tmp_path, rng):
    x = np.sin(2 * np.pi * 440 * np.arange(32000) / 32000).astype(np.float32)
    p = tmp_path / "t32k.wav"
    save_wav(p, x, 32000)
    y, sr = load_audio(p, 16000)
    assert sr == 16000
    assert abs(len(y) - 16000) <= 1


def test_wav_matches_scipy(tmp_path, rng):
    from scipy.io import wavfile

    x = (rng.random(4000) * 1.8 - 0.9).astype(np.float32)
    p = tmp_path / "ref.wav"
    wavfile.write(p, 16000, (x * 32767).astype(np.int16))
    y, sr = load_audio(p, None)
    np.testing.assert_allclose(y, (x * 32767).astype(np.int16) / 32768.0,
                               atol=1e-6)


def test_package_alias():
    import sevit_tpu

    assert sevit_tpu is sevit


def test_enhancer_int16_io_matches_float(rng):
    import jax

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
        AudioEnhancer,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        HybridViT,
    )

    model = HybridViT(
        encoder_channels=(4, 8, 16), embed_dim=32, num_heads=2, num_layers=1,
        decoder_channels=(16, 8, 4, 1), dropout=0.0, attn_dropout=0.0,
        drop_path_rate=0.0, max_patches=2000, use_pallas_attention=False,
    )
    x0 = jnp.zeros((1, 257, 64, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x0
    )
    wav = (np.clip(rng.standard_normal(6000), -3, 3) / 4).astype(np.float32)
    e32 = AudioEnhancer(model, variables, {}, buckets=(64,))
    e16 = AudioEnhancer(model, variables, {}, buckets=(64,), io_dtype="int16")
    y32 = e32.enhance(wav)
    y16 = e16.enhance(wav)
    assert y16.dtype == np.float32
    # int16 path quantizes input+output at PCM16 resolution and clips to
    # [-1, 1] (exactly what a PCM16 WAV write does to the float path)
    np.testing.assert_allclose(y16, np.clip(y32, -1.0, 1.0), atol=2e-3)


def test_metrics_logger_audio_fallback(tmp_path, rng):
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        MetricsLogger,
    )

    lg = MetricsLogger(tmp_path, "exp", use_tensorboard=False)
    wav = (0.1 * rng.standard_normal(1600)).astype(np.float32)
    lg.log_audio(3, "audio/enhanced_0", wav, 16000)
    lg.log_scalars(3, {"loss": 0.5})
    lg.close()
    wavs = list((tmp_path / "exp" / "audio").glob("*.wav"))
    assert len(wavs) == 1 and "enhanced_0" in wavs[0].name
    assert (tmp_path / "exp" / "metrics.jsonl").read_text().strip()


def test_log_compression_nan_safe(rng):
    """use_log_compression must survive negative (Tanh-range) predictions —
    the reference's log(x+eps) NaNs there (reference: losses.py:46-57)."""
    import jax
    import jax.numpy as jnp

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        LossConfig,
        combined_loss,
    )

    cfg = LossConfig(use_log_compression=True)
    pred = jnp.asarray(rng.uniform(-1, 1, (2, 257, 16, 1)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (2, 257, 16, 1)), jnp.float32)

    def f(p):
        total, _ = combined_loss(p, target, cfg)
        return total

    total, grad = jax.value_and_grad(f)(pred)
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(grad)).all()
