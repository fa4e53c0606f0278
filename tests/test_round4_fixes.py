"""Round-4 regression tests.

Pins the fixes for the round-3 verdict/advice findings:

* best_model must be written even when NO validation loader exists
  (reference contract: a best checkpoint always exists,
  /root/reference/training/trainer.py:314-328 — the r3
  validated-epochs guard silently dropped it for no-val runs);
* a skipped non-finite step must not leak NaNs into the per-epoch
  metric averages (the guard protects params; the logs must follow);
* ``load_model_for_inference`` must return the MERGED config so the
  caller's AudioEnhancer uses the checkpoint's feature pipeline
  (train/inference STFT mismatch otherwise);
* a corrupt/truncated ``meta.json`` must not make loadable weights
  fail at load.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
    DataLoader,
    VoiceBankDataset,
    save_wav,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    HybridViT,
    create_hybrid_vit,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
    Trainer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
    AudioEnhancer,
    load_model_for_inference,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils.checkpoint import (
    save_model_weights,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.parallel import (
    make_mesh,
)

SR = 16000
BUCKETS = (64, 96)
TINY_MODEL = dict(
    encoder_channels=(4, 8, 16),
    embed_dim=32,
    num_heads=2,
    num_layers=1,
    decoder_channels=(16, 8, 4, 1),
    dropout=0.0,
    attn_dropout=0.0,
    drop_path_rate=0.0,
    use_pallas_attention=False,
)
# same arch in config-dict form (for create_hybrid_vit from meta.json)
TINY_MODEL_CFG = {
    "encoder": {"channels": [4, 8, 16], "dropout": 0.0},
    "transformer": {
        "embed_dim": 32,
        "num_heads": 2,
        "num_layers": 1,
        "attention_dropout": 0.0,
        "drop_path_rate": 0.0,
    },
    "decoder": {"channels": [16, 8, 4, 1]},
}


def _make_dataset(root: Path, n: int = 8, seed: int = 0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        dur = int(SR * rng.uniform(0.35, 0.5))
        t = np.arange(dur) / SR
        clean = 0.5 * np.sin(2 * np.pi * rng.uniform(150, 350) * t)
        noise = 0.2 * rng.standard_normal(dur)
        save_wav(root / "clean_trainset_28spk_wav" / f"p{i:03d}.wav",
                 clean.astype(np.float32), SR)
        save_wav(root / "noisy_trainset_28spk_wav" / f"p{i:03d}.wav",
                 (clean + noise).astype(np.float32), SR)
    return root


def _config(tmp: Path, epochs: int = 2):
    return {
        "data": {"sample_rate": SR, "train_val_split": 1.0,
                 "augmentation": {"enabled": False}},
        "audio": {"n_fft": 512, "hop_length": 128, "win_length": 512},
        "training": {
            "num_epochs": epochs,
            "batch_size": 8,
            "seed": 0,
            "optimizer": {"name": "adamw", "lr": 1e-3},
            "scheduler": {"name": "none"},
            "loss": {"l1_weight": 1.0},
            "early_stopping": {"enabled": False},
            "checkpoint": {"save_dir": str(tmp / "ckpt"),
                           "save_every_n_epochs": 0},
            "logging": {"log_dir": str(tmp / "logs"),
                        "use_tensorboard": False},
        },
        "mesh": {"data_parallel": -1, "model_parallel": 1},
    }


def test_no_validation_best_model(tmp_path):
    """With val_loader=None, best_model tracks the TRAIN loss: the best
    checkpoint must exist and the reported best loss must be finite
    (round-3 regression: `best val loss inf`, best_model never saved)."""
    root = _make_dataset(tmp_path / "data")
    cfg = _config(tmp_path)
    ds = VoiceBankDataset(root, "train", cfg)
    loader = DataLoader(ds, batch_size=8, buckets=BUCKETS, seed=0,
                        num_workers=2)
    trainer = Trainer(
        HybridViT(**TINY_MODEL), cfg, loader, None, mesh=make_mesh(),
        checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs",
    )
    history = trainer.train()
    assert len(history["train_loss"]) == 2
    assert np.isfinite(trainer.best_val_loss)
    assert (tmp_path / "ckpt" / "best_model" / "state.msgpack").exists()
    meta = json.loads((tmp_path / "ckpt" / "best_model" / "meta.json").read_text())
    assert np.isfinite(meta["best_val_loss"])


def test_skipped_step_metrics_masked(tmp_path):
    """A non-finite step keeps params AND keeps the logged metrics clean:
    every metric is zero-masked and nonfinite_skipped == 1 (ADVICE r3:
    the raw NaN loss previously poisoned every per-epoch average)."""
    root = _make_dataset(tmp_path / "data")
    cfg = _config(tmp_path, epochs=1)
    ds = VoiceBankDataset(root, "train", cfg)
    loader = DataLoader(ds, batch_size=8, buckets=BUCKETS, seed=0,
                        num_workers=2)
    trainer = Trainer(
        HybridViT(**TINY_MODEL), cfg, loader, None, mesh=make_mesh(),
        checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs",
    )
    batch = next(iter(loader))
    bad = dict(batch)
    bad["noisy_audio"] = np.full_like(batch["noisy_audio"], np.nan)
    params_before = jax.device_get(trainer.state.params)
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.trainer import (
        distribute_batch,
    )
    new_state, metrics = trainer.train_step(
        trainer.state, distribute_batch(bad, trainer.mesh), trainer.rng
    )
    trainer.state = new_state
    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert host["nonfinite_skipped"] == 1.0
    for k, v in host.items():
        assert np.isfinite(v), f"metric {k} leaked a non-finite value"
        if k != "nonfinite_skipped":
            assert v == 0.0, f"metric {k} not masked on a skipped step"
    params_after = jax.device_get(new_state.params)
    leaves_b = jax.tree_util.tree_leaves(params_before)
    leaves_a = jax.tree_util.tree_leaves(params_after)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)


def test_loader_lockstep_padding_batches(tmp_path):
    """max_batches beyond the natural batch count emits all-invalid
    padding batches (multi-host lockstep: a host whose val shard is
    exhausted must keep stepping while peers score their larger shards —
    previously the tail files on larger shards were silently dropped)."""
    root = _make_dataset(tmp_path / "data", n=3)
    cfg = {"data": {"train_val_split": 1.0}}
    ds = VoiceBankDataset(root, "train", cfg)
    assert len(ds) == 3
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        buckets=BUCKETS, max_batches=3)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    # batch 0: 2 real rows; batch 1: 1 real + 1 pad; batch 2: all pad
    assert batches[0]["valid"].sum() == 2
    assert batches[1]["valid"].sum() == 1
    assert batches[2]["valid"].sum() == 0
    for b in batches:
        assert b["noisy_audio"].shape[0] == 2


def test_aggregate_by_input_snr():
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.evaluator import (
        Evaluator,
    )

    per_file = {
        "a.wav": {"noisy_snr": -2.0, "si_sdr_improvement": 5.0,
                  "lsd_improvement": 1.0},
        "b.wav": {"noisy_snr": 12.0, "si_sdr_improvement": -3.0,
                  "lsd_improvement": -0.5},
        "c.wav": {"noisy_snr": 13.0, "si_sdr_improvement": -1.0,
                  "lsd_improvement": 0.5},
        "d.wav": {"noisy_snr": 99.0, "si_sdr_improvement": 0.0},  # open bin
        "e.wav": {"noisy_snr": float("nan"), "si_sdr_improvement": 9.9},
    }
    out = Evaluator.aggregate_by_input_snr(per_file)
    assert out["[-5,0)dB"]["si_sdr_improvement"] == 5.0
    assert out["[-5,0)dB"]["count"] == 1
    assert out["[10,15)dB"]["si_sdr_improvement"] == pytest.approx(-2.0)
    assert out["[10,15)dB"]["lsd_improvement"] == pytest.approx(0.0)
    assert out[">=15dB"]["count"] == 1
    assert sum(r["count"] for r in out.values()) == 4  # nan row excluded


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Weights-only checkpoint whose meta.json carries a DIFFERENT audio
    config (hop 64) than the caller will pass (hop 128)."""
    tmp = tmp_path_factory.mktemp("ckpt")
    model = HybridViT(**TINY_MODEL)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 257, 64, 1), jnp.float32),
        train=False,
    )
    ckpt_cfg = {
        "model": TINY_MODEL_CFG,
        "audio": {"n_fft": 512, "hop_length": 64, "win_length": 512,
                  "sample_rate": SR},
    }
    path = tmp / "weights"
    save_model_weights(path, variables, config=ckpt_cfg)
    return path


def test_load_model_for_inference_returns_merged_config(tiny_ckpt):
    caller_cfg = {
        "model": TINY_MODEL_CFG,
        "audio": {"n_fft": 512, "hop_length": 128, "win_length": 512},
    }
    model, variables, merged = load_model_for_inference(tiny_ckpt, caller_cfg)
    # the checkpoint's audio section wins (trained feature pipeline)
    assert merged["audio"]["hop_length"] == 64
    enhancer = AudioEnhancer(model, variables, merged)
    assert enhancer.stft_cfg.hop_length == 64
    # the caller's ORIGINAL dict is untouched
    assert caller_cfg["audio"]["hop_length"] == 128


def test_blend_do_no_harm_knob(tiny_ckpt):
    """blend=0.0 must return (an STFT round-trip of) the noisy input —
    the identity floor; blend=1.0 is the raw model path; snr_adaptive
    stays finite and between-ish. VERDICT r3 task #4 safeguard."""
    caller_cfg = {"model": TINY_MODEL_CFG,
                  "audio": {"n_fft": 512, "hop_length": 128,
                            "win_length": 512, "sample_rate": SR}}
    model, variables, cfg = load_model_for_inference(tiny_ckpt, caller_cfg)
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * 0.4)) / SR
    noisy = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    out_identity = AudioEnhancer(model, variables, cfg, blend=0.0).enhance(noisy)
    rel = np.linalg.norm(out_identity - noisy) / np.linalg.norm(noisy)
    assert rel < 0.02, f"blend=0 should reproduce the input (rel err {rel:.4f})"

    out_model = AudioEnhancer(model, variables, cfg, blend=1.0).enhance(noisy)
    assert np.linalg.norm(out_model - noisy) / np.linalg.norm(noisy) > 0.05, (
        "random-weight model output should differ from the input"
    )

    out_auto = AudioEnhancer(
        model, variables, cfg, blend="snr_adaptive"
    ).enhance(noisy)
    assert out_auto.shape == noisy.shape and np.all(np.isfinite(out_auto))

    with pytest.raises(ValueError):
        AudioEnhancer(model, variables, cfg, blend=1.5)


def test_fold_bn_and_dft_precision(tiny_ckpt):
    """BN folding must be numerically invisible end-to-end, and the
    'high' iDFT precision knob must stay within ~PCM16-LSB error."""
    caller_cfg = {"model": TINY_MODEL_CFG,
                  "audio": {"n_fft": 512, "hop_length": 128,
                            "win_length": 512, "sample_rate": SR}}
    model, variables, cfg = load_model_for_inference(tiny_ckpt, caller_cfg)
    rng = np.random.default_rng(2)
    t = np.arange(int(SR * 0.4)) / SR
    noisy = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    base = AudioEnhancer(model, variables, cfg).enhance(noisy)
    folded = AudioEnhancer(model, variables, cfg, fold_bn=True).enhance(noisy)
    assert np.max(np.abs(folded - base)) < 1e-4

    hi = AudioEnhancer(
        model, variables, cfg, dft_precision="high"
    ).enhance(noisy)
    # ~1.5 PCM16 LSB bound (PERF.md #9); CPU backend may be exact
    assert np.max(np.abs(hi - base)) < 5e-4

    with pytest.raises(ValueError):
        AudioEnhancer(model, variables, cfg, dft_precision="bf16")


def test_mask_output_mode(tiny_ckpt):
    """model.output_mode='mask': the Tanh output becomes a [0,1] spectral
    mask on the full-resolution noisy magnitude. Properties pinned: the
    masked output can only ATTENUATE (energy <= noisy energy + STFT
    round-trip slack) even under random weights — magnitude mode has no
    such bound — and the two modes produce different outputs."""
    caller_cfg = {"model": dict(TINY_MODEL_CFG),
                  "audio": {"n_fft": 512, "hop_length": 128,
                            "win_length": 512, "sample_rate": SR}}
    model, variables, cfg = load_model_for_inference(tiny_ckpt, caller_cfg)
    rng = np.random.default_rng(1)
    t = np.arange(int(SR * 0.4)) / SR
    noisy = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    cfg_mask = dict(cfg, model=dict(cfg["model"], output_mode="mask"))
    out_mask = AudioEnhancer(model, variables, cfg_mask).enhance(noisy)
    out_mag = AudioEnhancer(model, variables, cfg).enhance(noisy)
    assert np.all(np.isfinite(out_mask))
    e_noisy = float(np.sum(noisy**2))
    assert float(np.sum(out_mask**2)) <= 1.05 * e_noisy, (
        "a [0,1] mask cannot amplify the input"
    )
    assert np.linalg.norm(out_mask - out_mag) / np.linalg.norm(noisy) > 0.01

    with pytest.raises(ValueError):
        AudioEnhancer(model, variables,
                      dict(cfg, model=dict(cfg["model"], output_mode="nope")))

    # trainer wiring: mask-mode step runs and its loss differs from
    # magnitude mode on identical weights/batch
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.trainer import (
        TrainState, make_step_fns,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
        chain_with_clip, create_optimizer,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        LossConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.augmentation import (
        SpecAugmentConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
    )
    import jax

    opt = chain_with_clip(create_optimizer({}), 1.0)

    def fresh_state():  # train_step donates its state argument
        host = jax.device_get(variables)
        return TrainState(
            params=jax.tree_util.tree_map(jnp.asarray, host["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, host.get("batch_stats", {})
            ),
            opt_state=opt.init(host["params"]),
            step=jnp.asarray(0, jnp.int32),
        )

    wav_len = 63 * 128
    batch = {
        "noisy_audio": np.tile(noisy[:wav_len], (2, 1)).astype(np.float32),
        "clean_audio": np.tile(noisy[:wav_len], (2, 1)).astype(np.float32),
        "length": np.full((2,), wav_len, np.int32),
        "valid": np.ones((2,), bool),
    }
    losses = {}
    for mode in ("magnitude", "mask"):
        step_fn, _ = make_step_fns(
            model, opt, LossConfig(), STFTConfig(), SpecAugmentConfig(),
            augment=False, output_mode=mode,
        )
        _, metrics = step_fn(fresh_state(), batch, jax.random.PRNGKey(0))
        losses[mode] = float(metrics["total"])
        assert np.isfinite(losses[mode])
    assert losses["mask"] != losses["magnitude"]


def test_corrupt_meta_json_falls_back(tiny_ckpt, tmp_path):
    broken = tmp_path / "broken"
    broken.mkdir()
    (broken / "state.msgpack").write_bytes(
        (tiny_ckpt / "state.msgpack").read_bytes()
    )
    (broken / "meta.json").write_text('{"config": {"model": ')  # truncated
    caller_cfg = {"model": TINY_MODEL_CFG, "audio": {"hop_length": 128}}
    model, variables, merged = load_model_for_inference(broken, caller_cfg)
    # fell back to the caller's config and still loaded the weights
    assert merged["audio"]["hop_length"] == 128
    out = model.apply(
        variables, jnp.zeros((1, 257, 64, 1), jnp.float32), train=False
    )
    assert np.all(np.isfinite(np.asarray(out)))
