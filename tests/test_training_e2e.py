"""End-to-end: synthetic VoiceBank-style dataset -> bucketed loader ->
SPMD Trainer (8-device CPU mesh) -> loss decreases -> checkpoint/resume ->
enhancement -> metric sanity. This is SURVEY.md §4's test-pyramid apex."""

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
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
    Trainer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
    AudioEnhancer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation import (
    Evaluator,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.parallel import (
    make_mesh,
)

SR = 16000
TINY_MODEL = dict(
    encoder_channels=(4, 8, 16),
    embed_dim=32,
    num_heads=2,
    num_layers=1,
    decoder_channels=(16, 8, 4, 1),
    dropout=0.0,
    attn_dropout=0.0,
    drop_path_rate=0.0,
    max_patches=2000,
    use_pallas_attention=False,
)
BUCKETS = (64, 96)


def _make_dataset(root: Path, n: int = 16, seed: int = 0):
    rng = np.random.default_rng(seed)
    clean_dir = root / "clean_trainset_28spk_wav"
    noisy_dir = root / "noisy_trainset_28spk_wav"
    for i in range(n):
        dur = int(SR * rng.uniform(0.35, 0.6))
        t = np.arange(dur) / SR
        f0 = rng.uniform(150, 350)
        clean = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(
            2 * np.pi * 2 * f0 * t
        )
        noise = 0.2 * rng.standard_normal(dur)
        save_wav(clean_dir / f"p{i:03d}_001.wav", clean.astype(np.float32), SR)
        save_wav(
            noisy_dir / f"p{i:03d}_001.wav", (clean + noise).astype(np.float32), SR
        )
    # test set mirrors train set
    (root / "clean_testset_wav").mkdir(exist_ok=True)
    (root / "noisy_testset_wav").mkdir(exist_ok=True)
    for f in clean_dir.glob("*.wav"):
        (root / "clean_testset_wav" / f.name).write_bytes(f.read_bytes())
    for f in noisy_dir.glob("*.wav"):
        (root / "noisy_testset_wav" / f.name).write_bytes(f.read_bytes())
    return root


def _config(tmp: Path):
    return {
        "data": {
            "sample_rate": SR,
            "train_val_split": 0.75,
            "augmentation": {
                "enabled": True,
                "spec_augment": {"enabled": True, "freq_mask_width": 5,
                                 "time_mask_width": 5},
                "random_gain": {"enabled": True},
            },
        },
        "audio": {"n_fft": 512, "hop_length": 128, "win_length": 512},
        "training": {
            "num_epochs": 2,
            "batch_size": 8,
            "seed": 0,
            "gradient_clip_max_norm": 1.0,
            "optimizer": {"name": "adamw", "lr": 3e-3},
            "scheduler": {"name": "cosine", "min_lr": 1e-4},
            "loss": {"l1_weight": 1.0, "stoi_weight": 0.1},
            "early_stopping": {"enabled": False},
            "checkpoint": {"save_dir": str(tmp / "ckpt"), "save_every_n_epochs": 0},
            "logging": {"log_dir": str(tmp / "logs"), "use_tensorboard": False},
        },
        "mesh": {"data_parallel": -1, "model_parallel": 1},
    }


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voicebank")
    return _make_dataset(root)


def test_loader_shapes(synth_root):
    ds = VoiceBankDataset(synth_root, "train", {"data": {"train_val_split": 0.75}})
    assert len(ds) == 12
    loader = DataLoader(ds, batch_size=4, buckets=BUCKETS, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["noisy_audio"].shape == b["clean_audio"].shape
        frames = 1 + b["noisy_audio"].shape[1] // 128
        assert frames in BUCKETS
        assert b["valid"].sum() == 4


def test_train_loss_decreases_and_resume(synth_root, tmp_path):
    cfg = _config(tmp_path)
    train_ds = VoiceBankDataset(synth_root, "train", cfg)
    val_ds = VoiceBankDataset(synth_root, "val", cfg)
    train_loader = DataLoader(
        train_ds, batch_size=8, buckets=BUCKETS, seed=0, num_workers=2
    )
    val_loader = DataLoader(
        val_ds, batch_size=8, buckets=BUCKETS, shuffle=False, num_workers=2
    )
    model = HybridViT(**TINY_MODEL)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    trainer = Trainer(
        model, cfg, train_loader, val_loader, mesh=mesh,
        checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs",
    )
    history = trainer.train()
    assert len(history["train_loss"]) == 2
    assert history["train_loss"][1] < history["train_loss"][0]
    assert (tmp_path / "ckpt" / "final_model" / "state.msgpack").exists()

    # the cosine schedule must actually reach the optimizer state
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
        get_learning_rate,
    )

    final_lr = get_learning_rate(trainer.state.opt_state)
    assert final_lr == pytest.approx(1e-4, rel=1e-3)  # min_lr after 2/2 epochs

    # metrics were logged
    logfiles = list((tmp_path / "logs").glob("**/metrics.jsonl"))
    assert logfiles and logfiles[0].read_text().strip()

    # ---- resume restores loop position ----
    trainer2 = Trainer(
        model, cfg, train_loader, val_loader, mesh=mesh,
        checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs2",
        resume_from=tmp_path / "ckpt" / "final_model",
    )
    assert trainer2.current_epoch == 2
    s1 = int(jax.device_get(trainer.state.step))
    s2 = int(jax.device_get(trainer2.state.step))
    assert s1 == s2

    # ---- enhance with the trained weights ----
    variables = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    }
    enhancer = AudioEnhancer(model, variables, cfg, buckets=BUCKETS)
    noisy, clean = train_ds.load_pair(0)
    enhanced = enhancer.enhance(noisy)
    assert enhanced.shape == noisy.shape
    assert np.all(np.isfinite(enhanced))

    # ---- evaluator over the synthetic test set ----
    ev = Evaluator(enhancer, SR, include_pesq=False)
    results = ev.evaluate_dataset(
        synth_root / "noisy_testset_wav",
        synth_root / "clean_testset_wav",
        batch_size=8,
        max_files=4,
        progress=False,
    )
    summary = results["summary"]
    assert summary["si_sdr"]["count"] == 4
    out = Evaluator.save_results(results["summary"], tmp_path / "results.json")
    assert json.loads(out.read_text())["si_sdr"]["mean"] is not None
    report = Evaluator.format_report(results)
    assert "si_sdr" in report


def test_val_every_cannot_overwrite_best_on_nonval_epoch(synth_root, tmp_path):
    """With val_every_n_epochs=2, a shrinking *train* loss on a non-val
    epoch must never overwrite best_model, reset patience, or feed the
    plateau scheduler (round-2 verdict: trainer.py best/early-stop
    bookkeeping under val_every > 1)."""
    cfg = _config(tmp_path)
    cfg["training"]["num_epochs"] = 4
    cfg["training"]["validation"] = {"val_every_n_epochs": 2}
    train_ds = VoiceBankDataset(synth_root, "train", cfg)
    val_ds = VoiceBankDataset(synth_root, "val", cfg)
    train_loader = DataLoader(train_ds, batch_size=8, buckets=BUCKETS, seed=0)
    val_loader = DataLoader(val_ds, batch_size=8, buckets=BUCKETS, shuffle=False)
    trainer = Trainer(
        HybridViT(**TINY_MODEL), cfg, train_loader, val_loader,
        mesh=make_mesh(),
        checkpoint_dir=tmp_path / "ckpt", log_dir=tmp_path / "logs",
    )

    # stub the heavy per-epoch work: train loss shrinks fast, val loss is
    # constant at 0.5 — on the old code, epoch 3's train loss (0.05) beat
    # best_val_loss and silently replaced best_model
    train_losses = {0: 1.0, 1: 0.8, 2: 0.1, 3: 0.05}
    trainer.train_epoch = lambda epoch: {"total": train_losses[epoch]}
    val_calls = []

    def fake_validate():
        val_calls.append(trainer.current_epoch)
        return {"total": 0.5}

    trainer.validate = fake_validate
    saves = []
    real_save = trainer.save
    trainer.save = lambda path, epoch: saves.append((Path(path).name, epoch)) or real_save(path, epoch)
    trainer._log_audio_samples = lambda epoch: None

    trainer.train()

    assert len(val_calls) == 2  # epochs 1 and 3 only
    best_saves = [(n, e) for n, e in saves if n == "best_model"]
    # best_model written exactly once, on the first validated epoch; the
    # shrinking train losses of epochs 2 (0.1) and 3 (0.05) never beat it
    assert best_saves == [("best_model", 1)], saves
    assert trainer.best_val_loss == pytest.approx(0.5)
    # patience counted only the one validated non-improving epoch (epoch 3)
    assert trainer.epochs_no_improve == 1


def test_streaming_matches_batch_roughly(synth_root):
    model = HybridViT(**TINY_MODEL)
    x = jnp.zeros((1, 257, 64, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    enhancer = AudioEnhancer(model, variables, {}, buckets=(64, 128, 256))
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(SR * 3).astype(np.float32) * 0.1
    full = enhancer.enhance(wav)
    stream = enhancer.enhance_streaming(
        wav, chunk_seconds=1.0, overlap_seconds=0.2
    )
    assert stream.shape == wav.shape
    assert np.all(np.isfinite(stream))
    # untrained net output differs at chunk boundaries; just sanity-check scale
    assert np.abs(stream).max() < 10 * max(np.abs(full).max(), 1e-3)


def test_masked_training_step(synth_root, tmp_path):
    """training.mask_padding=True must exclude bucket-padding patches from
    attention in the jitted train/eval steps — masked and unmasked steps
    produce different losses on a padded batch, and the masked step still
    yields finite loss/grads with the factored-2d positional embedding."""
    import optax

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.pipeline import (
        SpecAugmentConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
        TrainState,
        make_step_fns,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        LossConfig,
    )

    model = HybridViT(
        embed_dim=64, num_heads=4, num_layers=2,
        encoder_channels=(8, 16, 32), decoder_channels=(32, 16, 8, 1),
        pos_embed_type="factored_2d",
    )
    rng = np.random.default_rng(0)
    n = 40 * 128  # 41 valid frames, padded to the 64-frame bucket
    pad = 63 * 128
    noisy = np.zeros((2, pad), np.float32)
    clean = np.zeros((2, pad), np.float32)
    noisy[:, :n] = rng.standard_normal((2, n)).astype(np.float32) * 0.3
    clean[:, :n] = noisy[:, :n] * 0.8
    batch = {
        "noisy_audio": jnp.asarray(noisy),
        "clean_audio": jnp.asarray(clean),
        "length": jnp.asarray([n, n], jnp.int32),
        "valid": jnp.asarray([True, True]),
    }

    stft_cfg = STFTConfig()
    feats_shape = (2, 257, 64, 1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros(feats_shape, jnp.float32), train=False,
    )
    opt = optax.adamw(1e-3)
    losses = {}
    for masked in (False, True):
        train_step, eval_step = make_step_fns(
            model, opt, LossConfig(), stft_cfg, SpecAugmentConfig(),
            augment=False, use_attention_mask=masked,
        )
        # fresh buffers each round: train_step donates its state argument
        params = jax.tree.map(jnp.copy, variables["params"])
        state = TrainState(
            params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        new_state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["total"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        ev = eval_step(new_state, batch)
        assert np.isfinite(float(ev["total"]))
        losses[masked] = float(metrics["total"])
    # padding patches attend in one and not the other -> losses differ
    assert losses[False] != losses[True], losses


def test_evaluator_windowed_memory_bound(synth_root, tmp_path):
    """evaluate_dataset must hold at most one window of audio pairs in
    host memory (round-2 verdict weak #5: the old code loaded the whole
    dataset up front), while scoring every file exactly once with results
    identical to the per-file path."""
    model = HybridViT(**TINY_MODEL)
    x = jnp.zeros((1, 257, 64, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    enhancer = AudioEnhancer(model, variables, {}, buckets=BUCKETS)
    ev = Evaluator(enhancer, SR, include_pesq=False)
    results = ev.evaluate_dataset(
        synth_root / "noisy_testset_wav",
        synth_root / "clean_testset_wav",
        batch_size=4,
        window_batches=2,
        progress=False,
    )
    n_files = len(list((synth_root / "noisy_testset_wav").glob("*.wav")))
    assert len(results["per_file"]) == n_files == 16
    # peak = 2 wavs (noisy+clean) per file in one 8-file window
    assert ev.last_peak_files_in_memory <= 2 * 2 * 4

    # windowed result == direct single-pair result (same bucket path)
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
        load_audio,
    )

    name = sorted(results["per_file"])[0]
    noisy = load_audio(synth_root / "noisy_testset_wav" / name, SR)[0]
    clean = load_audio(synth_root / "clean_testset_wav" / name, SR)[0]
    direct = ev.evaluate_pair(noisy, clean)
    for k in ("si_sdr", "snr", "stoi"):
        assert results["per_file"][name][k] == pytest.approx(
            direct[k], rel=1e-4, abs=1e-6
        )


def test_nonfinite_guard_skips_bad_updates():
    """A batch producing non-finite grads must NOT touch params/opt-state
    (the bf16 equivalent of the reference's GradScaler step-skipping);
    the next clean batch must update normally. skip_nonfinite=False
    documents the hazard: one bad batch poisons the params forever."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.trainer import (
        TrainState,
        make_step_fns,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        LossConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.augmentation import (
        SpecAugmentConfig,
    )

    import optax

    model = HybridViT(**TINY_MODEL)
    rng = np.random.default_rng(0)
    n = 40 * 128
    pad = 63 * 128
    noisy = np.zeros((2, pad), np.float32)
    noisy[:, :n] = rng.standard_normal((2, n)).astype(np.float32) * 0.3
    clean = (noisy * 0.8).astype(np.float32)
    good = {
        "noisy_audio": jnp.asarray(noisy),
        "clean_audio": jnp.asarray(clean),
        "length": jnp.asarray([n, n], jnp.int32),
        "valid": jnp.asarray([True, True]),
    }
    bad = dict(good)
    bad["noisy_audio"] = good["noisy_audio"].at[0, 10].set(jnp.nan)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 257, 64, 1), jnp.float32), train=False,
    )
    opt = optax.adamw(1e-3)

    def fresh_state():
        params = jax.tree.map(jnp.copy, variables["params"])
        return TrainState(
            params=params,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    train_step, _ = make_step_fns(
        model, opt, LossConfig(), STFTConfig(), SpecAugmentConfig(),
        augment=False, skip_nonfinite=True,
    )
    s1, m1 = train_step(fresh_state(), bad, jax.random.PRNGKey(7))
    assert float(m1["nonfinite_skipped"]) == 1.0
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(variables["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s1.step) == 1  # step counter still advances
    before = [np.asarray(l) for l in jax.tree_util.tree_leaves(s1.params)]
    s2, m2 = train_step(s1, good, jax.random.PRNGKey(8))  # donates s1
    assert float(m2["nonfinite_skipped"]) == 0.0
    assert np.isfinite(float(m2["total"]))
    diffs = [
        float(np.abs(np.asarray(a) - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(s2.params), before)
    ]
    assert max(diffs) > 0  # the clean step really updated

    unguarded, _ = make_step_fns(
        model, opt, LossConfig(), STFTConfig(), SpecAugmentConfig(),
        augment=False, skip_nonfinite=False,
    )
    s3, _ = unguarded(fresh_state(), bad, jax.random.PRNGKey(7))
    leaves = np.concatenate([
        np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(s3.params)
    ])
    assert not np.isfinite(leaves).all()
