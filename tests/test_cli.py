"""CLI-level tests: run the real entry points in-process on the CPU
backend with a tiny model + synthetic data (arg handling, wiring, file
outputs — the surfaces a user touches)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.cli import (
    enhance as enhance_cli,
    evaluate as evaluate_cli,
    train as train_cli,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
    save_wav,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    HybridViT,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
    save_model_weights,
)

SR = 16000

TINY_YAML = """
model:
  encoder: {{channels: [4, 8, 16], dropout: 0.0}}
  transformer: {{embed_dim: 32, num_heads: 2, num_layers: 1,
                attention_dropout: 0.0, drop_path_rate: 0.0}}
  decoder: {{channels: [16, 8, 4, 1]}}
audio: {{sample_rate: 16000, n_fft: 512, hop_length: 128, win_length: 512}}
data:
  sample_rate: 16000
  train_val_split: 0.75
  augmentation: {{enabled: false}}
  bucketing: {{frame_buckets: [64, 96]}}
training:
  num_epochs: 1
  batch_size: 4
  seed: 0
  optimizer: {{name: adamw, lr: 0.001}}
  scheduler: {{name: cosine, min_lr: 0.0001}}
  loss: {{l1_weight: 1.0, stoi_weight: 0.1}}
  early_stopping: {{enabled: false}}
  checkpoint: {{save_dir: "{ckpt}", save_every_n_epochs: 0}}
  logging: {{log_dir: "{logs}", use_tensorboard: false,
             save_audio_samples: false}}
mesh: {{data_parallel: -1, model_parallel: 1}}
tpu: {{compute_dtype: float32, use_pallas_attention: false,
       stft_method: matmul}}
"""


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    data = tmp / "data"
    rng = np.random.default_rng(0)
    for i in range(8):
        dur = int(SR * 0.45)
        t = np.arange(dur) / SR
        clean = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        noisy = clean + 0.1 * rng.standard_normal(dur).astype(np.float32)
        save_wav(data / "clean_trainset_28spk_wav" / f"p{i}.wav", clean, SR)
        save_wav(data / "noisy_trainset_28spk_wav" / f"p{i}.wav", noisy, SR)
        save_wav(data / "clean_testset_wav" / f"t{i}.wav", clean, SR)
        save_wav(data / "noisy_testset_wav" / f"t{i}.wav", noisy, SR)
    cfg_dir = tmp / "config"
    cfg_dir.mkdir()
    (cfg_dir / "model_config.yaml").write_text(
        TINY_YAML.format(ckpt=tmp / "ckpt", logs=tmp / "logs")
    )
    # a tiny checkpoint for enhance/evaluate
    model = HybridViT(
        encoder_channels=(4, 8, 16), embed_dim=32, num_heads=2, num_layers=1,
        decoder_channels=(16, 8, 4, 1), dropout=0.0, attn_dropout=0.0,
        drop_path_rate=0.0, use_pallas_attention=False,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 257, 64, 1), jnp.float32),
    )
    save_model_weights(tmp / "weights", variables)
    return tmp, data, cfg_dir


def test_train_cli(cli_env):
    tmp, data, cfg_dir = cli_env
    rc = train_cli.main([
        "--config-dir", str(cfg_dir),
        "--data-root", str(data),
        "--device", "cpu",
        "--epochs", "1",
        "--batch-size", "8",
    ])
    assert rc == 0
    assert (tmp / "ckpt" / "final_model" / "state.msgpack").exists()


def test_enhance_cli_file_and_streaming(cli_env, tmp_path):
    tmp, data, cfg_dir = cli_env
    inp = next((data / "noisy_testset_wav").glob("*.wav"))
    out = tmp_path / "enh.wav"
    rc = enhance_cli.main([
        "--checkpoint", str(tmp / "weights"),
        "--config-dir", str(cfg_dir),
        "--device", "cpu",
        "--input", str(inp),
        "--output", str(out),
    ])
    assert rc == 0 and out.exists()
    out2 = tmp_path / "enh_s.wav"
    rc = enhance_cli.main([
        "--checkpoint", str(tmp / "weights"),
        "--config-dir", str(cfg_dir),
        "--device", "cpu",
        "--input", str(inp),
        "--output", str(out2),
        "--streaming", "--chunk-seconds", "0.3",
    ])
    assert rc == 0 and out2.exists()


def test_enhance_cli_errors(cli_env, tmp_path):
    tmp, data, cfg_dir = cli_env
    with pytest.raises(SystemExit):
        enhance_cli.main([
            "--checkpoint", str(tmp / "weights"),
            "--input", "/nonexistent.wav",
            "--output", str(tmp_path / "x.wav"),
        ])
    with pytest.raises(SystemExit):
        enhance_cli.main([
            "--checkpoint", str(tmp / "weights"),
            "--input", str(data / "noisy_testset_wav"),
            "--output", str(tmp_path / "file.wav"),
        ])


def test_evaluate_cli(cli_env, tmp_path):
    tmp, data, cfg_dir = cli_env
    out = tmp_path / "results.json"
    rc = evaluate_cli.main([
        "--checkpoint", str(tmp / "weights"),
        "--config-dir", str(cfg_dir),
        "--device", "cpu",
        "--data-root", str(data),
        "--output", str(out),
        "--batch-size", "4",
        "--max-files", "4",
        "--no-pesq",
    ])
    assert rc == 0
    results = json.loads(out.read_text())
    # r4: the JSON carries summary AND per-file rows (per-SNR bins and
    # do-no-harm claims must be auditable from the artifact)
    assert results["summary"]["si_sdr"]["count"] == 4
    assert len(results["per_file"]) == 4
    assert "_by_input_snr" in results["summary"]


def test_enhance_cli_mask_padding(cli_env, tmp_path):
    """--mask-padding runs the masked bucketed path end-to-end and, on a
    clip shorter than its bucket, produces output that differs from the
    unmasked run (padding patches removed from attention)."""
    tmp, data, cfg_dir = cli_env
    inp = next((data / "noisy_testset_wav").glob("*.wav"))
    out_plain = tmp_path / "plain.wav"
    out_masked = tmp_path / "masked.wav"
    for out, extra in ((out_plain, []), (out_masked, ["--mask-padding"])):
        rc = enhance_cli.main([
            "--checkpoint", str(tmp / "weights"),
            "--config-dir", str(cfg_dir),
            "--device", "cpu",
            "--input", str(inp),
            "--output", str(out),
        ] + extra)
        assert rc == 0 and out.exists()
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
        load_audio,
    )

    plain, _ = load_audio(out_plain, SR)
    masked, _ = load_audio(out_masked, SR)
    assert plain.shape == masked.shape
    assert np.isfinite(masked).all()
    assert np.abs(plain - masked).max() > 0  # 0.45 s clip in a 64-frame bucket


def test_train_cli_recipe_flags(cli_env, tmp_path):
    """--pos-embed / --log-l1-weight / --mask-padding drive the full
    recommended from-scratch recipe (PERF.md #14/#16) without YAML edits."""
    tmp, data, cfg_dir = cli_env
    rc = train_cli.main([
        "--config-dir", str(cfg_dir),
        "--data-root", str(data),
        "--device", "cpu",
        "--epochs", "1",
        "--batch-size", "8",
        "--pos-embed", "factored_2d",
        "--log-l1-weight", "0.05",
        "--mask-padding",
        "--checkpoint-dir", str(tmp_path / "ck2"),
        "--log-dir", str(tmp_path / "lg2"),
    ])
    assert rc == 0
    import flax.serialization as fser

    state = fser.msgpack_restore(
        (tmp_path / "ck2" / "final_model" / "state.msgpack").read_bytes()
    )
    flat = json.dumps(sorted(_all_keys(state)))
    assert "pos_embed_freq" in flat and "pos_embed_time" in flat
    logs = list((tmp_path / "lg2").rglob("metrics.jsonl"))
    assert logs, "train CLI wrote no metrics.jsonl"
    text = logs[0].read_text()
    assert "log_l1" in text, "blended log-L1 component missing from logs"
    # the factored_2d checkpoint must load for inference with the DEFAULT
    # config (no pos_embed YAML edit) — architecture comes from meta.json
    out = tmp_path / "recipe_enh.wav"
    rc = enhance_cli.main([
        "--checkpoint", str(tmp_path / "ck2" / "final_model"),
        "--config-dir", str(cfg_dir),
        "--device", "cpu",
        "--input", str(data / "noisy_testset_wav" / "t0.wav"),
        "--output", str(out),
    ])
    assert rc == 0 and out.exists()


def _all_keys(tree):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.append(str(k))
            out.extend(_all_keys(v))
    return out
