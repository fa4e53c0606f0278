#!/usr/bin/env python
"""Self-contained end-to-end demo (equivalent of the reference's
demo.ipynb, SURVEY.md C22): build a small Hybrid ViT, synthesize a tiny
noisy/clean dataset, train briefly, enhance, and report SNR improvement.

Runs on whatever backend is available (TPU or CPU):

    python examples/demo.py [--epochs 5] [--device cpu] [--outdir /tmp/demo]

Unlike the notebook (which re-implemented the model inline with a
different dB normalization, SURVEY.md §7.14), this demo uses the real
framework components end to end.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n_files: int, seed: int = 0, sr: int = 16000):
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
        save_wav,
    )

    rng = np.random.default_rng(seed)
    for i in range(n_files):
        dur = int(sr * rng.uniform(1.0, 2.0))
        t = np.arange(dur) / sr
        f0 = rng.uniform(120, 320)
        clean = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.25 * np.sin(2 * np.pi * 2.3 * f0 * t + 0.7)
            + 0.12 * np.sin(2 * np.pi * 4.1 * f0 * t)
        ).astype(np.float32)
        noisy = clean + 0.2 * rng.standard_normal(dur).astype(np.float32)
        save_wav(root / "clean_trainset_28spk_wav" / f"p{i:03d}.wav", clean, sr)
        save_wav(root / "noisy_trainset_28spk_wav" / f"p{i:03d}.wav", noisy, sr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--outdir", default="/tmp/sevit_demo")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
        DataLoader,
        VoiceBankDataset,
        save_wav,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation import (
        compute_all_metrics,
        print_metrics,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
        AudioEnhancer,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        HybridViT,
        count_parameters,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
        Trainer,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        enable_compilation_cache,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils.visualization import (
        plot_comparison,
        plot_loss_curves,
    )

    enable_compilation_cache()
    outdir = Path(args.outdir)
    data_root = outdir / "data"
    print(f"[demo] backend: {jax.default_backend()}  devices: {jax.devices()}")

    print(f"[demo] synthesizing {args.files} training pairs ...")
    make_dataset(data_root, args.files)

    # small config close to the notebook's (256-dim / 4-head / 3-layer)
    model = HybridViT(
        encoder_channels=(16, 32, 64),
        embed_dim=256,
        num_heads=4,
        num_layers=3,
        decoder_channels=(64, 32, 16, 1),
        dropout=0.0,
        attn_dropout=0.0,
        drop_path_rate=0.0,
        max_patches=4000,
    )

    config = {
        "data": {"sample_rate": 16000, "train_val_split": 0.85,
                 "augmentation": {"enabled": False}},
        "audio": {"n_fft": 512, "hop_length": 128, "win_length": 512},
        "training": {
            "num_epochs": args.epochs,
            "batch_size": 8,
            "seed": 0,
            "optimizer": {"name": "adamw", "lr": 2e-3},
            "scheduler": {"name": "cosine", "min_lr": 1e-4},
            "loss": {"l1_weight": 1.0, "stoi_weight": 0.1},
            "early_stopping": {"enabled": False},
            "checkpoint": {"save_dir": str(outdir / "ckpt"),
                           "save_every_n_epochs": 0},
            "logging": {"log_dir": str(outdir / "logs"),
                        "use_tensorboard": False},
        },
        "mesh": {"data_parallel": -1, "model_parallel": 1},
    }

    train_ds = VoiceBankDataset(data_root, "train", config)
    val_ds = VoiceBankDataset(data_root, "val", config)
    buckets = (128, 192, 256)
    trainer = Trainer(
        model,
        config,
        DataLoader(train_ds, batch_size=8, buckets=buckets, seed=0),
        DataLoader(val_ds, batch_size=8, buckets=buckets, shuffle=False),
    )
    counts = count_parameters(
        {"params": jax.device_get(trainer.state.params)}
    )
    print(f"[demo] model: {counts['total']/1e6:.2f}M params")

    print(f"[demo] training {args.epochs} epochs ...")
    history = trainer.train()
    print(
        "[demo] train loss: "
        + " -> ".join(f"{v:.4f}" for v in history["train_loss"])
    )

    variables = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    }
    enhancer = AudioEnhancer(model, variables, config, buckets=buckets)
    noisy, clean = train_ds.load_pair(0)
    enhanced = enhancer.enhance(noisy)
    save_wav(outdir / "noisy.wav", noisy, 16000)
    save_wav(outdir / "enhanced.wav", enhanced, 16000)
    save_wav(outdir / "clean.wav", clean, 16000)

    metrics = compute_all_metrics(clean, enhanced, noisy, include_pesq=False)
    print_metrics(metrics)
    print(
        f"[demo] SNR improvement: {metrics['snr_improvement']:+.2f} dB "
        f"(noisy {metrics['noisy_snr']:.2f} -> enhanced {metrics['snr']:.2f})"
    )

    plot_loss_curves(
        history["train_loss"], history["val_loss"],
        save_path=outdir / "loss.png",
    )
    plot_comparison(
        noisy, clean, enhanced, save_path=outdir / "comparison.png"
    )
    print(f"[demo] artifacts in {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
