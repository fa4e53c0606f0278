"""Training CLI (reference: train.py:38-169 — same flags + TPU extras)."""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np


def set_seed(seed: int) -> None:
    """Seed python/numpy; jax PRNG keys are derived explicitly from the
    config seed (reference: train.py:23-35 — cudnn determinism has no TPU
    counterpart; XLA is deterministic by default)."""
    random.seed(seed)
    np.random.seed(seed)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train the Hybrid ViT speech enhancer (TPU-native)"
    )
    p.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"],
                   help="backend override (reference: --device cuda|cpu)")
    p.add_argument("--config-dir", default="config", help="YAML config dir")
    p.add_argument("--data-root", default=None, help="VoiceBank-DEMAND root")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--resume", default=None, help="checkpoint dir to resume")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-files", type=int, default=None,
                   help="truncate dataset (smoke runs)")
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of a few steps here")
    p.add_argument("--mask-padding", action="store_true",
                   help="exclude bucket-padding patches from attention "
                        "during train/eval steps (reference default lets "
                        "them attend; pair with model.transformer."
                        "pos_embed: factored_2d for bucket-consistent "
                        "training)")
    p.add_argument("--pos-embed", default=None,
                   choices=["learned_1d", "factored_2d", "sinusoidal"],
                   help="positional-embedding variant override (default "
                        "learned_1d = reference parity; factored_2d is "
                        "the recommended from-scratch recipe, PERF.md #14)")
    p.add_argument("--output-mode", default=None,
                   choices=["magnitude", "mask"],
                   help="model head semantics: 'magnitude' (reference "
                        "parity; decoder's 64-row bottleneck caps the "
                        "oracle at +3.2 dB SI-SDR) or 'mask' (Tanh -> "
                        "[0,1] spectral mask on the full-resolution "
                        "noisy magnitude; +8.9 dB oracle — recommended "
                        "for from-scratch training). Recorded in the "
                        "checkpoint; inference auto-configures")
    p.add_argument("--head", default=None,
                   choices=["resize", "fullres_mask"],
                   help="output head: 'resize' (reference parity — final "
                        "64-row map bilinearly stretched to 257 bins) or "
                        "'fullres_mask' (learned sub-pixel upsample + "
                        "full-resolution input skip; removes the 64-row "
                        "bottleneck — pair with --output-mode mask). "
                        "Recorded in the checkpoint; inference "
                        "auto-configures")
    p.add_argument("--log-l1-weight", type=float, default=None,
                   help="blend a gradient-floored log-magnitude L1 into "
                        "the loss (0.05 is the measured LSD fix, "
                        "PERF.md #16; default 0 = reference loss parity)")
    p.add_argument("--si-sdr-weight", type=float, default=None,
                   help="add -w * mean SI-SDR(dB) of the reconstructed "
                        "waveform (predicted magnitude + noisy phase, "
                        "iSTFT inside the train step) — optimizes the "
                        "benchmark metric directly (default 0 = "
                        "reference loss parity; PERF.md r5)")
    # multi-host (SURVEY §5 distributed backend): every host runs this CLI
    # with the same flags plus its own --process-id
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multi-host training)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total number of hosts")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's index in [0, num-processes)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.device:
        import jax

        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    multihost = bool(args.num_processes and args.num_processes > 1)
    if multihost:
        # must run before anything touches the backend: jax.distributed
        # wires every host's local chips into one global device set
        from ..parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from ..data import DataLoader, VoiceBankDataset
    from ..models import create_hybrid_vit
    from ..parallel import mesh_from_config
    from ..training import Trainer
    from ..utils import load_all_configs, set_config_value, validate_config

    from ..utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    config = load_all_configs(args.config_dir)
    # CLI overrides (reference: train.py:84-92)
    if args.data_root:
        set_config_value(config, "data.data_root", args.data_root)
    if args.epochs is not None:
        set_config_value(config, "training.num_epochs", args.epochs)
    if args.batch_size is not None:
        set_config_value(config, "training.batch_size", args.batch_size)
    if args.lr is not None:
        set_config_value(config, "training.optimizer.lr", args.lr)
    if args.seed is not None:
        set_config_value(config, "training.seed", args.seed)
    if args.mask_padding:
        set_config_value(config, "training.mask_padding", True)
    if args.pos_embed is not None:
        set_config_value(config, "model.transformer.pos_embed", args.pos_embed)
    if args.output_mode is not None:
        set_config_value(config, "model.output_mode", args.output_mode)
    if args.head is not None:
        set_config_value(config, "model.head", args.head)
    if args.log_l1_weight is not None:
        set_config_value(config, "training.loss.log_l1_weight", args.log_l1_weight)
    if args.si_sdr_weight is not None:
        set_config_value(config, "training.loss.si_sdr_weight", args.si_sdr_weight)
    if args.data_parallel is not None:
        set_config_value(config, "mesh.data_parallel", args.data_parallel)
    if args.model_parallel is not None:
        set_config_value(config, "mesh.model_parallel", args.model_parallel)
    problems = validate_config(config)
    if problems:
        raise SystemExit("Invalid config:\n  " + "\n  ".join(problems))

    seed = config.get("training", {}).get("seed", 42)
    set_seed(seed)

    data_root = Path(config.get("data", {}).get("data_root", "data/voicebank_demand"))
    train_ds = VoiceBankDataset(data_root, "train", config)
    val_ds = VoiceBankDataset(data_root, "val", config)
    if args.max_files:
        train_ds.file_pairs = train_ds.file_pairs[: args.max_files]
        val_ds.file_pairs = val_ds.file_pairs[: max(args.max_files // 4, 1)]

    tc = config.get("training", {})
    bcfg = config.get("data", {}).get("bucketing", {})
    buckets = tuple(bcfg.get("frame_buckets", (128, 256, 384, 512, 768, 1024)))

    # multi-host input pipeline: each host reads its stride of the global
    # file list and feeds its local rows (trainer's distribute_batch builds
    # the global sharded arrays). Lockstep constraints computed LOCALLY but
    # identically on every host from the global file counts:
    #   - per-host batch rows = global batch / num hosts
    #   - every batch padded to ONE fixed bucket (identical program shape)
    #   - per-host batch count = floor(min shard size / local batch)
    fixed_bucket = None
    train_max_batches = val_max_batches = None
    global_bs = tc.get("batch_size", 16)
    local_bs = global_bs
    if multihost:
        import jax

        n_proc = jax.process_count()
        if global_bs % n_proc != 0:
            raise SystemExit(
                f"batch_size ({global_bs}) must be divisible by the number "
                f"of hosts ({n_proc})"
            )
        local_bs = global_bs // n_proc
        fixed_bucket = buckets[-1]
        train_max_batches = (len(train_ds) // n_proc) // local_bs
        # validation must NOT drop files (the reference validates every
        # epoch on everything, trainer.py:269-337): size the lockstep
        # batch count to the LARGEST host shard — the loader pads short
        # final batches to local_bs (valid=False rows) and exhausted
        # shards emit all-invalid padding batches, so every host steps
        # the same count and every val file is scored
        max_shard = -(-len(val_ds) // n_proc)
        val_max_batches = -(-max_shard // local_bs)
        if len(val_ds) < n_proc:
            # a host with an EMPTY shard cannot even build padding
            # batches — drop validation loudly (Trainer then tracks
            # best_model on the train loss)
            val_max_batches = 0
        if train_max_batches < 1:
            raise SystemExit(
                f"{len(train_ds)} train files cannot feed {n_proc} hosts "
                f"at local batch {local_bs}"
            )
        train_ds = train_ds.shard(jax.process_index(), n_proc)
        val_ds = val_ds.shard(jax.process_index(), n_proc)
    print(f"train files: {len(train_ds)}  val files: {len(val_ds)}")

    # int16 batch transfer (round 5): sources are PCM16 WAVs, so shipping
    # PCM16 and rescaling on device halves the dominant per-epoch cost on
    # a remote-relay TPU at <= 1 LSB requantization (featurize_batch
    # rescales; equivalence tested). 'auto' = int16 on accelerator
    # backends, float32 on CPU (same policy shape as tpu.prng_impl).
    import jax as _jax

    tdtype = tc.get("transfer_dtype", "auto")
    if tdtype == "auto":
        tdtype = "float32" if _jax.default_backend() == "cpu" else "int16"
    train_loader = DataLoader(
        train_ds,
        batch_size=local_bs,
        num_workers=tc.get("num_workers", 4),
        seed=seed,
        buckets=buckets,
        fixed_bucket=fixed_bucket,
        max_batches=train_max_batches,
        transfer_dtype=tdtype,
    )
    val_loader = DataLoader(
        val_ds,
        batch_size=local_bs,
        shuffle=False,
        num_workers=tc.get("num_workers", 4),
        buckets=buckets,
        fixed_bucket=fixed_bucket,
        max_batches=val_max_batches if val_max_batches else None,
        transfer_dtype=tdtype,
    )
    if multihost and val_max_batches == 0:
        # only reachable when some host's val shard is EMPTY
        # (len(val_ds) < num hosts) — no batch can be padded out of zero
        # files; the Trainer then tracks best_model on the train loss
        print(
            "warning: validation set smaller than the host count — "
            "skipping validation (best_model tracks the train loss)"
        )
        val_loader = None

    import jax

    from ..utils.runtime import resolve_prng_impl

    tpu_cfg = config.get("tpu", {})
    prng_impl = resolve_prng_impl(
        tpu_cfg.get("prng_impl"), jax.default_backend()
    )
    if prng_impl:
        from ..utils.runtime import set_prng_impl

        set_prng_impl(prng_impl)
    import jax.numpy as jnp

    compute_dtype = (
        jnp.bfloat16
        if tc.get("use_amp", True)
        and tpu_cfg.get("compute_dtype", "bfloat16") == "bfloat16"
        else jnp.float32
    )
    model = create_hybrid_vit(
        config,
        compute_dtype=compute_dtype,
        use_pallas_attention=tpu_cfg.get("use_pallas_attention", False),
    )
    mesh = mesh_from_config(config)
    print(f"mesh: {dict(mesh.shape)}")
    dp = mesh.shape.get("data", 1)
    bs = tc.get("batch_size", 16)
    if bs % dp != 0:
        raise SystemExit(
            f"batch_size ({bs}) must be divisible by the data-parallel "
            f"axis ({dp} devices); pass --batch-size or --data-parallel"
        )

    trainer = Trainer(
        model,
        config,
        train_loader,
        val_loader,
        mesh=mesh,
        checkpoint_dir=args.checkpoint_dir,
        log_dir=args.log_dir,
        resume_from=args.resume,
        profile_dir=args.profile_dir,
    )
    history = trainer.train()
    print(
        f"done: best val loss {trainer.best_val_loss:.5f} after "
        f"{trainer.current_epoch} epochs"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
