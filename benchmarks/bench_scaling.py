#!/usr/bin/env python
"""Data-parallel scaling-efficiency benchmark.

Runs the jitted train step over meshes of 1, 2, 4, ... devices with the
per-device batch held constant (weak scaling) and reports efficiency vs
linear. On a single-chip environment, pass ``--device cpu`` to exercise
the SPMD path on N virtual host devices (functional check — CPU timing
does not predict ICI scaling, but the collective structure is identical).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/bench_scaling.py --device cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.device == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax
    import jax.numpy as jnp

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.augmentation import (
        SpecAugmentConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.pipeline import (
        featurize_batch,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        HybridViT,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.parallel import (
        make_mesh,
        shard_variables,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training import (
        TrainState,
        chain_with_clip,
        create_optimizer,
        make_step_fns,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.training.losses import (
        LossConfig,
    )

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    print(f"devices available: {n_dev}; testing {sizes}")

    model = HybridViT(
        encoder_channels=(16, 32, 64),
        embed_dim=256,
        num_heads=8,
        num_layers=4,
        decoder_channels=(64, 32, 16, 1),
        max_patches=4000,
        use_pallas_attention=False,
    )
    stft_cfg = STFTConfig()
    wav_len = (args.frames - 1) * stft_cfg.hop_length
    rng = np.random.default_rng(0)

    base_time = None
    for nd in sizes:
        mesh = make_mesh(data_parallel=nd, devices=jax.devices()[:nd])
        b = args.per_device_batch * nd
        batch = {
            "noisy_audio": rng.standard_normal((b, wav_len)).astype(np.float32),
            "clean_audio": rng.standard_normal((b, wav_len)).astype(np.float32),
            "length": np.full((b,), wav_len, np.int32),
            "valid": np.ones((b,), bool),
        }
        feats = featurize_batch(
            jnp.asarray(batch["noisy_audio"][:1]),
            jnp.asarray(batch["clean_audio"][:1]),
            jnp.asarray(batch["length"][:1]),
            stft_cfg,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            feats.noisy_spec,
            train=False,
        )
        opt = chain_with_clip(create_optimizer({}), 1.0)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt.init(variables["params"]),
            step=jnp.asarray(0, jnp.int32),
        )
        state = shard_variables(state, mesh)
        step_fn, _ = make_step_fns(
            model, opt, LossConfig(), stft_cfg, SpecAugmentConfig(), mesh=mesh
        )
        key = jax.random.PRNGKey(0)
        state, m = step_fn(state, batch, key)
        jax.block_until_ready(m["total"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, batch, key)
        jax.block_until_ready(m["total"])
        dt = (time.perf_counter() - t0) / args.iters
        if base_time is None:
            base_time = dt
        eff = base_time / dt  # weak scaling: ideal == 1.0
        print(
            f"devices={nd:>2}  global_batch={b:>3}  step={dt*1e3:8.2f} ms  "
            f"weak-scaling efficiency={eff*100:5.1f}%"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
