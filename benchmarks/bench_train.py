#!/usr/bin/env python
"""Training-step throughput benchmark.

Measures the full jitted train step (on-device featurize -> fwd -> loss ->
bwd -> clip -> AdamW) for a given model size and batch shape; reports
ms/step, audio-seconds/s and achieved model FLOP/s.

    python benchmarks/bench_train.py [--scaled] [--batch 16] [--frames 256]

``--scaled`` uses the 12-layer / 1024-dim / 16-head stress config
(BASELINE.json config #4).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", default="resize",
                    choices=["resize", "fullres_mask"],
                    help="output head (fullres_mask = the r5 "
                         "flagship quality recipe, +7% fwd FLOPs)")
    ap.add_argument("--scaled", action="store_true",
                    help="12L/1024d/16h stress config")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--attention", default="auto",
                    choices=["auto", "pallas", "xla"],
                    help="force the attention kernel (auto = model default)")
    ap.add_argument("--dropout", type=float, default=None,
                    help="override dropout+attn_dropout+drop_path "
                         "(attn_dropout>0 forces the explicit-weights path)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize transformer blocks in backward")
    ap.add_argument("--output-mode", default="magnitude",
                    choices=["magnitude", "mask"],
                    help="train-step head semantics (mask = the r4 "
                         "recommended quality recipe)")
    ap.add_argument("--prng", default=None,
                    choices=["threefry2x32", "rbg", "unsafe_rbg"],
                    help="PRNG impl for dropout/augment mask generation")
    args = ap.parse_args()

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
        count_parameters,
        create_hybrid_vit,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
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
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        enable_compilation_cache,
        jit_init,
    )

    enable_compilation_cache()
    if args.prng:
        from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
            set_prng_impl,
        )

        set_prng_impl(args.prng)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    overrides = dict(compute_dtype=dtype, remat=args.remat)
    if args.head != "resize":
        overrides.update(head_type=args.head)
    if args.scaled:
        overrides.update(
            embed_dim=1024, num_heads=16, num_layers=12,
        )
    if args.dropout is not None:
        overrides.update(
            dropout=args.dropout,
            attn_dropout=args.dropout,
            drop_path_rate=args.dropout,
        )
    if args.attention != "auto":
        overrides.update(use_pallas_attention=args.attention == "pallas")
        if args.attention == "pallas" and args.dropout is None:
            # attn dropout forces the explicit-weights path; zero it so the
            # pallas kernel is actually exercised
            overrides.update(attn_dropout=0.0)
    model = create_hybrid_vit(**overrides)

    stft_cfg = STFTConfig()
    b, t = args.batch, args.frames
    wav_len = (t - 1) * stft_cfg.hop_length
    rng = np.random.default_rng(0)
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
    variables = jit_init(model, feats.noisy_spec)
    counts = count_parameters(variables)
    print(f"model: {counts['total']/1e6:.2f}M params  dtype={dtype.__name__}")

    opt = chain_with_clip(create_optimizer({}), 1.0)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    train_step, _ = make_step_fns(
        model, opt, LossConfig(), stft_cfg, SpecAugmentConfig(),
        output_mode=args.output_mode
    )
    key0 = jax.random.PRNGKey(0)

    # Counter-chained protocol (see PERF.md "Measurement methodology"):
    # the batch is synthesized ON DEVICE from a counter that data-depends
    # on the previous step's loss, so every iteration presents fresh
    # buffer contents AND fresh buffer ids to the relay — the only
    # protocol observed to defeat its result cache (chained *donated*
    # state re-presents the same buffer ids and gets served cached
    # results: the scaled config "measured" 5 ms/step = 885% MFU that
    # way). Synthesizing on device also keeps host traffic out of the
    # timed region.
    def bench_step(state, counter):
        k = jax.random.fold_in(key0, counter)
        kn, kc, kr = jax.random.split(k, 3)
        dev_batch = {
            "noisy_audio": jax.random.normal(kn, (b, wav_len), jnp.float32),
            "clean_audio": jax.random.normal(kc, (b, wav_len), jnp.float32),
            "length": jnp.full((b,), wav_len, jnp.int32),
            "valid": jnp.ones((b,), bool),
        }
        new_state, m = train_step(state, dev_batch, kr)
        return new_state, counter + 1 + (m["total"] * 0).astype(jnp.int32)

    bench_step = jax.jit(bench_step)
    counter = jnp.asarray(0, jnp.int32)

    t0 = time.perf_counter()
    state, counter = bench_step(state, counter)
    jax.block_until_ready(counter)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, counter = bench_step(state, counter)
    jax.block_until_ready(counter)
    dt = (time.perf_counter() - t0) / args.iters

    audio_s = b * wav_len / 16000
    print(
        f"train step: {dt*1e3:.2f} ms  "
        f"throughput: {audio_s/dt:,.0f} audio-s/s  "
        f"steps/s: {1/dt:,.1f}"
    )

    # ---- MFU (round-2 verdict #1): exact FLOPs, two independent legs ----
    # analytic per-stage count (benchmarks/flops.py, asserted against XLA
    # in tests/test_flops.py) and XLA's own count of THIS compiled step
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from flops import (
        mfu_report,
        spec_from_model,
        train_step_flops,
        xla_program_flops,
    )

    analytic = train_step_flops(
        spec_from_model(model), b, 257, t, n_params=counts["total"]
    )
    try:
        xla_fl = xla_program_flops(bench_step, state, counter)
    except Exception as e:  # cost model unavailable on some backends
        print(f"(xla cost_analysis unavailable: {e})")
        xla_fl = None
    print(
        f"FLOPs/step: analytic {analytic['train_total']/1e9:.1f} GF "
        f"(featurize {analytic['featurize']/1e9:.1f} + 3x fwd "
        f"{analytic['forward']/1e9:.1f})"
        + (f"  xla {xla_fl/1e9:.1f} GF" if xla_fl else "")
    )
    print("MFU: " + mfu_report(xla_fl or analytic["train_total"], dt))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
