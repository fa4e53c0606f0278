#!/usr/bin/env python
"""On-device inference-throughput benchmark (honest relay protocol).

Measures the full jitted enhancement core — peak-normalize -> STFT ->
HybridViT forward -> phase-reuse iSTFT — excluding host<->device transfer
(bench.py measures the end-to-end link-bound path).

Methodology: timing loops through the TPU relay are only trustworthy when
every iteration's inputs differ in content AND no fresh host->device
buffers are introduced (PERF.md "Measurement methodology"). This harness
chains a step counter through the jitted program and synthesizes each
batch ON DEVICE from `jax.random.fold_in(key, counter)` — distinct content
every step, zero host traffic, a single data dependency chaining the loop.

    python benchmarks/bench_infer.py [--batch 32] [--seconds 3.0]
        [--scaled] [--attention auto|pallas|xla] [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--head", default="resize",
                    choices=["resize", "fullres_mask"],
                    help="output head (fullres_mask = the r5 "
                         "flagship quality recipe, +7% fwd FLOPs)")
    ap.add_argument("--scaled", action="store_true")
    ap.add_argument("--attention", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--fold-bn", action="store_true",
                    help="fold eval-mode BatchNorm into conv weights "
                         "(models/fold.py) before timing")
    ap.add_argument("--dft-precision", default="highest",
                    choices=["highest", "high", "default"],
                    help="iDFT matmul precision (PERF.md #9 serving knob)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        count_parameters,
        create_hybrid_vit,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
        magphase,
        reconstruct,
        stft,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        enable_compilation_cache,
        jit_init,
    )

    enable_compilation_cache()
    cfg = STFTConfig()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    overrides = dict(
        head_type=args.head,
        compute_dtype=dtype, dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0
    )
    if args.scaled:
        overrides.update(embed_dim=1024, num_heads=16, num_layers=12)
    if args.attention != "auto":
        overrides.update(use_pallas_attention=args.attention == "pallas")
    model = create_hybrid_vit(**overrides)

    sr = 16000
    frames = max(int(round(args.seconds * sr)) // cfg.hop_length, 16)
    wav_len = frames * cfg.hop_length
    b = args.batch

    variables = jit_init(
        model, jnp.zeros((1, cfg.num_bins, frames + 1, 1), jnp.float32)
    )
    print(f"model: {count_parameters(variables)['total']/1e6:.2f}M params  "
          f"dtype={dtype.__name__}  batch={b} x {wav_len/sr:.2f}s")
    if args.fold_bn:
        from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
            fold_batchnorm,
        )

        model, variables = fold_batchnorm(model, variables)
        print("BatchNorm folded into conv weights")
    dft_prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[args.dft_precision]

    key0 = jax.random.PRNGKey(0)

    @jax.jit
    def step(variables, counter):
        # synthesize this step's batch on device: distinct content per step
        k = jax.random.fold_in(key0, counter)
        noisy = 0.3 * jax.random.normal(k, (b, wav_len), jnp.float32)
        mx = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
        x = noisy / jnp.where(mx > 1e-8, mx, 1.0)
        re, im = stft(x, cfg, method="auto")
        mag, phase = magphase(re, im)
        mm = jnp.max(mag, axis=(-2, -1), keepdims=True)
        mm = jnp.where(mm > 1e-8, mm, 1.0)
        out = model.apply(variables, (mag / mm)[..., None], train=False)[..., 0]
        y = reconstruct(out * mm, phase, cfg, length=wav_len, method="auto",
                        precision=dft_prec)
        # chain: next counter depends on this step's output
        return counter + 1 + (jnp.abs(y).max() * 0).astype(jnp.int32)

    counter = jnp.asarray(0, jnp.int32)
    t0 = time.perf_counter()
    counter = step(variables, counter)
    jax.block_until_ready(counter)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        counter = step(variables, counter)
    jax.block_until_ready(counter)
    dt = (time.perf_counter() - t0) / args.iters

    audio_s = b * wav_len / sr
    print(f"inference step: {dt*1e3:.2f} ms  "
          f"throughput: {audio_s/dt:,.0f} audio-s/s on device")

    # ---- MFU: XLA's exact FLOP count of THIS compiled step / peak ----
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from flops import mfu_report, xla_program_flops

    try:
        xla_fl = xla_program_flops(step, variables, counter)
        print(f"FLOPs/step (xla): {xla_fl/1e9:.1f} GF   MFU: "
              + mfu_report(xla_fl, dt))
    except Exception as e:
        print(f"(xla cost_analysis unavailable: {e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
