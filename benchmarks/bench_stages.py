#!/usr/bin/env python
"""Per-stage breakdown of the on-device inference core (VERDICT r3 #3).

Times nested PREFIXES of the enhancement pipeline — DSP front (STFT +
normalization), conv encoder, transformer, decoder, final resize, iSTFT —
each as its own counter-chained jitted program (the only honest timing
protocol through the TPU relay, PERF.md "Measurement methodology"), and
reports each stage as the difference of consecutive prefixes.

Caveat stated up front: separate compiles lose cross-stage fusion, so the
stage sum can exceed the full-pipeline step time; the full-step time is
also printed and the percentages are normalized to the PREFIX-DIFFERENCE
sum. Per-stage analytic FLOPs (benchmarks/flops.py breakdown) turn the
table into a roofline argument: a stage with high time share and low
FLOP share is bandwidth/latency-bound, not compute-bound.

    python benchmarks/bench_stages.py [--batch 32] [--seconds 3.0]
        [--iters 20] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--json-out", default=None)
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
    model = create_hybrid_vit(
        compute_dtype=dtype, dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0
    )

    sr = 16000
    frames = max(int(round(args.seconds * sr)) // cfg.hop_length, 16)
    wav_len = frames * cfg.hop_length
    b = args.batch
    variables = jit_init(
        model, jnp.zeros((1, cfg.num_bins, frames + 1, 1), jnp.float32)
    )
    print(
        f"model: {count_parameters(variables)['total']/1e6:.2f}M params  "
        f"dtype={dtype.__name__}  batch={b} x {wav_len/sr:.2f}s"
    )

    key0 = jax.random.PRNGKey(0)

    def front(counter):
        k = jax.random.fold_in(key0, counter)
        noisy = 0.3 * jax.random.normal(k, (b, wav_len), jnp.float32)
        mx = jnp.max(jnp.abs(noisy), axis=-1, keepdims=True)
        x = noisy / jnp.where(mx > 1e-8, mx, 1.0)
        re, im = stft(x, cfg, method="auto")
        mag, phase = magphase(re, im)
        mm = jnp.max(mag, axis=(-2, -1), keepdims=True)
        mm = jnp.where(mm > 1e-8, mm, 1.0)
        return mag, phase, mm

    def chain(counter, y):
        # data-depend the next counter on this step's output (relay-cache
        # defeating; see PERF.md)
        return counter + 1 + (jnp.abs(y).max() * 0).astype(jnp.int32)

    def make_step(stage):
        def step(variables, counter):
            if stage == "synth":
                # isolates the benchmark harness's own input synthesis
                # (PRNG normal + scale) — NOT part of the real serving
                # pipeline; subtract from 'front' for the true DSP cost
                k = jax.random.fold_in(key0, counter)
                noisy = 0.3 * jax.random.normal(k, (b, wav_len), jnp.float32)
                return chain(counter, noisy)
            mag, phase, mm = front(counter)
            if stage == "front":
                return chain(counter, mag)
            out = model.apply(
                variables,
                (mag / mm)[..., None],
                train=False,
                stage_out=None if stage in ("model", "full") else stage,
            )
            if stage != "full":
                return chain(counter, out)
            y = reconstruct(
                out[..., 0] * mm, phase, cfg, length=wav_len, method="auto"
            )
            return chain(counter, y)

        return jax.jit(step)

    stages = ["synth", "front", "encoder", "transformer", "pre_resize",
              "model", "full"]
    cum = {}
    for st in stages:
        fn = make_step(st)
        counter = jnp.asarray(0, jnp.int32)
        t0 = time.perf_counter()
        counter = fn(variables, counter)
        jax.block_until_ready(counter)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            counter = fn(variables, counter)
        jax.block_until_ready(counter)
        dt = (time.perf_counter() - t0) / args.iters
        cum[st] = dt
        print(f"prefix {st:>11s}: {dt*1e3:7.2f} ms  (compile {compile_s:.1f}s)")

    # stage = difference of consecutive prefixes
    pairs = [
        ("bench_input_synth", "synth", None),
        ("dsp_front(stft+norm)", "front", "synth"),
        ("encoder_convs", "encoder", "front"),
        ("transformer", "transformer", "encoder"),
        ("decoder_convs", "pre_resize", "transformer"),
        ("final_resize", "model", "pre_resize"),
        ("istft", "full", "model"),
    ]
    diffs = {}
    for label, hi, lo in pairs:
        diffs[label] = cum[hi] - (cum[lo] if lo else 0.0)
    total = sum(diffs.values())
    print(f"\nfull step: {cum['full']*1e3:.2f} ms   "
          f"prefix-diff sum: {total*1e3:.2f} ms")
    print(f"{'stage':>22s} {'ms':>8s} {'%':>6s}")
    for label, _, _ in pairs:
        print(
            f"{label:>22s} {diffs[label]*1e3:8.2f} "
            f"{100*diffs[label]/max(total,1e-12):6.1f}"
        )

    if args.json_out:
        Path(args.json_out).write_text(json.dumps({
            "batch": b, "wav_len": wav_len, "dtype": dtype.__name__,
            "prefix_ms": {k: v * 1e3 for k, v in cum.items()},
            "stage_ms": {k: v * 1e3 for k, v in diffs.items()},
            "full_step_ms": cum["full"] * 1e3,
        }, indent=1))
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
