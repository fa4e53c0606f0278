#!/usr/bin/env python
"""Benchmark: enhancement throughput (audio-seconds/s) on one TPU chip.

Measures the full jitted enhancement pipeline — STFT -> flagship 28M-param
HybridViT (bf16) -> noisy-phase iSTFT — on batch-32 x 3-second utterances
(BASELINE.json config #2 shape) and reports audio-seconds processed per
wall-second.

Baseline: the reference's only stated inference number is "near real-time"
on a modern GPU (README.md:29, :413-416; BASELINE.md), i.e. ~1.0
audio-second/second at batch 1. ``vs_baseline`` is therefore the realtime
factor.

Prints exactly ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
        AudioEnhancer,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        create_hybrid_vit,
    )

    sr = 16000
    batch = 32
    seconds = 3.0
    wav_len_raw = int(sr * seconds)

    use_bf16 = jax.default_backend() == "tpu"
    model = create_hybrid_vit(
        compute_dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
        dropout=0.0,
        attn_dropout=0.0,
        drop_path_rate=0.0,
    )
    rng = np.random.default_rng(0)
    wavs = [
        (0.3 * np.sin(2 * np.pi * 220 * np.arange(wav_len_raw) / sr)
         + 0.05 * rng.standard_normal(wav_len_raw)).astype(np.float32)
        for _ in range(batch)
    ]

    x0 = jnp.zeros((1, 257, 128, 1), jnp.float32)
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        enable_compilation_cache,
        jit_init,
    )

    enable_compilation_cache()
    variables = jit_init(model, x0)
    enhancer = AudioEnhancer(model, variables, {}, io_dtype="int16")

    # warmup (compile)
    out = enhancer.enhance_batch(wavs)
    jax.block_until_ready(jax.numpy.zeros(()))

    # pipelined: keep 2 batches in flight so H2D/compute/D2H overlap
    # (a serving loop double-buffers the same way); each iteration still
    # feeds fresh host memory and fetches results back to host
    iters = 20
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        pending.append(enhancer.enhance_batch_async(wavs))
        if len(pending) > 2:
            np.asarray(pending.pop(0))
    for dev in pending:
        np.asarray(dev)
    elapsed = time.perf_counter() - t0
    audio_seconds = iters * batch * seconds
    throughput = audio_seconds / elapsed

    print(
        json.dumps(
            {
                "metric": "enhance_throughput_audio_seconds_per_s_per_chip",
                "value": round(throughput, 2),
                "unit": "audio_s/s",
                "vs_baseline": round(throughput / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
