#!/usr/bin/env python
"""Bucketed-with-padding-mask vs exact-length enhancement delta.

The reference enhances each utterance at its exact length, batch-1,
unpadded (reference inference/enhancer.py:82-129). Our throughput path
pads to bucket lengths, which perturbs global attention; ``mask_padding``
excludes padding patches from attention. This script quantifies the
residual output delta of each bucketed mode against the exact-length
oracle, in PCM16 LSB units (1 LSB = 1/32768 full scale), over synthetic
clips with lengths that fall strictly inside buckets (worst case for
padding).

    python benchmarks/bench_mask_delta.py [--device cpu] [--seed 0]

Prints a small JSON report; used to decide the default eval-path mode
(documented in PERF.md).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["tpu", "cpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--full-size", action="store_true",
                    help="use the default 28M model instead of the small "
                         "test config (slower)")
    ap.add_argument("--pos-embed", default="learned_1d",
                    choices=["learned_1d", "factored_2d"],
                    help="positional-embedding variant (factored_2d makes "
                         "valid-patch embeddings bucket-width invariant)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_platforms", "axon" if args.device == "tpu" else args.device
    )

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
        AudioEnhancer,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        HybridViT,
    )

    rng = np.random.default_rng(args.seed)
    if args.full_size:
        model = HybridViT(pos_embed_type=args.pos_embed)
    else:
        model = HybridViT(embed_dim=96, num_layers=2, num_heads=4,
                          encoder_channels=(16, 32, 96),
                          pos_embed_type=args.pos_embed)
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, 256, 256, 1)),
        train=False,
    )

    def make(**kw):
        return AudioEnhancer(model, variables, **kw)

    exact = make()
    unmasked = make(mask_padding=False)
    masked = make(mask_padding=True)

    hop = exact.stft_cfg.hop_length
    # lengths deep inside buckets: ~25%..90% fill of the 256/512/1024
    # frame buckets — maximum padding perturbation
    lengths = [int(f * hop) for f in (67, 130, 200, 310, 500, 750, 990)]
    report = {"lsb": 1.0 / 32768.0, "clips": []}
    worst = {"unmasked": 0.0, "masked": 0.0}
    for n in lengths:
        t = np.arange(n, dtype=np.float32) / 16000.0
        wav = (0.5 * np.sin(2 * np.pi * 220 * t)
               + 0.1 * rng.standard_normal(n)).astype(np.float32)
        wav /= np.abs(wav).max()
        ref = exact.enhance(wav, exact=True)
        ref_rms = float(np.sqrt(np.mean(ref**2)) + 1e-12)
        row = {"samples": n}
        for name, enh in (("unmasked", unmasked), ("masked", masked)):
            out = enh.enhance(wav)
            d = np.abs(out - ref).max() * 32768.0  # PCM16 LSBs
            row[name + "_max_lsb"] = float(d)
            row[name + "_rel_rms"] = float(
                np.sqrt(np.mean((out - ref) ** 2)) / ref_rms
            )
            worst[name] = max(worst[name], float(d))
        report["clips"].append(row)
    report["worst_max_lsb"] = worst
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
