#!/usr/bin/env python3
"""Per-stage roofline: is 22% inference MFU structural? (VERDICT r4 task 5)

For each stage of the inference core this computes, analytically:

  * FLOPs (from benchmarks/flops.py, XLA-cross-checked to <2%), and
  * HBM bytes moved, from an explicit fusion model of what XLA
    materializes between fusions (bf16 activations; elementwise ops —
    BN/ReLU/GELU/residual/softmax-scale — fused into their producer
    matmul/conv epilogues; softmax itself one extra read+write of the
    score tensor; weights read once per use),

then the per-stage roofline bound  t >= max(FLOPs/peak, bytes/BW)  on a
v5e (peak 197 bf16 TFLOP/s, HBM ~819 GB/s), and compares with measured
per-stage times (benchmarks/results/stages_tpu_r4.json, the r4 prefix-
timing harness). The per-stage "MFU ceiling" column is the highest MFU
the stage could reach AT THE ROOFLINE, i.e. t_compute / t_bound — if
that ceiling is far below 100%, the stage is bandwidth-bound and no
kernel can fix it at this shape; if the measured time is close to
t_bound, the implementation is near speed-of-light for the architecture.

Usage: python benchmarks/roofline.py [--batch 32] [--frames 376]
       [--scaled] [--fullres] [--stages-json benchmarks/results/...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flops import ModelSpec, forward_flops, stft_flops  # noqa: E402

PEAK_BF16 = 197e12  # v5e per-chip bf16 peak FLOP/s
HBM_BW = 819e9  # v5e HBM bandwidth, bytes/s
A = 2  # bf16 activation bytes


def encoder_bytes(spec: ModelSpec, b: int, f: int, t: int) -> float:
    """ConvBlock = conv(+fused BN/ReLU/dropout) then VALID maxpool.
    Fusions: conv reads input + weights, writes output; pool reads the
    conv output and writes the pooled map."""
    total = 0.0
    cin = spec.input_channels
    for ch, k, p in zip(
        spec.encoder_channels, spec.encoder_kernel_sizes,
        spec.encoder_pool_sizes,
    ):
        total += A * b * f * t * (cin + ch)  # conv in + out
        total += A * cin * ch * k * k  # weights (once)
        if p > 1:
            total += A * b * f * t * ch  # pool reads conv out...
            f, t = f // p, t // p
            total += A * b * f * t * ch  # ...writes pooled
        cin = ch
    return total


def transformer_bytes(spec: ModelSpec, b: int, n: int) -> float:
    """Pre-norm block traffic per layer. LN cannot fuse into the
    following matmul's epilogue (it is a *producer* with a reduction), so
    it costs one read+write of X; qkv/proj/MLP matmuls read their input
    and write their output; the residual add fuses into the consumer.
    Score tensor [H, N, N]: written by QK^T, read+written by softmax,
    read by AV."""
    d, hh = spec.embed_dim, spec.num_heads
    nd = b * n * d
    score = b * hh * n * n
    per_layer = (
        A * 2 * nd  # LN1 read+write
        + A * (nd + 3 * nd)  # qkv: read X, write Q,K,V
        + A * (2 * nd + score)  # QK^T: read Q,K, write scores
        + A * 2 * score  # softmax read+write
        + A * (score + nd + nd)  # AV: read probs, V; write ctx
        + A * (nd + nd + nd)  # proj: read ctx, write; + residual read X
        + A * 2 * nd  # LN2
        + A * (nd + spec.mlp_ratio * nd)  # MLP up (GELU fused)
        + A * (spec.mlp_ratio * nd + nd + nd)  # MLP down + residual read
        + A * 12 * d * d  # weights: qkv 3d² + proj d² + mlp 8d²
    )
    # patch embed (read encoder out, write tokens) + final LN +
    # to_feature_map
    f_patch = A * (b * n * spec.patch_size**2 * spec.encoder_channels[-1]
                   + nd)
    tail = A * (2 * nd + nd + b * n * spec.encoder_channels[-1])
    return spec.num_layers * per_layer + f_patch + tail


def decoder_bytes(spec: ModelSpec, b: int, h: int, w: int,
                  skips: list) -> float:
    """Skip 1x1 proj + bilinear resize + concat-conv per block; nearest
    upsample fuses into the conv's input read (it is a broadcast)."""
    total = 0.0
    cx = spec.encoder_channels[-1]
    rev = skips[::-1]
    n_dec = len(spec.decoder_channels)
    fullres = spec.head_type == "fullres_mask"
    for i, (ch, k, up) in enumerate(
        zip(spec.decoder_channels, spec.decoder_kernel_sizes,
            spec.decoder_upsample_factors)
    ):
        is_final = i == n_dec - 1
        if is_final and fullres:
            break
        cat = cx
        if spec.use_skip_connections and not is_final and i < len(rev):
            sf, st, sc = rev[i]
            total += A * b * sf * st * (sc + ch)  # 1x1 proj in+out
            if (sf, st) != (h, w):
                total += A * b * (sf * st + h * w) * ch  # resize in+out
            cat = cx + ch
        if up and up > 1:
            h, w = h * up, w * up
        total += A * b * (h * w * cat / (up * up if up else 1)
                          + h * w * ch)  # conv reads pre-up, writes out
        total += A * cat * ch * k * k
        cx = ch
    return total


def head_bytes(spec: ModelSpec, b: int, h: int, w: int, f: int,
               t: int) -> float:
    hc, fu, tu = spec.head_channels, spec.head_freq_up, spec.head_time_up
    total = A * b * h * w * (spec.decoder_channels[-2] + hc * fu * tu)
    total += A * b * f * t * hc * 2  # taps resize read+write
    total += A * b * f * t * (hc + 1 + hc)  # refine conv (+input skip)
    total += A * b * f * t * (hc + spec.output_channels)  # out conv
    return total


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=376)
    ap.add_argument("--scaled", action="store_true")
    ap.add_argument("--fullres", action="store_true")
    ap.add_argument("--stages-json",
                    default="benchmarks/results/stages_tpu_r4.json")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spec = ModelSpec()
    if args.scaled:
        spec = ModelSpec(embed_dim=1024, num_heads=16, num_layers=12)
    if args.fullres:
        spec.head_type = "fullres_mask"
    b, f_bins, t = args.batch, 257, args.frames

    fl = forward_flops(spec, b, f_bins, t)

    # spatial bookkeeping (mirrors forward_flops)
    f, tt = f_bins, t
    skips = []
    cin = spec.input_channels
    for ch, k, p in zip(spec.encoder_channels, spec.encoder_kernel_sizes,
                        spec.encoder_pool_sizes):
        if p > 1:
            f, tt = f // p, tt // p
        skips.append((f, tt, ch))
        cin = ch
    ps = spec.patch_size
    h, w = f // ps, tt // ps
    n = h * w

    stages = {
        "encoder": (
            fl["encoder"], encoder_bytes(spec, b, f_bins, t)
        ),
        "transformer": (
            fl["attention"] + fl["mlp"] + fl["patch_embed"]
            + fl["to_feature_map"],
            transformer_bytes(spec, b, n),
        ),
        "decoder": (
            fl["decoder"] + (0 if spec.head_type == "fullres_mask"
                             else fl["resize"]),
            decoder_bytes(spec, b, h, w, skips)
            + (0 if spec.head_type == "fullres_mask"
               else A * b * (64 * t // 4 + f_bins * t)),
        ),
        "dsp (stft+istft)": (
            2 * stft_flops(b, t),
            A * b * (2 * t * 512 + 4 * f_bins * t) * 2,
        ),
    }
    if spec.head_type == "fullres_mask":
        stages["head"] = (fl["head"], head_bytes(spec, b, h, w, f_bins, t))

    measured = {}
    sp = Path(args.stages_json)
    if sp.exists():
        raw = json.loads(sp.read_text())
        for k, v in raw.items():
            if isinstance(v, (int, float)):
                measured[k] = v

    rows = []
    tot_fl = tot_by = tot_bound = 0.0
    for name, (flops, byts) in stages.items():
        t_c = flops / PEAK_BF16
        t_b = byts / HBM_BW
        t_bound = max(t_c, t_b)
        tot_fl += flops
        tot_by += byts
        tot_bound += t_bound
        rows.append({
            "stage": name,
            "GF": round(flops / 1e9, 1),
            "MB_moved": round(byts / 1e6, 1),
            "t_compute_ms": round(t_c * 1e3, 3),
            "t_bandwidth_ms": round(t_b * 1e3, 3),
            "t_roofline_ms": round(t_bound * 1e3, 3),
            "bound": "compute" if t_c >= t_b else "bandwidth",
            "mfu_ceiling_pct": round(100 * t_c / t_bound, 1),
            "arith_intensity_flops_per_byte": round(flops / byts, 1),
        })
    result = {
        "config": {
            "batch": b, "frames": t,
            "model": "168M" if args.scaled else "28M",
            "head": spec.head_type,
        },
        "peak_bf16_tflops": PEAK_BF16 / 1e12,
        "hbm_GBps": HBM_BW / 1e9,
        "stages": rows,
        "total_GF": round(tot_fl / 1e9, 1),
        "total_MB": round(tot_by / 1e6, 1),
        "roofline_step_ms": round(tot_bound * 1e3, 3),
        "roofline_mfu_pct": round(
            100 * (tot_fl / PEAK_BF16) / tot_bound, 1
        ),
        "note": (
            "roofline_mfu_pct is the highest MFU ANY implementation of "
            "this architecture could reach at this shape if every stage "
            "hit its own roofline; measured times from the r4 stage "
            "harness are in stages_tpu_r4.json"
        ),
    }
    if measured:
        result["measured_stage_ms"] = measured
    print(json.dumps(result, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
