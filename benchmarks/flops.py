#!/usr/bin/env python
"""Analytic FLOP counter for the HybridViT compute path + XLA cross-check.

Round-2 verdict #1: BASELINE.json's north star is "STFT and attention
kernels at speed-of-light per chip", which needs a defensible MFU number,
which needs a FLOP count that is *exact*, not a 2·params·tokens hand-wave.
The model is fully specified, so every term is countable:

  * conv2d (stride 1, same-pad):      2 · H · W · Cin · Cout · kh · kw
  * 1x1 skip projections:             2 · Hs · Ws · Cin · Cout     (at the
                                      skip's own resolution, pre-resize)
  * separable bilinear resize         2 · C · (out_h·in_h·in_w  +
    (ops/resize.py einsum matmuls):        out_w·in_w·out_h)
  * attention (per layer):            qkv 6·N·D² + scores/AV 4·N²·D +
                                      proj 2·N·D² + MLP 4·ratio·N·D²
  * matmul-DFT STFT (ops/stft.py):    2 · frames · n_fft · 2(n_fft/2+1)
                                      per signal (re+im banks)

All counts use the multiply-add = 2 FLOPs convention, matching XLA's
``cost_analysis()['flops']``. ``xla_forward_flops`` compiles the real
model and reads XLA's own count; ``tests/test_flops.py`` asserts the
analytic count matches XLA within 2% at both the 28M default and the
12L/1024d scaled config (the residual is elementwise BN/ReLU/bias/
softmax work the analytic count deliberately omits).

Train-step FLOPs use the standard convention total = 3x forward (the
backward pass does two GEMMs per forward GEMM); the train MFU reported by
``bench_train.py --mfu`` additionally reads XLA's exact count for the
whole jitted step (featurize + fwd + bwd + AdamW) so nothing is assumed.

No reference counterpart (the reference publishes no FLOP/MFU numbers).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple


def _conv(h: int, w: int, cin: int, cout: int, k: int) -> float:
    return 2.0 * h * w * cin * cout * k * k


def _resize(in_h: int, in_w: int, out_h: int, out_w: int, c: int) -> float:
    """ops/resize.py resize_bilinear: separable dense einsums (H then W)."""
    f = 0.0
    h = in_h
    if in_h != out_h:
        f += 2.0 * out_h * in_h * in_w * c
        h = out_h
    if in_w != out_w:
        f += 2.0 * out_w * in_w * h * c
    return f


@dataclass
class ModelSpec:
    """Static architecture description (mirrors HybridViT defaults)."""

    encoder_channels: Tuple[int, ...] = (64, 128, 256)
    encoder_kernel_sizes: Tuple[int, ...] = (3, 3, 3)
    encoder_pool_sizes: Tuple[int, ...] = (2, 2, 1)
    embed_dim: int = 512
    num_heads: int = 8
    num_layers: int = 6
    mlp_ratio: float = 4.0
    patch_size: int = 4
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 1)
    decoder_kernel_sizes: Tuple[int, ...] = (3, 3, 3, 3)
    decoder_upsample_factors: Tuple[int, ...] = (1, 2, 2, 1)
    use_skip_connections: bool = True
    input_channels: int = 1
    # round-5 fullres head (models/hybrid_vit.py head_type):
    head_type: str = "resize"
    head_channels: int = 16
    head_freq_up: int = 4
    head_time_up: int = 4
    output_channels: int = 1
    extras: Dict[str, float] = field(default_factory=dict)


def forward_flops(
    spec: ModelSpec, batch: int, f_bins: int = 257, frames: int = 256
) -> Dict[str, float]:
    """Analytic forward-pass FLOPs, itemized per stage, for one apply of
    HybridViT on ``[batch, f_bins, frames, C]``."""
    out: Dict[str, float] = {}
    b = batch

    # ---- encoder (ConvBlock: same-pad conv + VALID maxpool) ----
    f, t, cin = f_bins, frames, spec.input_channels
    enc = 0.0
    skips = []  # (f, t, ch) AFTER pool — what the decoder consumes
    for ch, k, p in zip(
        spec.encoder_channels, spec.encoder_kernel_sizes, spec.encoder_pool_sizes
    ):
        enc += b * _conv(f, t, cin, ch, k)
        if p > 1:
            f, t = f // p, t // p
        skips.append((f, t, ch))
        cin = ch
    out["encoder"] = enc

    # ---- patch embedding (VALID conv, k = s = patch) ----
    d, ps = spec.embed_dim, spec.patch_size
    h, w = f // ps, t // ps
    out["patch_embed"] = b * 2.0 * h * w * cin * d * ps * ps

    # ---- transformer ----
    n = h * w
    per_layer = (
        2.0 * n * d * 3 * d  # fused qkv
        + 4.0 * n * n * d  # QK^T + AV (2·N²·D each)
        + 2.0 * n * d * d  # output projection
        + 2.0 * 2.0 * n * d * (spec.mlp_ratio * d)  # MLP up + down
    )
    out["attention"] = b * spec.num_layers * (2.0 * n * d * 3 * d + 4.0 * n * n * d + 2.0 * n * d * d)
    out["mlp"] = b * spec.num_layers * per_layer - out["attention"]
    out["to_feature_map"] = b * 2.0 * n * d * spec.encoder_channels[-1]

    # ---- decoder (skip 1x1 proj at skip resolution -> bilinear resize to
    # x's pre-block size -> concat -> nearest upsample -> same-pad conv) ----
    dec = 0.0
    resize = 0.0
    cx = spec.encoder_channels[-1]
    rev = skips[::-1]
    n_dec = len(spec.decoder_channels)
    fullres = spec.head_type == "fullres_mask"
    for i, (ch, k, up) in enumerate(
        zip(
            spec.decoder_channels,
            spec.decoder_kernel_sizes,
            spec.decoder_upsample_factors,
        )
    ):
        is_final = i == n_dec - 1
        if is_final and fullres:
            break  # fullres head replaces the final 1-channel block
        cat = cx
        if spec.use_skip_connections and not is_final and i < len(rev):
            sf, st, sc = rev[i]
            dec += b * _conv(sf, st, sc, ch, 1)  # 1x1 projection
            if (sf, st) != (h, w):
                resize += b * _resize(sf, st, h, w, ch)
            cat = cx + ch
        if up and up > 1:
            h, w = h * up, w * up  # nearest repeat: no FLOPs
        dec += b * _conv(h, w, cat, ch, k)
        cx = ch
    out["decoder"] = dec

    if fullres:
        # ---- fullres head: sub-pixel conv + bilinear nudge + refine ----
        hc, fu, tu = spec.head_channels, spec.head_freq_up, spec.head_time_up
        head = b * _conv(h, w, cx, hc * fu * tu, 3)  # sub-pixel conv
        hf, hw_ = h * fu, w * tu
        if (hf, hw_) != (f_bins, frames):  # dense-matmul bilinear nudge
            head += b * _resize(hf, hw_, f_bins, frames, hc)
        head += b * _conv(f_bins, frames, hc + spec.input_channels, hc, 3)
        head += b * _conv(f_bins, frames, hc, spec.output_channels, 3)
        out["head"] = head
        out["resize"] = resize
        out["total"] = float(sum(out.values()))
        return out

    # ---- final bilinear resize back to [f_bins, frames] ----
    if (h, w) != (f_bins, frames):
        resize += b * _resize(h, w, f_bins, frames, cx)
    out["resize"] = resize

    out["total"] = float(sum(out.values()))
    return out


def stft_flops(batch: int, frames: int, n_fft: int = 512) -> float:
    """Matmul-DFT STFT (ops/stft.py): windowed frames times the
    [n_fft, 2·(n_fft//2+1)] stacked cos/sin bank."""
    return 2.0 * batch * frames * n_fft * (2 * (n_fft // 2 + 1))


def train_step_flops(
    spec: ModelSpec,
    batch: int,
    f_bins: int = 257,
    frames: int = 256,
    n_params: int | None = None,
) -> Dict[str, float]:
    """Analytic train-step FLOPs: featurize (2 STFTs: noisy + clean) +
    3x forward (fwd + 2x in backward) + ~10 FLOPs/param for AdamW."""
    fwd = forward_flops(spec, batch, f_bins, frames)["total"]
    feat = 2.0 * stft_flops(batch, frames)
    opt = 10.0 * (n_params or 0)
    total = feat + 3.0 * fwd + opt
    return {"featurize": feat, "forward": fwd, "train_total": total}


def peak_bf16_flops() -> float | None:
    """Peak dense bf16 matmul FLOP/s per chip for the current backend
    (public spec-sheet numbers), or None when unknown (e.g. CPU)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = (
        ("v5 lite", 197e12),  # v5e reports device_kind 'TPU v5 lite'
        ("v5litepod", 197e12),
        ("v5e", 197e12),
        ("v5p", 459e12),
        ("v6e", 918e12),
        ("v6 lite", 918e12),
        ("v4", 275e12),
    )
    for key, peak in table:
        if key in kind:
            return peak
    return None


def mfu_report(flops_per_step: float, step_seconds: float) -> str:
    """'X.XX TFLOP/s achieved (MFU YY.Y% of ZZZ TFLOP/s peak)' or just the
    achieved rate when the peak is unknown."""
    achieved = flops_per_step / step_seconds
    peak = peak_bf16_flops()
    msg = f"{achieved/1e12:.2f} TFLOP/s achieved"
    if peak:
        msg += f"  (MFU {100.0*achieved/peak:.1f}% of {peak/1e12:.0f} TFLOP/s bf16 peak)"
    return msg


# ---------------------------------------------------------------------------
# XLA cross-check
# ---------------------------------------------------------------------------


def xla_program_flops(fn, *args, **kwargs) -> float:
    """XLA's own FLOP count for the compiled program (current backend)."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def xla_forward_flops(model, variables, batch: int, f_bins: int, frames: int) -> float:
    import jax.numpy as jnp

    x = jnp.zeros((batch, f_bins, frames, 1), jnp.float32)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    return xla_program_flops(fwd, variables, x)


def spec_from_model(model) -> ModelSpec:
    """Build a ModelSpec from a HybridViT instance."""
    return ModelSpec(
        encoder_channels=tuple(model.encoder_channels),
        encoder_kernel_sizes=tuple(model.encoder_kernel_sizes),
        encoder_pool_sizes=tuple(model.encoder_pool_sizes),
        embed_dim=model.embed_dim,
        num_heads=model.num_heads,
        num_layers=model.num_layers,
        mlp_ratio=float(model.mlp_ratio),
        patch_size=model.patch_size,
        decoder_channels=tuple(model.decoder_channels),
        decoder_kernel_sizes=tuple(model.decoder_kernel_sizes),
        decoder_upsample_factors=tuple(model.decoder_upsample_factors),
        use_skip_connections=model.use_skip_connections,
        input_channels=model.input_channels,
        head_type=getattr(model, "head_type", "resize"),
        head_channels=getattr(model, "head_channels", 16),
        head_freq_up=getattr(model, "head_freq_up", 4),
        head_time_up=getattr(model, "head_time_up", 4),
        output_channels=getattr(model, "output_channels", 1),
    )


def main() -> int:
    import argparse
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scaled", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        create_hybrid_vit,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        jit_init,
    )
    import jax.numpy as jnp

    overrides = dict(dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0)
    if args.scaled:
        overrides.update(embed_dim=1024, num_heads=16, num_layers=12)
    model = create_hybrid_vit(**overrides)
    spec = spec_from_model(model)
    analytic = forward_flops(spec, args.batch, 257, args.frames)
    variables = jit_init(model, jnp.zeros((1, 257, 64, 1), jnp.float32))
    xla = xla_forward_flops(model, variables, args.batch, 257, args.frames)
    print(f"config: {'scaled 12L/1024d' if args.scaled else 'default 6L/512d'}"
          f"  batch={args.batch} frames={args.frames}")
    for k, v in analytic.items():
        print(f"  {k:>16s}: {v/1e9:10.3f} GFLOP"
              f"  ({100*v/analytic['total']:5.1f}%)" if k != "total" else
              f"  {k:>16s}: {v/1e9:10.3f} GFLOP")
    print(f"  {'xla':>16s}: {xla/1e9:10.3f} GFLOP"
          f"  (analytic/xla = {analytic['total']/xla:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
