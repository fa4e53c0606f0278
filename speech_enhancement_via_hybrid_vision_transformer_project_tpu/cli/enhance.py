"""Enhancement CLI (reference: enhance.py:23-173 — same single-file /
directory modes, plus a --streaming flag for chunked long-audio mode)."""

from __future__ import annotations

import argparse

from ._blendargs import add_blend_args, blend_kwargs
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Enhance noisy speech")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"],
                   help="backend override (reference: --device cuda|cpu)")
    p.add_argument("--config-dir", default="config")
    p.add_argument("--input", required=True, help="wav file or directory")
    p.add_argument("--output", required=True, help="wav file or directory")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--streaming", action="store_true",
                   help="chunked overlap-add mode for long audio")
    p.add_argument("--chunk-seconds", type=float, default=2.0)
    p.add_argument("--overlap-seconds", type=float, default=0.25)
    p.add_argument("--exact", action="store_true",
                   help="process at exact length (reference-parity mode)")
    p.add_argument("--io-dtype", default="float32",
                   choices=["float32", "int16"],
                   help="device transfer width; int16 = PCM16-resolution "
                        "I/O, ~2x faster over narrow links")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard enhancement batches over this many devices "
                        "('data' mesh axis; params replicated)")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold eval-mode BatchNorm into conv weights "
                        "(fp32-identical; measured knob, PERF.md r4)")
    p.add_argument("--dft-precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="iDFT matmul precision; 'high' trades ~1.5 PCM16 "
                        "LSB output error for a cheaper reconstruction")
    add_blend_args(p)
    p.add_argument("--mask-padding", action="store_true",
                   help="exclude bucket-padding patches from attention via "
                        "the model's key-padding mask (bucketed mode only)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.device:
        import jax

        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    from ..data.wavio import load_audio, save_wav
    from ..inference import AudioEnhancer, load_model_for_inference
    from ..utils import load_all_configs

    inp = Path(args.input)
    out = Path(args.output)
    # arg validation (reference: enhance.py:90-102)
    if not inp.exists():
        raise SystemExit(f"input not found: {inp}")
    if inp.is_dir() and out.suffix:
        raise SystemExit("directory input requires a directory output")

    try:
        config = load_all_configs(args.config_dir)
    except Exception as e:
        print(f"warning: config load failed ({e}); using defaults")
        config = {}

    model, variables, config = load_model_for_inference(args.checkpoint, config)
    from ..parallel.mesh import mesh_for_data_parallel

    enhancer = AudioEnhancer(
        model, variables, config, io_dtype=args.io_dtype,
        mesh=mesh_for_data_parallel(args.data_parallel),
        mask_padding=args.mask_padding,
        **blend_kwargs(args),
        fold_bn=args.fold_bn,
        dft_precision=args.dft_precision,
    )
    sr = enhancer.sample_rate

    if inp.is_dir():
        n = enhancer.enhance_directory(inp, out, batch_size=args.batch_size)
        print(f"enhanced {n} files -> {out}")
    else:
        audio, _ = load_audio(inp, sr)
        if args.streaming:
            enhanced = enhancer.enhance_streaming(
                audio, args.chunk_seconds, args.overlap_seconds
            )
        else:
            enhanced = enhancer.enhance(audio, exact=args.exact)
        save_wav(out, enhanced, sr)
        print(f"enhanced {inp} -> {out} ({len(audio)/sr:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
