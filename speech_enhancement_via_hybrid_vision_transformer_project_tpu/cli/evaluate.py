"""Evaluation CLI (reference: evaluate.py:21-155 — same flags; imports are
not broken here, SURVEY.md §7.1)."""

from __future__ import annotations

import argparse

from ._blendargs import add_blend_args, blend_kwargs
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Evaluate a trained enhancer on VoiceBank-DEMAND"
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"],
                   help="backend override (reference: --device cuda|cpu)")
    p.add_argument("--config-dir", default="config")
    p.add_argument("--data-root", default=None)
    p.add_argument("--noisy-dir", default=None)
    p.add_argument("--clean-dir", default=None)
    p.add_argument("--output", default="evaluation_results.json")
    p.add_argument("--save-enhanced", default=None,
                   help="directory to dump enhanced wavs")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-files", type=int, default=None)
    p.add_argument("--no-pesq", action="store_true")
    p.add_argument("--metric-workers", type=int, default=None,
                   help="process-pool size for per-file metric scoring "
                        "(default min(4, cpu_count); 1 = serial). Results "
                        "are identical to serial; only wall time changes")
    p.add_argument("--exact", action="store_true",
                   help="reference-exact per-file enhancement (no bucket "
                        "padding; slower — one compile per length)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard evaluation batches over this many devices "
                        "('data' mesh axis; params replicated)")
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

    from ..evaluation import Evaluator
    from ..inference import AudioEnhancer, load_model_for_inference
    from ..utils import load_all_configs

    try:
        config = load_all_configs(args.config_dir)
    except Exception as e:  # tolerate missing configs (reference: :79-83)
        print(f"warning: config load failed ({e}); using defaults")
        config = {}

    model, variables, config = load_model_for_inference(args.checkpoint, config)
    from ..parallel.mesh import mesh_for_data_parallel

    enhancer = AudioEnhancer(
        model, variables, config,
        mesh=mesh_for_data_parallel(args.data_parallel),
        mask_padding=args.mask_padding,
        **blend_kwargs(args),
    )

    data_root = Path(
        args.data_root
        or config.get("data", {}).get("data_root", "data/voicebank_demand")
    )
    dcfg = config.get("data", {})
    noisy_dir = Path(
        args.noisy_dir or data_root / dcfg.get("noisy_test_dir", "noisy_testset_wav")
    )
    clean_dir = Path(
        args.clean_dir or data_root / dcfg.get("clean_test_dir", "clean_testset_wav")
    )

    sr = config.get("audio", {}).get("sample_rate", 16000)
    evaluator = Evaluator(enhancer, sr, include_pesq=not args.no_pesq)
    results = evaluator.evaluate_dataset(
        noisy_dir,
        clean_dir,
        output_dir=args.save_enhanced,
        batch_size=args.batch_size,
        max_files=args.max_files,
        exact=args.exact,
        metric_workers=args.metric_workers,
    )
    print(Evaluator.format_report(results))
    # keep per-file rows in the JSON: distributional claims (per-SNR
    # bins, do-no-harm) are only auditable from per-file data
    Evaluator.save_results(results, args.output)
    print(f"results written to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
