"""Serving CLI: batched enhancement over HTTP.

No reference counterpart (the reference's inference surface is a
file-at-a-time CLI, reference: enhance.py:23-173); this is the TPU-native
production-serving entry point — see ``inference/server.py`` for the
dynamic-batching design.

    python serve.py --checkpoint ckpt/best_model --port 8080
    curl -s --data-binary @noisy.wav http://127.0.0.1:8080/enhance > out.wav
"""

from __future__ import annotations

import argparse

from ._blendargs import add_blend_args, blend_kwargs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batched enhancement server")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--device", default=None, choices=["tpu", "cpu", "axon"])
    p.add_argument("--config-dir", default="config")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=128,
                   help="dynamic-batcher coalescing limit (the r5 batch "
                        "sweep put the v5e MFU knee at 128: 26.5% MFU / "
                        "5,228 audio-s/s vs 22.0% / 4,333 at 32 — "
                        "PERF.md r5; lower it for latency-sensitive "
                        "deployments)")
    p.add_argument("--max-wait-ms", type=float, default=10.0,
                   help="max time a request waits for batch peers")
    p.add_argument("--io-dtype", default="int16",
                   choices=["float32", "int16"],
                   help="device transfer width (int16 halves link traffic)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard server batches over this many devices")
    p.add_argument("--fold-bn", action="store_true",
                   help="fold eval-mode BatchNorm into conv weights "
                        "(fp32-identical; measured knob, PERF.md r4)")
    p.add_argument("--dft-precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="iDFT matmul precision; 'high' trades ~1.5 PCM16 "
                        "LSB output error for a cheaper reconstruction")
    add_blend_args(p)
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile the common length buckets at startup")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device:
        import jax

        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )

    import numpy as np

    from ..inference import AudioEnhancer, load_model_for_inference
    from ..inference.server import make_server
    from ..utils import load_all_configs

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
        **blend_kwargs(args),
        fold_bn=args.fold_bn,
        dft_precision=args.dft_precision,
    )
    if args.warmup:
        sr = enhancer.sample_rate
        for seconds in (1.0, 2.0, 4.0):
            print(f"warmup: compiling {seconds:.0f}s bucket ...", flush=True)
            enhancer.enhance_batch(
                [np.zeros(int(sr * seconds), np.float32)]
            )

    server = make_server(
        enhancer,
        args.host,
        args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
    )
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(POST /enhance, GET /healthz, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.close()
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
