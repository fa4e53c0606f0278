#!/usr/bin/env python
"""Host-side audio-I/O benchmark: native C++ decoder vs pure-numpy parser.

The input pipeline's host work is WAV decode + mixdown (the reference burns
DataLoader worker processes on librosa for this, reference:
data/dataset.py:350-380). This measures the first-party C++ runtime
(`native/sevit_audio.cpp`, threaded batch decode) against the numpy
fallback (`data/wavio.py`) on a synthetic corpus.

    python benchmarks/bench_io.py [--files 64] [--seconds 3.0] [--threads 4]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu import (
        native,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.wavio import (
        load_audio,
        save_wav,
    )

    sr = 16000
    n = int(sr * args.seconds)
    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="sevit_io_"))
    paths = []
    for i in range(args.files):
        x = (0.3 * rng.standard_normal(n)).astype(np.float32)
        p = tmp / f"f{i:04d}.wav"
        save_wav(p, x, sr)
        paths.append(p)
    audio_s = args.files * args.seconds
    print(f"corpus: {args.files} files x {args.seconds:.1f}s "
          f"(native available: {native.available()})")

    def bench(fn):
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_np = bench(lambda: [load_audio(p, sr, use_native=False) for p in paths])
    print(f"numpy parser        : {t_np*1e3:8.1f} ms  "
          f"({audio_s/t_np:,.0f} audio-s/s)")
    if native.available():
        t_nat = bench(lambda: [load_audio(p, sr, use_native=True) for p in paths])
        print(f"native (per-file)   : {t_nat*1e3:8.1f} ms  "
              f"({audio_s/t_nat:,.0f} audio-s/s)")
        t_batch = bench(
            lambda: native.decode_batch(
                [str(p) for p in paths], n, num_threads=args.threads
            )
        )
        print(f"native (batch, {args.threads}t) : {t_batch*1e3:8.1f} ms  "
              f"({audio_s/t_batch:,.0f} audio-s/s)  "
              f"{t_np/t_batch:.1f}x vs numpy")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
