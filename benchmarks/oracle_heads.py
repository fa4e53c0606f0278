#!/usr/bin/env python3
"""Oracle reference points for output-head geometries.

Measures, per test pair and averaged, the SI-SDR improvement of several
IDEALIZED estimators — upper-reference points used to pick an output head
BEFORE spending a training run on it (the round-4/5 method; VERDICT r4
next-round task 2):

  * ``noisy_phase``  — clean magnitude + noisy phase (the classic phase
    bound; reference architecture reuses the noisy phase,
    /root/reference/inference/enhancer.py:117-119).
  * ``irm257``       — clip(|S|/|X|, 0, 1) * |X| at full 257-bin
    resolution + noisy phase: what an attenuation-only full-resolution
    mask head (model.head: fullres_mask + output_mode: mask) could at
    best express.
  * ``mask64``       — the same IRM blurred through the decoder's 64-row
    geometry (257 -> 64 -> 257 bilinear): the r4 ``mask`` head's
    reference point.
  * ``mask64_t4``    — mask64 additionally blurred T -> T/4 -> T on the
    time axis (the decoder's full [64, T/4] output grid).
  * ``mag64``        — clean magnitude itself pushed through the 64-row
    blur: the DIRECT magnitude head's reference point (reference decoder
    resize, /root/reference/models/hybrid_vit.py:459-465).

NAMING NOTE (VERDICT r4 "weak" #2): these are *constructed reference
points*, not suprema. The IRM is one particular mask; a trained mask can
legitimately exceed it (e.g. out-nulling tonal noise where phases align),
so "+x dB oracle" here means "the IRM construction achieves +x dB", not
"no model can do better".

Usage:
  python benchmarks/oracle_heads.py --noisy-dir D --clean-dir D \
      [--out results.json] [--device cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--noisy-dir", required=True, type=Path)
    ap.add_argument("--clean-dir", required=True, type=Path)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu", "axon"])
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_platforms", "axon" if args.device == "tpu" else args.device
    )
    import jax.numpy as jnp

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data import (
        load_audio,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.metrics import (
        si_sdr,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.resize import (
        resize_bilinear,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
        reconstruct,
        stft,
    )

    cfg = STFTConfig()
    files = sorted(args.noisy_dir.glob("*.wav"))
    if args.limit:
        files = files[: args.limit]
    if not files:
        raise SystemExit(f"no wavs in {args.noisy_dir}")

    def blur(mag: jnp.ndarray, rows: int, t_factor: int = 1) -> jnp.ndarray:
        """[F, T] -> bilinear down to (rows, T//t_factor) -> back."""
        f, t = mag.shape
        x = mag[None, None]  # NCHW for resize_bilinear
        small = resize_bilinear(x, (rows, max(1, t // t_factor)))
        return resize_bilinear(small, (f, t))[0, 0]

    heads = ("noisy_phase", "irm257", "mask64", "mask64_t4", "mag64")
    gains: dict[str, list[float]] = {h: [] for h in heads}
    inputs: list[float] = []
    rows = []
    for f in files:
        noisy, sr = load_audio(f)
        clean, _ = load_audio(args.clean_dir / f.name)
        n = min(len(noisy), len(clean))
        noisy, clean = noisy[:n], clean[:n]
        re, im = stft(jnp.asarray(noisy), cfg)
        mag_x = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        re_c, im_c = stft(jnp.asarray(clean), cfg)
        mag_s = jnp.sqrt(re_c * re_c + im_c * im_c)

        irm = jnp.clip(mag_s / jnp.maximum(mag_x, 1e-8), 0.0, 1.0)
        ests = {
            "noisy_phase": mag_s,
            "irm257": irm * mag_x,
            "mask64": blur(irm, 64) * mag_x,
            "mask64_t4": blur(irm, 64, 4) * mag_x,
            "mag64": blur(mag_s, 64),
        }
        base = si_sdr(clean, noisy)
        inputs.append(base)
        row = {"file": f.name, "input_si_sdr": base}
        for name, mag in ests.items():
            wav = np.asarray(reconstruct(mag, phase, cfg, length=n))
            g = si_sdr(clean, wav) - base
            gains[name].append(g)
            row[name] = round(float(g), 3)
        rows.append(row)

    result = {
        "n": len(files),
        "noisy_dir": str(args.noisy_dir),
        "mean_input_si_sdr": float(np.mean(inputs)),
        "note": (
            "IRM-style constructed reference points, not suprema — a "
            "trained mask can exceed them (see module docstring)"
        ),
    }
    for name in heads:
        g = np.asarray(gains[name])
        result[f"{name}_gain_mean"] = float(g.mean())
        result[f"{name}_gain_median"] = float(np.median(g))
    result["per_file"] = rows
    print(
        json.dumps({k: v for k, v in result.items() if k != "per_file"},
                   indent=1)
    )
    if args.out:
        args.out.write_text(json.dumps(result, indent=1))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
