#!/usr/bin/env python
"""Fit the snr_adaptive do-no-harm blend parameters from data.

For every test pair this measures, per clip:
  * the model's self-estimated SNR (est_snr = 10*log10 |enh|^2/|mag-enh|^2
    — the signal AudioEnhancer's 'snr_adaptive' mode thresholds on),
  * the true input SNR (needs the clean reference — offline only), and
  * the SI-SDR gain of the magnitude-domain blend
    a*enhanced + (1-a)*noisy for a grid of a in [0, 1].

It then grid-searches (pivot, width, min_blend) for the sigmoid
a(est_snr) = min + (1-min)*sigmoid((pivot-est_snr)/width) that maximizes
the MEAN SI-SDR improvement subject to NO input-SNR bin being negative
(the do-no-harm constraint, VERDICT r3 task #4). The winning parameters
become AudioEnhancer defaults only with a measured justification.

    python benchmarks/tune_blend.py --checkpoint CKPT --config-dir CFG \
        --noisy-dir ... --clean-dir ... [--device cpu] [--json-out ...]
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config-dir", default="config")
    ap.add_argument("--noisy-dir", required=True)
    ap.add_argument("--clean-dir", required=True)
    ap.add_argument("--device", default=None, choices=["tpu", "cpu"])
    ap.add_argument("--max-files", type=int, default=None)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--write-checkpoint-meta", action="store_true",
                    help="store the winning snr_adaptive parameters in the "
                         "checkpoint's meta.json (config.inference.blend) "
                         "so AudioEnhancer adopts them by default — the "
                         "round-5 magnitude-head foot-gun fix (a magnitude "
                         "checkpoint served raw at blend=1.0 measurably "
                         "harms clean input)")
    args = ap.parse_args()

    import jax

    if args.device:
        jax.config.update(
            "jax_platforms", "axon" if args.device == "tpu" else args.device
        )
    import jax.numpy as jnp

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.data.wavio import (
        load_audio,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.metrics import (
        si_sdr,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
        load_model_for_inference,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
        istft,
        magphase,
        stft,
    )
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
        enable_compilation_cache,
        load_all_configs,
    )

    enable_compilation_cache()
    try:
        config = load_all_configs(args.config_dir)
    except Exception:
        config = {}
    model, variables, config = load_model_for_inference(args.checkpoint, config)
    audio_cfg = config.get("audio", {})
    cfg = STFTConfig(
        n_fft=audio_cfg.get("n_fft", 512),
        hop_length=audio_cfg.get("hop_length", 128),
        win_length=audio_cfg.get("win_length", 512),
    )
    output_mode = config.get("model", {}).get("output_mode", "magnitude")
    sr = audio_cfg.get("sample_rate", 16000)

    nd, cd = Path(args.noisy_dir), Path(args.clean_dir)
    files = sorted(f for f in nd.glob("*.wav") if (cd / f.name).exists())
    if args.max_files:
        files = files[: args.max_files]

    alphas = np.linspace(0.0, 1.0, 11)
    rows = []
    for f in files:
        noisy, _ = load_audio(f, sr)
        clean, _ = load_audio(cd / f.name, sr)
        n = len(noisy)
        x = jnp.asarray(noisy)[None]
        mx = jnp.max(jnp.abs(x))
        scale = jnp.where(mx > 1e-8, mx, 1.0)
        re, im = stft(x / scale, cfg)
        mag, ph = magphase(re, im)
        mm = jnp.max(mag)
        mm = jnp.where(mm > 1e-8, mm, 1.0)
        out = model.apply(
            variables, (mag / mm)[..., None], train=False
        )[..., 0]
        if output_mode == "mask":
            enh = jnp.clip((out + 1.0) * 0.5, 0.0, 1.0) * mag
        else:
            enh = out * mm
        sig = float(jnp.sum(enh**2))
        res = float(jnp.sum((mag - enh) ** 2))
        est_snr = 10.0 * np.log10(max(sig, 1e-12) / max(res, 1e-12))
        base = si_sdr(clean, noisy)
        gains = []
        for a in alphas:
            bl = a * enh + (1 - a) * mag
            y = istft(bl * jnp.cos(ph), bl * jnp.sin(ph), cfg, length=n)
            y = np.asarray(y[0]) * float(scale)
            gains.append(si_sdr(clean, y) - base)
        rows.append({
            "file": f.name,
            "input_si_sdr": float(base),
            "est_snr": float(est_snr),
            "gains": [float(g) for g in gains],
        })
        print(f"{f.name}: in={base:5.1f} est={est_snr:5.1f} "
              f"g(a=1)={gains[-1]:+5.2f} g(a=0)={gains[0]:+5.2f}", flush=True)

    # ---- fit sigmoid parameters under the no-negative-bin constraint ----
    edges = [-5.0, 0.0, 5.0, 10.0, 15.0]

    def bin_of(s):
        return int(np.searchsorted(edges, s, side="right"))

    def evaluate(pivot, width, mn):
        per_bin: dict[int, list[float]] = {}
        total = []
        for r in rows:
            a = mn + (1 - mn) / (1 + np.exp(-(pivot - r["est_snr"]) / width))
            g = float(np.interp(a, alphas, r["gains"]))
            total.append(g)
            per_bin.setdefault(bin_of(r["input_si_sdr"]), []).append(g)
        bins = {b: float(np.mean(v)) for b, v in per_bin.items()}
        return float(np.mean(total)), bins

    best = None
    for pivot in np.arange(4.0, 26.1, 2.0):
        for width in (1.0, 2.0, 4.0, 8.0):
            for mn in (0.0, 0.1, 0.2, 0.3):
                mean, bins = evaluate(pivot, width, mn)
                ok = all(v >= -0.1 for v in bins.values())
                if ok and (best is None or mean > best[0]):
                    best = (mean, bins, dict(pivot=float(pivot),
                                             width=float(width),
                                             min=float(mn)))
    raw_mean, raw_bins = evaluate(-100.0, 1.0, 1.0)  # alpha == 1 everywhere
    print(f"\nno blend (a=1): mean {raw_mean:+.2f}  bins {raw_bins}")
    if best:
        mean, bins, params = best
        print(f"best no-harm fit: {params}  mean {mean:+.2f}  bins {bins}")
    else:
        print("no parameter setting satisfies the no-harm constraint")
        params = None

    if args.write_checkpoint_meta:
        if best is None:
            print("no no-harm fit found — checkpoint meta NOT updated")
        else:
            meta_path = Path(args.checkpoint) / "meta.json"
            meta = json.loads(meta_path.read_text())
            meta.setdefault("config", {}).setdefault("inference", {})[
                "blend"
            ] = {
                "mode": "snr_adaptive",
                "min": best[2]["min"],
                "pivot_db": best[2]["pivot"],
                "width_db": best[2]["width"],
                "fitted_mean_gain_db": best[0],
                "fitted_on": str(args.noisy_dir),
            }
            meta_path.write_text(json.dumps(meta, indent=1, default=float))
            print(f"fitted blend parameters written to {meta_path}")

    if args.json_out:
        Path(args.json_out).write_text(json.dumps({
            "checkpoint": str(args.checkpoint),
            "output_mode": output_mode,
            "alphas": [float(a) for a in alphas],
            "rows": rows,
            "no_blend": {"mean": raw_mean, "bins": raw_bins},
            "best": None if best is None else
                {"params": best[2], "mean": best[0], "bins": best[1]},
        }, indent=1))
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
