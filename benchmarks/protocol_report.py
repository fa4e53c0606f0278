#!/usr/bin/env python3
"""Hardened quality-protocol report (round 5; VERDICT r4 task 3).

Joins an ``evaluate.py --output`` JSON (per-file metric rows) with the
synthetic test set's ``manifest.json`` (per-file noise family / mixing
SNR, written by scripts/synth_dataset.py) and reports, for the SEEN
families, the HELD-OUT (unseen) family, and the pooled set:

  * n, mean, median, std of SI-SDR improvement,
  * a bootstrap 95% CI on the mean (10k resamples, fixed seed),
  * per-mixing-SNR-bin means ([-5,0), [0,5), [5,10), [10,15]),
  * per-noise-family means,
  * LSD / STOI improvement means (secondary metrics).

The unseen column is the generalization check the r1-r4 protocols lacked:
every noise family in those test sets also appeared in training
(VERDICT r4 "weak" #1). The reference's own protocol is 824 real
VoiceBank-DEMAND clips (/root/reference/evaluation/evaluator.py:157-231)
— unreachable in this environment; this is the synthetic stand-in.

Usage:
  python benchmarks/protocol_report.py --eval EVAL.json \
      --manifest DATA_ROOT/manifest.json [--out REPORT.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

SNR_BINS = ((-5.0, 0.0), (0.0, 5.0), (5.0, 10.0), (10.0, 15.001))


def bootstrap_ci(
    x: np.ndarray, n_boot: int = 10_000, alpha: float = 0.05, seed: int = 0
) -> tuple[float, float]:
    """Percentile bootstrap CI on the mean."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(x), size=(n_boot, len(x)))
    means = x[idx].mean(axis=1)
    return (
        float(np.quantile(means, alpha / 2)),
        float(np.quantile(means, 1 - alpha / 2)),
    )


def subset_stats(rows: list[dict], key: str = "si_sdr_improvement") -> dict:
    g = np.asarray([r[key] for r in rows], np.float64)
    out = {
        "n": len(rows),
        "mean": float(g.mean()),
        "median": float(np.median(g)),
        "std": float(g.std(ddof=1)) if len(g) > 1 else 0.0,
        "min": float(g.min()),
        "positive_fraction": float((g > 0).mean()),
    }
    if len(g) > 3:
        lo, hi = bootstrap_ci(g)
        out["mean_ci95"] = [round(lo, 3), round(hi, 3)]
    bins = {}
    for lo, hi in SNR_BINS:
        sub = [
            r[key] for r in rows if lo <= r["_manifest"]["snr_db"] < hi
        ]
        if sub:
            bins[f"{int(lo)}..{int(hi)}dB"] = {
                "n": len(sub),
                "mean": round(float(np.mean(sub)), 3),
            }
    out["by_mixing_snr"] = bins
    fams = {}
    for r in rows:
        fams.setdefault(r["_manifest"]["family"], []).append(r[key])
    out["by_family"] = {
        f: {"n": len(v), "mean": round(float(np.mean(v)), 3),
            "median": round(float(np.median(v)), 3)}
        for f, v in sorted(fams.items())
    }
    for sec in ("lsd_improvement", "stoi_improvement", "snr_improvement"):
        vals = [r[sec] for r in rows if sec in r]
        if vals:
            out[f"{sec}_mean"] = round(float(np.mean(vals)), 4)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--eval", dest="eval_json", required=True, type=Path)
    ap.add_argument("--manifest", required=True, type=Path)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    ev = json.loads(args.eval_json.read_text())
    manifest = json.loads(args.manifest.read_text())
    per_file = ev.get("per_file", {})
    rows = []
    missing = []
    for name, metrics in per_file.items():
        m = manifest.get(name)
        if m is None:
            missing.append(name)
            continue
        r = dict(metrics)
        r["_manifest"] = m
        r["file"] = name
        rows.append(r)
    if not rows:
        raise SystemExit("no eval rows matched the manifest")
    if missing:
        print(f"warning: {len(missing)} eval rows not in manifest (skipped)")

    seen = [r for r in rows if not r["_manifest"].get("unseen")]
    unseen = [r for r in rows if r["_manifest"].get("unseen")]
    report = {
        "eval_json": str(args.eval_json),
        "manifest": str(args.manifest),
        "metric": "si_sdr_improvement (dB)",
        "pooled": subset_stats(rows),
        "seen_families": subset_stats(seen) if seen else None,
        "unseen_family": subset_stats(unseen) if unseen else None,
    }
    print(json.dumps(report, indent=1))
    if args.out:
        args.out.write_text(json.dumps(report, indent=1))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
