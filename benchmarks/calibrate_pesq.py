#!/usr/bin/env python
"""Calibrate the native P.862 model's mid-scale against published wb-PESQ
behavior (round-2 verdict #3).

The identity-ceiling and logistic-map anchors in tests/test_metric_golden.py
pin only the *ends* of the scale; every score of an actually-degraded signal
rides on the per-frame disturbance gain ``pesq_native._D_CAL``. This harness
sweeps MOS-LQO over controlled degradations of speech-like signals:

  * additive white Gaussian noise at SNR 0..40 dB
  * additive speech-shaped (pink) noise at the same SNRs
  * controlled distortions: MNRU-style multiplicative noise (Q = 10..35 dB)

and compares the white/speech-shaped curves against published wb-PESQ
(P.862.2 MOS-LQO) anchor points. Anchor provenance:

  * AWGN-on-speech wb-PESQ values widely reproduced in the enhancement
    literature (e.g. Loizou, "Speech Enhancement: Theory and Practice",
    Table 11; wb scores run ~1.2 at 0 dB to ~4.0 at 40 dB and the curve is
    near-linear in SNR between 5 and 35 dB at ~0.07 MOS/dB).
  * The reference project's own published operating point: its
    VoiceBank-DEMAND noisy test input (real mixed noise, mean SNR ~ 9 dB,
    SI-SDR 8.5 dB) scores wb-PESQ 1.97 (reference README.md:308-313).

These anchors carry real uncertainty (different speech corpora shift the
curve by a few tenths of a MOS), so the fit minimizes mean |residual| over
the table rather than chasing any single point; the residuals themselves
are the honest answer and are written into the module docstring +
benchmarks/results/pesq_calibration.json.

Usage:
    python benchmarks/calibrate_pesq.py [--fit] [--clips 4] [--seconds 3]

--fit grid-searches _D_CAL and prints the best value; without it the
current module constant is evaluated.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation import (  # noqa: E402
    pesq_native,
)
from synth_dataset import speechlike  # noqa: E402  (formant synthesizer)

SR = 16000

# Published wb-PESQ (MOS-LQO, P.862.2) anchor targets for additive noise on
# active speech. Mid-scale literature values, see module docstring; the
# 9 dB "real mixed noise" row is the reference project's own published
# number for its noisy evaluation input (README.md:308-313).
ANCHORS_WHITE = {0: 1.25, 5: 1.45, 10: 1.75, 15: 2.05, 20: 2.45,
                 30: 3.25, 40: 4.0}
ANCHORS_PINK = {9: 1.97}  # speech-shaped ~ VoiceBank-DEMAND mixed noise


def _mix_at_snr(clean: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    ps = float(np.mean(clean**2))
    pn = float(np.mean(noise**2))
    g = np.sqrt(ps / (pn * 10.0 ** (snr_db / 10.0) + 1e-30))
    return clean + g * noise


def _pink(n: int, rng: np.random.Generator) -> np.ndarray:
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.maximum(np.fft.rfftfreq(n, 1.0 / SR), 1.0)
    x = np.fft.irfft(spec / np.sqrt(f), n=n)
    return (x / (np.std(x) + 1e-12)).astype(np.float64)


def _mnru(clean: np.ndarray, q_db: float, rng: np.random.Generator) -> np.ndarray:
    """Modulated-noise reference unit (ITU-T P.810): signal-correlated
    multiplicative noise at Q dB — the classic PESQ training distortion."""
    g = 10.0 ** (-q_db / 20.0)
    return clean * (1.0 + g * rng.standard_normal(len(clean)))


def sweep(n_clips: int, seconds: float, d_cal: float | None = None) -> dict:
    if d_cal is not None:
        pesq_native._D_CAL = d_cal
    rng = np.random.default_rng(2024)
    cleans = [speechlike(seconds, rng) for _ in range(n_clips)]
    out: dict[str, dict[float, float]] = {"white": {}, "pink": {}, "mnru": {}}
    for snr in sorted(set(list(ANCHORS_WHITE) + list(ANCHORS_PINK))):
        w_scores, p_scores = [], []
        for ci, c in enumerate(cleans):
            nz_rng = np.random.default_rng(1000 + ci)
            white = nz_rng.standard_normal(len(c))
            pink = _pink(len(c), nz_rng)
            if snr in ANCHORS_WHITE:
                w_scores.append(
                    pesq_native.pesq_p862(c, _mix_at_snr(c, white, snr), SR, "wb")
                )
            if snr in ANCHORS_PINK:
                p_scores.append(
                    pesq_native.pesq_p862(c, _mix_at_snr(c, pink, snr), SR, "wb")
                )
        if w_scores:
            out["white"][snr] = float(np.mean(w_scores))
        if p_scores:
            out["pink"][snr] = float(np.mean(p_scores))
    for q in (10, 15, 20, 25, 35):
        s = [
            pesq_native.pesq_p862(
                c, _mnru(c, q, np.random.default_rng(77 + i)), SR, "wb"
            )
            for i, c in enumerate(cleans)
        ]
        out["mnru"][q] = float(np.mean(s))
    return out


def residuals(scores: dict) -> list[tuple[str, float, float, float]]:
    rows = []
    for snr, tgt in ANCHORS_WHITE.items():
        rows.append(("white", float(snr), scores["white"][snr], tgt))
    for snr, tgt in ANCHORS_PINK.items():
        rows.append(("pink", float(snr), scores["pink"][snr], tgt))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fit", action="store_true")
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()

    if args.fit:
        best = None
        for d in np.arange(3.0, 14.01, 0.5):
            sc = sweep(args.clips, args.seconds, d_cal=float(d))
            rows = residuals(sc)
            mae = float(np.mean([abs(got - tgt) for _, _, got, tgt in rows]))
            print(f"_D_CAL={d:5.2f}  MAE={mae:.3f}  "
                  + " ".join(f"{m}@{s:g}:{got:.2f}/{tgt:.2f}"
                             for m, s, got, tgt in rows))
            if best is None or mae < best[1]:
                best = (float(d), mae)
        print(f"\nbest _D_CAL = {best[0]} (MAE {best[1]:.3f})")
        d_cal = best[0]
    else:
        d_cal = pesq_native._D_CAL

    sc = sweep(args.clips, args.seconds, d_cal=d_cal)
    rows = residuals(sc)
    mae = float(np.mean([abs(got - tgt) for _, _, got, tgt in rows]))
    mx = float(np.max([abs(got - tgt) for _, _, got, tgt in rows]))
    print(f"\n_D_CAL = {d_cal}")
    for m, s, got, tgt in rows:
        print(f"  {m:>5s} @ {s:4.1f} dB SNR: native {got:.2f}  "
              f"published ~{tgt:.2f}  residual {got - tgt:+.2f}")
    print("  MNRU Q sweep (monotonicity check): "
          + "  ".join(f"Q{q}:{v:.2f}" for q, v in sc["mnru"].items()))
    print(f"  MAE {mae:.3f}, max |residual| {mx:.3f}")

    res = {
        "d_cal": d_cal,
        "clips": args.clips,
        "seconds": args.seconds,
        "scores": sc,
        "anchors": {"white": ANCHORS_WHITE, "pink": ANCHORS_PINK},
        "mae": mae,
        "max_abs_residual": mx,
    }
    out = Path(__file__).parent / "results" / "pesq_calibration.json"
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
