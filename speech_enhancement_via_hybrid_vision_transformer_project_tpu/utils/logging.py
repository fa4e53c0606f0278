"""Training observability: JSONL metrics + optional TensorBoard.

Equivalent of the reference's TensorBoard scalars (reference:
training/trainer.py:108-111, :195-200, :294-301) with a JSONL stream as
the always-on primary sink (greppable, no deps) and tensorboardX when
available. Also provides a step timer that reports audio-seconds/s — the
BASELINE.json north-star throughput metric (SURVEY.md §5).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict


class MetricsLogger:
    def __init__(
        self,
        log_dir: str | Path,
        experiment_name: str = "experiment",
        use_tensorboard: bool = True,
    ):
        self.log_dir = Path(log_dir) / experiment_name
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = self.log_dir / "metrics.jsonl"
        self._jsonl = open(self.jsonl_path, "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                self.tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}" if prefix else k
            rec[key] = float(v)
            if self.tb is not None:
                self.tb.add_scalar(key, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_audio(self, step: int, tag: str, audio, sample_rate: int = 16000):
        """Audio sample logging — the reference config promises this but
        never implements it (SURVEY.md §5 observability); we do.

        tensorboardX's add_audio needs soundfile (absent in this image),
        so fall back to writing WAVs under ``<log_dir>/audio/``."""
        import numpy as np

        wrote = False
        if self.tb is not None:
            try:
                self.tb.add_audio(
                    tag, np.asarray(audio).reshape(-1, 1), int(step),
                    sample_rate,
                )
                wrote = True
            except Exception:
                wrote = False
        if not wrote:
            from ..data.wavio import save_wav

            safe = tag.replace("/", "_")
            save_wav(
                self.log_dir / "audio" / f"step{int(step):08d}_{safe}.wav",
                np.asarray(audio, np.float32),
                sample_rate,
            )

    def close(self):
        self._jsonl.close()
        if self.tb is not None:
            self.tb.close()


class Stopwatch:
    """Wall-clock step timing + audio-seconds/s throughput counter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.audio_seconds = 0.0
        self.steps = 0

    def tick(self, audio_seconds: float = 0.0):
        self.audio_seconds += audio_seconds
        self.steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def audio_seconds_per_second(self) -> float:
        e = self.elapsed
        return self.audio_seconds / e if e > 0 else 0.0

    @property
    def steps_per_second(self) -> float:
        e = self.elapsed
        return self.steps / e if e > 0 else 0.0
