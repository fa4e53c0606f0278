"""Evaluation layer: objective metrics + dataset evaluator."""

from .evaluator import Evaluator  # noqa: F401
from .pesq_native import pesq_p862  # noqa: F401
from .metrics import (  # noqa: F401
    compute_all_metrics,
    log_spectral_distance,
    pesq_score,
    print_metrics,
    segmental_snr,
    si_sdr,
    snr,
    stoi,
)
