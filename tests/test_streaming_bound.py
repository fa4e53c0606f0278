"""Streaming-vs-exact quality bound (VERDICT r2 task 9).

The bucketed/streaming path must stay numerically close to the
reference-parity exact-length path (reference enhances any length batch-1,
reference: inference/enhancer.py:82-129) on a model that actually
*denoises* — with random weights the positional tables dominate the
output and the bound is meaningless, so these tests load the committed
``tests/fixtures/tiny_denoiser`` fixture (a real trained denoiser:
+2.3 dB held-out SI-SDR; produced by tests/fixtures/make_tiny_denoiser.py).

Measured values on the fixture (and the round-3 28M TPU-trained model,
which is strictly tighter — PERF.md "Streaming vs exact"):

  - SI-SDR(streaming) is within 0.25 dB of SI-SDR(exact);
  - interior relative RMS (away from chunk boundaries) ~0.19 (fixture) /
    ~0.13 (28M) — dominated by the known bucketed-vs-exact resize
    geometry delta (PERF.md #13/#14) plus per-chunk normalization, NOT
    by chunk seams;
  - boundary error is no worse than ~1.3x interior error (the linear
    crossfade introduces no seam artifacts).

Bounds below are those measurements with ~2x headroom.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.metrics import (
    si_sdr,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (
    AudioEnhancer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    HybridViT,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.audio import (
    mix_at_snr,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils.checkpoint import (
    load_model_weights,
)

from fixtures.make_tiny_denoiser import TINY, make_pairs  # noqa: E402  (pytest puts tests/ on sys.path)

SR = 16000
FIXTURE = Path(__file__).parent / "fixtures" / "tiny_denoiser"

CHUNK_S, OVERLAP_S = 1.0, 0.25


@pytest.fixture(scope="module")
def enhancer():
    model = HybridViT(**TINY)
    tmpl = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 257, 64, 1), jnp.float32), train=False
    )
    variables = load_model_weights(FIXTURE, tmpl)
    return AudioEnhancer(
        model, variables, {}, buckets=(64, 128, 256, 384, 512), mask_padding=True
    )


@pytest.fixture(scope="module")
def clips():
    rng = np.random.default_rng(7)
    cleans, noisies = make_pairs(2, 3.0, rng, snr_lo=2.0, snr_hi=8.0)
    return cleans, noisies


def _interior_mask(n: int) -> np.ndarray:
    """True away from streaming chunk boundaries (2x overlap margin)."""
    chunk, ov = int(CHUNK_S * SR), int(OVERLAP_S * SR)
    hop = chunk - ov
    mask = np.ones(n, bool)
    for s in range(hop, max(n - ov, 1), hop):
        mask[max(s - ov, 0): min(s + 2 * ov, n)] = False
    return mask


def _rel_rms(a: np.ndarray, b: np.ndarray, m: np.ndarray) -> float:
    return float(
        np.sqrt(np.mean((a[m] - b[m]) ** 2)) / (np.sqrt(np.mean(b[m] ** 2)) + 1e-12)
    )


def test_fixture_actually_denoises(enhancer, clips):
    """Precondition for every bound below: the fixture is signal-dominated."""
    cleans, noisies = clips
    gains = []
    for c, x in zip(cleans, noisies):
        y = enhancer.enhance(x)
        gains.append(si_sdr(c[: len(y)], y) - si_sdr(c[: len(x)], x))
    assert np.mean(gains) > 0.5, f"fixture no longer denoises: {gains}"


def test_streaming_within_rms_bound_of_exact(enhancer, clips):
    cleans, noisies = clips
    for x in noisies:
        exact = enhancer.enhance(x, exact=True)
        stream = enhancer.enhance_streaming(
            x, chunk_seconds=CHUNK_S, overlap_seconds=OVERLAP_S
        )
        assert len(stream) == len(exact) == len(x)
        m = _interior_mask(len(x))
        interior = _rel_rms(stream, exact, m)
        boundary = _rel_rms(stream, exact, ~m)
        # measured: interior <=0.24, boundary <=0.25 on the fixture
        assert interior < 0.45, f"interior rel RMS {interior:.3f}"
        assert boundary < 0.50, f"boundary rel RMS {boundary:.3f}"
        # crossfade must not create seam artifacts: boundary error stays
        # comparable to interior error (measured ratio <=1.5)
        assert boundary < 2.5 * max(interior, 0.02), (
            f"seam blowup: boundary {boundary:.3f} vs interior {interior:.3f}"
        )


def test_streaming_si_sdr_matches_exact(enhancer, clips):
    """The metric that matters: streaming costs ~nothing vs exact mode
    (measured |delta| <= 0.25 dB on fixture and 28M model)."""
    cleans, noisies = clips
    for c, x in zip(cleans, noisies):
        exact = enhancer.enhance(x, exact=True)
        stream = enhancer.enhance_streaming(
            x, chunk_seconds=CHUNK_S, overlap_seconds=OVERLAP_S
        )
        d = si_sdr(c[: len(stream)], stream) - si_sdr(c[: len(exact)], exact)
        assert abs(d) < 0.75, f"streaming SI-SDR delta {d:+.2f} dB"
