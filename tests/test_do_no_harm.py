"""Do-no-harm regression on the committed mask-head fixture (VERDICT r3
task #4).

The round-4 finding: a direct-magnitude model can HURT already-clean
input (r4 magnitude run: 10-15 dB input-SNR bin at −3.25 dB SI-SDR),
while the mask head's [0,1]-bounded attenuation makes "do no harm"
structural — the r4 TPU run had every input-SNR bin and every clip
positive (benchmarks/results/convergence_tpu_r4mask.json). This test
pins that property at fixture scale on the committed
``tiny_denoiser_mask`` (trained by tests/fixtures/make_tiny_denoiser.py
--mask-head): across held-out clips spanning −5..15 dB input SNR, the
default serving config must never degrade a clip by more than a small
floor, and must help on average.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from synth_dataset import coloured_noise, speechlike  # noqa: E402

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.evaluation.metrics import (  # noqa: E402
    si_sdr,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.inference import (  # noqa: E402
    AudioEnhancer,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (  # noqa: E402
    HybridViT,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.audio import (  # noqa: E402
    mix_at_snr,
)

from fixtures.make_tiny_denoiser import TINY  # noqa: E402  (tests/ on sys.path)

SR = 16000
FIXTURE = Path(__file__).parent / "fixtures" / "tiny_denoiser_mask"


@pytest.fixture(scope="module")
def enhancer():
    import json

    import jax
    import jax.numpy as jnp

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils.checkpoint import (
        load_model_weights,
    )

    if not FIXTURE.exists():  # pragma: no cover
        pytest.skip("tiny_denoiser_mask fixture not built")
    cfg = json.loads((FIXTURE / "meta.json").read_text())["config"]
    assert cfg.get("model", {}).get("output_mode") == "mask", (
        "fixture must carry the mask-head config"
    )
    model = HybridViT(**TINY)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 257, 64, 1), jnp.float32),
        train=False,
    )
    variables = load_model_weights(FIXTURE, template)
    return AudioEnhancer(
        model, variables, cfg, buckets=(64, 128, 256), mask_padding=True
    )


def test_mask_fixture_never_hurts_and_helps_on_average(enhancer):
    rng = np.random.default_rng(11)
    gains = []
    # clips across the full −5..15 dB range, incl. nearly-clean input
    for snr in (-5.0, 0.0, 5.0, 10.0, 15.0, 20.0):
        clean = speechlike(1.0, rng)
        noisy = np.asarray(
            mix_at_snr(clean, coloured_noise(len(clean), rng), snr),
            np.float32,
        )
        out = enhancer.enhance(noisy)
        g = si_sdr(clean, out) - si_sdr(clean, noisy)
        gains.append(g)
        # do-no-harm floor: even at 20 dB input the bounded mask must not
        # destroy the clip (magnitude-head models measured −3..−5 dB here)
        assert g > -1.0, f"clip at {snr} dB input SNR degraded by {g:.2f} dB"
    assert float(np.mean(gains)) > 1.0, (
        f"fixture should denoise on average, got {np.mean(gains):+.2f} dB "
        f"(per-clip {np.round(gains, 2)})"
    )


def test_mask_fixture_attenuation_bound(enhancer):
    """A [0,1] mask can only attenuate: output energy is bounded by the
    input's (plus STFT round-trip slack) for ANY input."""
    rng = np.random.default_rng(12)
    x = rng.standard_normal(SR).astype(np.float32) * 0.3
    y = enhancer.enhance(x)
    assert float(np.sum(y**2)) <= 1.05 * float(np.sum(x**2))
