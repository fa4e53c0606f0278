"""Analytic FLOP counter vs XLA's cost model (round-2 verdict #1).

The MFU numbers in PERF.md stand on two legs: the analytic per-stage
count in benchmarks/flops.py and XLA's own ``cost_analysis()`` of the
compiled program. These tests pin the two against each other so neither
can drift — if the model architecture changes, the counter must follow.
"""

import jax.numpy as jnp
import pytest

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    create_hybrid_vit,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.utils import (
    jit_init,
)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from benchmarks.flops import (  # noqa: E402
    forward_flops,
    spec_from_model,
    stft_flops,
    xla_forward_flops,
    xla_program_flops,
)


@pytest.mark.parametrize(
    "overrides,batch,frames",
    [
        ({}, 4, 128),  # default 28M config
        ({}, 2, 256),
        # the scaled 12L/1024d (168M) benchmark config
        ({"embed_dim": 1024, "num_heads": 16, "num_layers": 12}, 1, 128),
    ],
)
def test_forward_flops_match_xla(overrides, batch, frames):
    model = create_hybrid_vit(
        dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0, **overrides
    )
    variables = jit_init(model, jnp.zeros((1, 257, 64, 1), jnp.float32))
    analytic = forward_flops(spec_from_model(model), batch, 257, frames)
    xla = xla_forward_flops(model, variables, batch, 257, frames)
    # residual = elementwise BN/bias/GELU/softmax work the analytic count
    # deliberately omits (sub-1% at the default config)
    assert analytic["total"] == pytest.approx(xla, rel=0.02), (
        analytic["total"],
        xla,
    )


def test_stft_flops_match_xla():
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.stft import (
        STFTConfig,
        stft,
    )

    cfg = STFTConfig()
    frames = 128
    wav = jnp.zeros((4, (frames - 1) * cfg.hop_length), jnp.float32)

    def f(x):
        return stft(x, cfg, method="matmul")

    xla = xla_program_flops(f, wav)
    analytic = stft_flops(4, frames)
    # window multiply + framing overhead is tiny next to the DFT matmuls
    assert analytic == pytest.approx(xla, rel=0.02), (analytic, xla)


def test_flops_scale_linearly_with_batch():
    spec = spec_from_model(create_hybrid_vit())
    f1 = forward_flops(spec, 1, 257, 128)["total"]
    f8 = forward_flops(spec, 8, 257, 128)["total"]
    assert f8 == pytest.approx(8 * f1, rel=1e-12)
