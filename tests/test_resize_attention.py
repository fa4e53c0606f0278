"""Resize ops parity vs torch.nn.functional.interpolate, and fused-attention
fallback parity vs the XLA reference implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.ops.pallas_attention import (
    fused_attention,
)
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models.attention import (
    sdpa_reference,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((64, 94), (257, 376)), ((64, 94), (16, 23)), ((257, 100), (257, 100)),
     ((5, 7), (13, 3))],
)
def test_bilinear_matches_torch(in_hw, out_hw, rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bilinear",
            align_corners=False,
        )
        .numpy()
    )
    out = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_nearest_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 2, 10, 17)).astype(np.float32)
    for out_hw in [(20, 34), (7, 11), (30, 51)]:
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x), size=out_hw, mode="nearest"
            )
            .numpy()
        )
        out = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
        np.testing.assert_array_equal(out, ref)


def test_upsample_nearest_is_repeat(rng):
    x = rng.standard_normal((1, 2, 4, 5)).astype(np.float32)
    out = np.asarray(upsample_nearest(jnp.asarray(x), (2, 2)))
    assert out.shape == (1, 2, 8, 10)
    np.testing.assert_array_equal(out[..., ::2, ::2], x)
    np.testing.assert_array_equal(out[..., 1::2, 1::2], x)


@pytest.mark.parametrize("n", [37, 128, 200])
def test_fused_attention_matches_reference(n, rng):
    b, h, d = 2, 4, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = d**-0.5
    out = fused_attention(q, k, v, scale=scale)
    ref = sdpa_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_mask(rng):
    b, h, n, d = 2, 2, 24, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.3)
    scale = d**-0.5
    out = fused_attention(q, k, v, scale=scale, mask=mask)
    ref = sdpa_reference(q, k, v, scale, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grads_match(rng):
    b, h, n, d = 1, 2, 32, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = d**-0.5

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale=scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
