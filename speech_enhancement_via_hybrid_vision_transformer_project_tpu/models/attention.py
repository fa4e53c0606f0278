"""Self-attention stack for the Hybrid ViT.

TPU-first re-design of the reference's attention (reference:
models/attention.py). The hot kernel — fused scaled-dot-product attention —
has two implementations: the default pure-XLA einsum path (reference
semantics; measured fastest at this model's shapes, PERF.md) and a Pallas
TPU kernel (``ops.pallas_attention``, opt-in via ``use_pallas``) for
shapes/configs where a hand-fused kernel pays.

Differences from the reference, by design:
  * bf16-friendly: softmax is always computed in fp32.
  * Optional key-padding mask (the reference pads variable-length batches
    and lets padded frames attend, SURVEY.md §7.8 — we support both).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .components import DropPath, FeedForward, dense_kernel_init

Array = jax.Array


def sdpa_reference(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    mask: Optional[Array] = None,
) -> Array:
    """Scaled dot-product attention, [B, H, N, D] in/out, fp32 softmax.

    (reference: models/attention.py:84-107 — explicit QK^T*scale -> mask ->
    softmax -> @V.)
    """
    dt = q.dtype
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if mask is not None:
        if mask.ndim == 2:  # [B, N] key-padding mask
            mask = mask[:, None, None, :]
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", weights.astype(dt), v, preferred_element_type=jnp.float32
    )
    return out.astype(dt)


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention
    (reference: models/attention.py:17-115)."""

    embed_dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        if self.embed_dim % self.num_heads != 0:
            raise ValueError(
                f"embed_dim ({self.embed_dim}) must be divisible by "
                f"num_heads ({self.num_heads})"
            )
        b, n, _ = x.shape
        h = self.num_heads
        d = self.embed_dim // h
        scale = d**-0.5

        qkv = nn.Dense(
            3 * self.embed_dim,
            use_bias=self.qkv_bias,
            kernel_init=dense_kernel_init,
        )(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))

        attn_weights = None
        drop_attn = self.attn_dropout > 0 and train
        if return_attention or drop_attn or not self.use_pallas:
            # explicit-weights path (reference semantics incl. attn dropout)
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            if mask is not None:
                m = mask[:, None, None, :] if mask.ndim == 2 else mask
                logits = jnp.where(m, logits, jnp.float32(-1e30))
            attn_weights = jax.nn.softmax(logits, axis=-1)
            w = nn.Dropout(self.attn_dropout)(
                attn_weights, deterministic=not train
            )
            out = jnp.einsum(
                "bhnm,bhmd->bhnd",
                w.astype(x.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            from ..ops.pallas_attention import fused_attention

            out = fused_attention(q, k, v, scale=scale, mask=mask)

        out = jnp.moveaxis(out, 1, 2).reshape(b, n, self.embed_dim)
        out = nn.Dense(self.embed_dim, kernel_init=dense_kernel_init)(out)
        out = nn.Dropout(self.proj_dropout)(out, deterministic=not train)
        if return_attention:
            return out, attn_weights
        return out


class TransformerEncoderBlock(nn.Module):
    """Pre-norm block: x += DropPath(MHSA(LN(x))); x += DropPath(MLP(LN(x)))
    (reference: models/attention.py:118-213)."""

    embed_dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        attn = MultiHeadSelfAttention(
            self.embed_dim,
            self.num_heads,
            self.qkv_bias,
            self.attn_dropout,
            proj_dropout=self.dropout,
            use_pallas=self.use_pallas,
            name="attn",
        )
        droppath = DropPath(self.drop_path)
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if return_attention:
            y, weights = attn(y, mask=mask, train=train, return_attention=True)
        else:
            y = attn(y, mask=mask, train=train)
            weights = None
        x = x + droppath(y, train=train)
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = FeedForward(
            self.embed_dim,
            int(self.embed_dim * self.mlp_ratio),
            self.dropout,
            name="mlp",
        )(z, train=train)
        x = x + droppath(z, train=train)
        if return_attention:
            return x, weights
        return x


class VisionTransformer(nn.Module):
    """Stack of pre-norm blocks with linearly-increasing DropPath + final LN
    (reference: models/attention.py:216-304). ``attention_type='linear'``
    swaps in the O(N) EfficientAttention variant (the reference defines it
    but never wires it up, models/attention.py:307-373 — here it is a
    first-class option for very long spectrograms)."""

    embed_dim: int
    num_layers: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    attention_type: str = "standard"  # "standard" | "linear"
    # rematerialize each block's activations in backward (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(layers) less live memory —
    # enables bigger batches / the scaled 12L/1024d config per chip
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        train: bool = False,
        return_all_attentions: bool = False,
    ):
        if self.attention_type == "linear":
            # pre-norm residual blocks around EfficientAttention + MLP
            for i in range(self.num_layers):
                y = nn.LayerNorm(epsilon=1e-5, name=f"lin_norm1_{i}")(x)
                y = EfficientAttention(
                    self.embed_dim, self.num_heads, self.qkv_bias,
                    self.dropout, name=f"lin_attn_{i}",
                )(y, train=train)
                x = x + y
                z = nn.LayerNorm(epsilon=1e-5, name=f"lin_norm2_{i}")(x)
                z = FeedForward(
                    self.embed_dim, int(self.embed_dim * self.mlp_ratio),
                    self.dropout, name=f"lin_mlp_{i}",
                )(z, train=train)
                x = x + z
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
            if return_all_attentions:
                return x, []
            return x
        dpr = np.linspace(0.0, self.drop_path_rate, self.num_layers)
        attentions = []
        # argnum 0 is the module instance under nn.remat, so train is
        # argnum 3 (x=1, mask=2); mask stays dynamic (None is an empty
        # pytree). return_attention keeps its default — remat is a
        # training-path feature, attention introspection is not.
        block_cls = (
            nn.remat(
                TransformerEncoderBlock,
                static_argnums=(3,),
                # CSE prevention exists for pmap-era correctness; under jit
                # it only defeats XLA optimizations (measured 2.2x step cost
                # with the default True)
                prevent_cse=False,
            )
            if self.remat and not return_all_attentions
            else TransformerEncoderBlock
        )
        for i in range(self.num_layers):
            block = block_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.qkv_bias,
                self.dropout,
                self.attn_dropout,
                drop_path=float(dpr[i]),
                use_pallas=self.use_pallas,
                name=f"block_{i}",
            )
            if return_all_attentions:
                x, w = block(x, mask=mask, train=train, return_attention=True)
                attentions.append(w)
            else:
                x = block(x, mask, train)  # positional: remat static_argnums
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if return_all_attentions:
            return x, attentions
        return x


class EfficientAttention(nn.Module):
    """O(N) linear-attention variant: softmax(K)·softmax(V-rows), Q(K^T V)
    (reference: models/attention.py:307-373 — defined there but unused;
    kept for the long-sequence streaming path)."""

    embed_dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, n, _ = x.shape
        h = self.num_heads
        d = self.embed_dim // h
        qkv = nn.Dense(
            3 * self.embed_dim, use_bias=self.qkv_bias,
            kernel_init=dense_kernel_init,
        )(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
        k = jax.nn.softmax(k, axis=-2)
        v = jax.nn.softmax(v, axis=-1)
        context = jnp.einsum(
            "bhnd,bhne->bhde", k, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.einsum(
            "bhnd,bhde->bhne", q, context, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.moveaxis(out, 1, 2).reshape(b, n, self.embed_dim)
        out = nn.Dense(self.embed_dim, kernel_init=dense_kernel_init)(out)
        return nn.Dropout(self.dropout)(out, deterministic=not train)
