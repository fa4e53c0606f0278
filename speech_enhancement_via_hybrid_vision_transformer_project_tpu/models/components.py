"""Flax building blocks for the Hybrid ViT.

TPU-native re-design of the reference's torch blocks (reference:
models/components.py). Everything runs in **NHWC** layout ([B, F, T, C]) —
the layout XLA:TPU convolutions want — instead of the reference's NCHW.
BatchNorm carries a ``batch_stats`` collection; dropout / drop-path draw
from the ``'dropout'`` PRNG stream; ``train`` switches both (the torch
``.train()/.eval()`` equivalent, made explicit).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# torch-compatible initializers (reference: models/hybrid_vit.py:265-284)
conv_kernel_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)  # kaiming_normal(mode='fan_out', nonlinearity='relu')
dense_kernel_init = nn.initializers.truncated_normal(stddev=0.02)


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"Unknown activation: {name}")


class ConvBlock(nn.Module):
    """Conv3x3 -> BatchNorm -> act -> channel-Dropout -> MaxPool.

    (reference: models/components.py:15-99; conv bias is dropped under BN,
    Dropout2d zeroes whole channels, pooling uses floor semantics.)
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    pool_size: Optional[int] = 2
    activation: str = "relu"
    use_batchnorm: bool = True
    dropout: float = 0.0
    bn_axis_name: Optional[str] = None  # set to sync BN stats across DP axis

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = self.kernel_size
        pad = k // 2
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=not self.use_batchnorm,
            kernel_init=conv_kernel_init,
        )(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch momentum=0.1 in flax convention
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
            )(x)
        x = _activation(self.activation)(x)
        if self.dropout > 0:
            # Dropout2d: drop entire channels (broadcast over F,T)
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
                x, deterministic=not train
            )
        if self.pool_size is not None and self.pool_size > 1:
            p = self.pool_size
            x = nn.max_pool(x, (p, p), strides=(p, p), padding="VALID")
        return x


class TransposeConvBlock(nn.Module):
    """Decoder block: nearest-Upsample -> Conv3x3 -> BN -> act -> Dropout2d;
    the final layer drops BN/bias/dropout and applies Tanh
    (reference: models/components.py:102-192 — note the final conv keeps
    ``bias=not use_batchnorm`` i.e. *no bias* even though BN is skipped).
    """

    features: int
    kernel_size: int = 3
    upsample_factor: Optional[int] = 2
    activation: str = "relu"
    use_batchnorm: bool = True
    dropout: float = 0.0
    final_layer: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.upsample_factor is not None and self.upsample_factor > 1:
            f = self.upsample_factor
            # nearest upsample of the NHWC spatial axes == exact repeat
            x = jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
        k = self.kernel_size
        pad = k // 2
        x = nn.Conv(
            self.features,
            (k, k),
            padding=[(pad, pad), (pad, pad)],
            use_bias=not self.use_batchnorm,
            kernel_init=conv_kernel_init,
        )(x)
        if self.use_batchnorm and not self.final_layer:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
            )(x)
        if self.final_layer:
            x = jnp.tanh(x)
        else:
            x = _activation(self.activation)(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
                    x, deterministic=not train
                )
        return x


class FeedForward(nn.Module):
    """Transformer MLP: Linear -> GELU -> Dropout -> Linear -> Dropout
    (reference: models/components.py:195-241)."""

    dim: int
    hidden_dim: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = self.hidden_dim or 4 * self.dim
        x = nn.Dense(hidden, kernel_init=dense_kernel_init)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.dim, kernel_init=dense_kernel_init)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class PatchEmbedding(nn.Module):
    """Non-overlapping conv patchify: [B,H,W,C] -> ([B, H'*W', D], (H', W'))
    with H-major token order (reference: models/components.py:244-307)."""

    embed_dim: int
    patch_size: int = 4

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, tuple[int, int]]:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=True,
            kernel_init=conv_kernel_init,
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d), (h, w)


class PositionalEncoding(nn.Module):
    """Learned (or sinusoidal) positional table, sliced to sequence length,
    then dropout (reference: models/components.py:310-386; the 10k-patch cap
    bounds utterance length, SURVEY.md §7.11)."""

    embed_dim: int
    max_len: int = 10000
    learnable: bool = True
    dropout: float = 0.1

    @staticmethod
    def sinusoidal_table(max_len: int, embed_dim: int) -> np.ndarray:
        pos = np.arange(max_len)[:, None].astype(np.float64)
        div = np.exp(
            np.arange(0, embed_dim, 2) * (-np.log(10000.0) / embed_dim)
        )
        tab = np.zeros((1, max_len, embed_dim), np.float32)
        tab[0, :, 0::2] = np.sin(pos * div)
        tab[0, :, 1::2] = np.cos(pos * div)
        return tab

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n = x.shape[1]
        if n > self.max_len:
            raise ValueError(
                f"sequence length {n} exceeds positional table ({self.max_len})"
            )
        if self.learnable:
            tab = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, self.max_len, self.embed_dim),
            )
        else:
            tab = jnp.asarray(
                self.sinusoidal_table(self.max_len, self.embed_dim)
            )
        x = x + tab[:, :n, :]
        return nn.Dropout(self.dropout)(x, deterministic=not train)


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (reference: models/components.py:389-427)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.drop_prob == 0.0 or not train:
            return x
        keep = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
