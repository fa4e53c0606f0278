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


def patch_validity_mask(
    lengths: Array,
    f_dim: int,
    t_dim: int,
    hop_length: int,
    pool_sizes=(2, 2, 1),
    patch_size: int = 4,
) -> Array:
    """``[B, N]`` patch-validity mask from per-row true sample lengths.

    Mirrors the model's spatial math: each encoder pool floors F and T by
    its pool size, then PatchEmbedding tiles ``patch_size x patch_size``;
    a patch column is valid iff it overlaps at least one real (non-padding)
    STFT frame. Shared by masked bucketed inference
    (inference/enhancer.py) and masked training (training/trainer.py).
    """
    down_t = patch_size
    for p in pool_sizes:
        if p and p > 1:
            f_dim //= p
            t_dim //= p
            down_t *= p
    h, w = f_dim // patch_size, t_dim // patch_size
    frames_valid = 1 + jnp.ceil(
        jnp.maximum(lengths, 1).astype(jnp.float32) / hop_length
    ).astype(jnp.int32)
    col_start = jnp.arange(w, dtype=jnp.int32) * down_t  # first frame
    col_valid = col_start[None, :] < frames_valid[:, None]  # [B, w]
    return jnp.broadcast_to(
        col_valid[:, None, :], (col_valid.shape[0], h, w)
    ).reshape(col_valid.shape[0], h * w)


class PositionalEncoding2D(nn.Module):
    """Factored learned 2-D positional table: patch (i, j) on the
    ``(freq, time)`` patch grid gets ``freq_tab[i] + time_tab[j]``.

    TPU-first alternative to the reference's flat 1-D table (reference:
    models/components.py:310-386), which indexes patches as ``i*w + j`` —
    so the embedding assigned to a *valid* patch changes whenever the
    padded bucket width ``w`` changes, making the bucketed fast path
    geometrically inconsistent with exact-length inference (measured at
    ~10-12% relative RMS, PERF.md #13). Factoring the table over the two
    axes makes every valid patch's embedding independent of the bucket
    width; with ``mask_padding`` the residual bucketed-vs-exact delta is
    only conv/resize boundary effects. Select with
    ``model.transformer.pos_embed: factored_2d``.
    """

    embed_dim: int
    max_freq_patches: int = 64
    max_time_patches: int = 4096
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: Array, spatial: tuple[int, int], train: bool = False
    ) -> Array:
        h, w = spatial
        if h > self.max_freq_patches or w > self.max_time_patches:
            raise ValueError(
                f"patch grid {spatial} exceeds positional tables "
                f"({self.max_freq_patches}, {self.max_time_patches})"
            )
        freq_tab = self.param(
            "pos_embed_freq",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.max_freq_patches, self.embed_dim),
        )
        time_tab = self.param(
            "pos_embed_time",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.max_time_patches, self.embed_dim),
        )
        emb = freq_tab[:h, None, :] + time_tab[None, :w, :]
        x = x + emb.reshape(1, h * w, self.embed_dim)
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
