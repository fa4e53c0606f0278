"""Hybrid CNN-ViT speech-enhancement model (flax).

TPU-native re-design of the reference architecture (reference:
models/hybrid_vit.py:21-525): CNN encoder -> conv patchify -> learned
pos-emb -> pre-norm ViT -> token->feature projection -> CNN decoder with
U-Net skips -> Tanh head -> bilinear resize back to the input [F, T].

Layout is NHWC ([B, F, T, C]); masks for padded frames are supported but
off by default to match reference semantics (SURVEY.md §7.8).

Signal flow at default config (cf. SURVEY.md §1):
  [B,257,T,1] -> enc [B,128,T/2,64] -> [B,64,T/4,128] -> [B,64,T/4,256]
  -> patchify k4s4 -> [B, 16*(T/16), 512] -> 6x ViT -> Linear 512->256
  -> [B,16,T/16,256] -> dec (x1,x2,x2,x1 upsample, skips) -> [B,64,T/4,1]
  -> bilinear resize -> [B,257,T,1], values in [-1,1] (Tanh).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .attention import VisionTransformer
from .components import (
    ConvBlock,
    PatchEmbedding,
    PositionalEncoding,
    PositionalEncoding2D,
    TransposeConvBlock,
    dense_kernel_init,
)

Array = jax.Array


class HybridViT(nn.Module):
    """Hybrid Vision Transformer for magnitude-spectrogram denoising."""

    input_channels: int = 1
    output_channels: int = 1
    encoder_channels: Sequence[int] = (64, 128, 256)
    encoder_kernel_sizes: Sequence[int] = (3, 3, 3)
    encoder_pool_sizes: Sequence[int] = (2, 2, 1)
    embed_dim: int = 512
    num_heads: int = 8
    num_layers: int = 6
    mlp_ratio: float = 4.0
    patch_size: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 1)
    decoder_kernel_sizes: Sequence[int] = (3, 3, 3, 3)
    decoder_upsample_factors: Sequence[int] = (1, 2, 2, 1)
    dropout: float = 0.1
    attn_dropout: float = 0.1
    drop_path_rate: float = 0.1
    use_skip_connections: bool = True
    use_cls_token: bool = False
    max_patches: int = 10000
    # factored_2d frequency-table size: must cover the freq patch grid
    # h = (n_freq_bins // prod(pools)) // patch_size — 16 for the default
    # n_fft=512; create_hybrid_vit derives it from the config so large
    # n_fft (>= 4096) configs don't hit the table bound
    max_freq_patches: int = 64
    # "learned_1d" = reference-parity flat table indexed i*w+j (bucket-width
    # sensitive, PERF.md #13); "factored_2d" = freq-table[i] + time-table[j],
    # invariant to padded bucket width.
    pos_embed_type: str = "learned_1d"
    use_pallas_attention: bool = False
    attention_type: str = "standard"  # "standard" | "linear" (O(N))
    remat: bool = False  # rematerialize transformer blocks (memory << FLOPs)
    compute_dtype: Any = jnp.float32  # bf16 for mixed-precision training
    bn_axis_name: Optional[str] = None
    # inference-only: conv blocks built WITHOUT BatchNorm (bias instead);
    # use with variables produced by models.fold.fold_batchnorm, which
    # absorbs the trained BN affine+stats into the conv kernels/biases.
    # Numerically identical to the BN model in eval mode (fp32-tested);
    # never used for training (BN stats would no longer update).
    fold_bn: bool = False
    # Output head (round-5 framework extension; no reference counterpart):
    #   "resize"       — reference parity: decoder's final 1-channel Tanh
    #                    block at [64, T/4] + bilinear stretch to [F, T]
    #                    (reference: models/hybrid_vit.py:459-465). Caps
    #                    the output at the decoder's 64-row resolution —
    #                    the r4 oracle study's measured bottleneck.
    #   "fullres_mask" — learned sub-pixel (depth-to-space) upsampling of
    #                    the decoder's penultimate feature map to the full
    #                    [F, T] grid, concatenated with the normalized
    #                    input magnitude (a full-resolution skip), refined
    #                    by two 3x3 convs -> Tanh. The output can place
    #                    spectral detail at single-bin resolution instead
    #                    of inheriting the 64-row blur. Pair with
    #                    model.output_mode: "mask".
    head_type: str = "resize"
    head_channels: int = 16
    # sub-pixel upsampling factors (freq, time): the spatial factor still
    # missing after the decoder — prod(pools)*patch / prod(dec upsamples),
    # 4x4 for the default config (create_hybrid_vit derives them)
    head_freq_up: int = 4
    head_time_up: int = 4

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        train: bool = False,
        return_attentions: bool = False,
        stage_out: Optional[str] = None,
    ):
        """Enhance a normalized magnitude spectrogram.

        Args:
          x: ``[B, F, T, C]`` (NHWC) normalized magnitudes.
          mask: optional ``[B, N]`` patch-validity mask for padded frames.
          train: enables BN batch stats, dropout and stochastic depth.
          return_attentions: also return per-layer attention maps.
          stage_out: early-return point for per-stage profiling
            (benchmarks/bench_stages.py): ``"encoder"`` (after the conv
            encoder), ``"transformer"`` (after tokens -> feature map),
            ``"pre_resize"`` (after the decoder, before the final bilinear
            resize). None = full forward. Compiled separately per stage;
            never used in the training/serving paths.

        Returns:
          ``[B, F, T, C_out]`` enhanced spectrogram in [-1, 1].
        """
        if self.head_type not in ("resize", "fullres_mask"):
            raise ValueError(
                f"unknown head_type {self.head_type!r} "
                "(expected 'resize' or 'fullres_mask')"
            )
        fullres = self.head_type == "fullres_mask"
        in_f, in_t = x.shape[1], x.shape[2]
        x = x.astype(self.compute_dtype)
        x_in = x  # full-resolution input skip for the fullres head

        # ===== 1. CNN encoder (skips saved after every block) =====
        skips: List[Array] = []
        for i, (ch, k, p) in enumerate(
            zip(
                self.encoder_channels,
                self.encoder_kernel_sizes,
                self.encoder_pool_sizes,
            )
        ):
            x = ConvBlock(
                features=ch,
                kernel_size=k,
                pool_size=p if p > 1 else None,
                activation="relu",
                use_batchnorm=not self.fold_bn,
                dropout=self.dropout,
                bn_axis_name=self.bn_axis_name,
                name=f"encoder_{i}",
            )(x, train=train)
            skips.append(x)
        if stage_out == "encoder":
            return x

        # ===== 2. Patchify =====
        patches, spatial = PatchEmbedding(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            name="patch_embed",
        )(x)

        # ===== 3. Positional encoding (factored 2-D variant) =====
        # Applied to the patch grid BEFORE the CLS token so (i, j) indexing
        # is well-defined; the CLS token carries its own learned vector.
        if self.pos_embed_type == "factored_2d":
            patches = PositionalEncoding2D(
                embed_dim=self.embed_dim,
                max_freq_patches=self.max_freq_patches,
                max_time_patches=self.max_patches,
                dropout=self.dropout,
                name="pos_encoding",
            )(patches, spatial, train=train)
        elif self.pos_embed_type not in ("learned_1d", "sinusoidal"):
            raise ValueError(
                f"unknown pos_embed_type {self.pos_embed_type!r} "
                "(expected 'learned_1d', 'sinusoidal' or 'factored_2d')"
            )

        # ===== 3b. Optional CLS token =====
        if self.use_cls_token:
            cls = self.param(
                "cls_token",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, 1, self.embed_dim),
            ).astype(patches.dtype)
            patches = jnp.concatenate(
                [jnp.broadcast_to(cls, (patches.shape[0], 1, self.embed_dim)), patches],
                axis=1,
            )
            if mask is not None:
                ones = jnp.ones((mask.shape[0], 1), mask.dtype)
                mask = jnp.concatenate([ones, mask], axis=1)

        # ===== 4. Positional encoding (reference 1-D table) + transformer ==
        if self.pos_embed_type in ("learned_1d", "sinusoidal"):
            tokens = PositionalEncoding(
                embed_dim=self.embed_dim,
                max_len=self.max_patches,
                learnable=self.pos_embed_type == "learned_1d",
                dropout=self.dropout,
                name="pos_encoding",
            )(patches, train=train)
        else:
            tokens = patches

        transformer = VisionTransformer(
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=True,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            drop_path_rate=self.drop_path_rate,
            use_pallas=self.use_pallas_attention,
            attention_type=self.attention_type,
            remat=self.remat,
            name="transformer",
        )
        attentions = None
        if return_attentions:
            tokens, attentions = transformer(
                tokens, mask=mask, train=train, return_all_attentions=True
            )
        else:
            tokens = transformer(tokens, mask=mask, train=train)

        if self.use_cls_token:
            tokens = tokens[:, 1:, :]

        # ===== 5. Tokens -> feature map =====
        feat = nn.Dense(
            self.encoder_channels[-1],
            kernel_init=dense_kernel_init,
            name="to_feature_map",
        )(tokens)
        h, w = spatial
        x = feat.reshape(feat.shape[0], h, w, feat.shape[-1])
        if stage_out == "transformer":
            return x

        # ===== 6. CNN decoder with U-Net skips =====
        # skip i (deep-to-shallow) projected by 1x1 conv then bilinear-resized
        # to the decoder's *pre-block* spatial size, concatenated on channels
        # (reference: models/hybrid_vit.py:352-394).
        rev_skips = skips[::-1]
        n_dec = len(self.decoder_channels)
        for i, (ch, k, up) in enumerate(
            zip(
                self.decoder_channels,
                self.decoder_kernel_sizes,
                self.decoder_upsample_factors,
            )
        ):
            is_final = i == n_dec - 1
            if is_final and fullres:
                # the fullres head replaces the final 1-channel Tanh block
                break
            if self.use_skip_connections and not is_final and i < len(rev_skips):
                skip = nn.Conv(
                    ch,
                    (1, 1),
                    use_bias=True,
                    kernel_init=dense_kernel_init,  # 1x1 conv == linear proj
                    name=f"skip_proj_{i}",
                )(rev_skips[i])
                if skip.shape[1:3] != x.shape[1:3]:
                    skip = jnp.moveaxis(
                        resize_bilinear(
                            jnp.moveaxis(skip, -1, 1), (x.shape[1], x.shape[2])
                        ),
                        1,
                        -1,
                    )
                x = jnp.concatenate([x, skip], axis=-1)
            x = TransposeConvBlock(
                features=ch,
                kernel_size=k,
                upsample_factor=up if up > 1 else None,
                activation="relu",
                # final layer: use_batchnorm=True never creates BN (it's
                # skipped for final_layer) but keeps the conv bias OFF —
                # the reference's no-bias final-conv quirk — so folding
                # must not touch it
                use_batchnorm=is_final or not self.fold_bn,
                dropout=self.dropout if not is_final else 0.0,
                final_layer=is_final,
                bn_axis_name=self.bn_axis_name,
                name=f"decoder_{i}",
            )(x, train=train)

        if stage_out == "pre_resize":
            return x

        if fullres:
            # ===== 7 (fullres_mask). Learned upsample to [F, T] =====
            # Sub-pixel conv: predict fu*tu sub-positions per coarse cell,
            # then depth-to-space — an MXU-friendly learned upsampler (one
            # conv at coarse resolution; no transposed-conv checkerboard).
            from .components import conv_kernel_init

            fu, tu = self.head_freq_up, self.head_time_up
            h = nn.Conv(
                self.head_channels * fu * tu,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=conv_kernel_init,
                name="head_subpixel",
            )(x)
            b, f0, t0 = h.shape[0], h.shape[1], h.shape[2]
            h = h.reshape(b, f0, t0, fu, tu, self.head_channels)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, f0 * fu, t0 * tu, self.head_channels
            )
            # 256 -> 257 etc.: a near-identity bilinear nudge (the learned
            # 4x upsample has already done the real work). DENSE matmul
            # form on purpose: ~25 GF at batch 32 (2.6% of the step) and
            # MXU-friendly; the two-tap gather variant
            # (ops/resize.py:resize_bilinear_taps, numerically identical)
            # measured ~16 ms SLOWER on v5e — TPU row-gathers lower
            # poorly (PERF.md r5).
            if h.shape[1:3] != (in_f, in_t):
                h = jnp.moveaxis(
                    resize_bilinear(jnp.moveaxis(h, -1, 1), (in_f, in_t)),
                    1,
                    -1,
                )
            # full-resolution input skip: the refinement convs see the
            # actual noisy magnitude at single-bin resolution, so the mask
            # can snap to spectral features the 64-row path cannot resolve
            h = jnp.concatenate([h, x_in], axis=-1)
            h = nn.Conv(
                self.head_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=conv_kernel_init,
                name="head_refine",
            )(h)
            h = nn.relu(h)
            x = nn.Conv(
                self.output_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=conv_kernel_init,
                name="head_out",
            )(h)
            x = jnp.tanh(x)
            x = x.astype(jnp.float32)
            if return_attentions:
                return x, attentions
            return x

        # ===== 7. Resize back to input [F, T] =====
        if x.shape[1:3] != (in_f, in_t):
            x = jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(x, -1, 1), (in_f, in_t)), 1, -1
            )
        x = x.astype(jnp.float32)
        if return_attentions:
            return x, attentions
        return x


def count_parameters(params) -> Dict[str, int]:
    """Per-component parameter counts
    (reference: models/hybrid_vit.py:471-489)."""
    import numpy as np

    def tally(tree):
        return int(
            sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree))
        )

    p = params["params"] if "params" in params else params
    counts = {
        "encoder": tally({k: v for k, v in p.items() if k.startswith("encoder_")}),
        "transformer": tally(p.get("transformer", {})),
        "decoder": tally(
            {
                k: v
                for k, v in p.items()
                if k.startswith("decoder_") or k.startswith("skip_proj_")
            }
        ),
        "patch_embed": tally(p.get("patch_embed", {})),
        "pos_encoding": tally(p.get("pos_encoding", {})),
        "head": tally({k: v for k, v in p.items() if k.startswith("head_")}),
        "total": tally(p),
    }
    counts["trainable"] = counts["total"]
    return counts


def _derive_max_freq_patches(config: Dict) -> int:
    """Frequency patch-grid size implied by the config's STFT geometry:
    n_freq_bins floored through the encoder pools, then patchified. Keeps
    the factored-2d frequency table large enough for any n_fft (a 64-row
    floor preserves the historical default for hand-built configs)."""
    mc = config.get("model", {})
    f = config.get("spectrogram", {}).get(
        "n_freq_bins", config.get("audio", {}).get("n_fft", 512) // 2 + 1
    )
    for p in mc.get("encoder", {}).get("pool_sizes", (2, 2, 1)):
        f //= max(int(p), 1)
    h = max(1, f // int(mc.get("transformer", {}).get("patch_size", 4)))
    return max(64, h)


def create_hybrid_vit(config: Optional[Dict] = None, **overrides) -> HybridViT:
    """Build a HybridViT from the merged config dict
    (reference: models/hybrid_vit.py:492-525 — same config keys)."""
    if config is None:
        config = {}
    mc = config.get("model", {})
    enc = mc.get("encoder", {})
    tr = mc.get("transformer", {})
    dec = mc.get("decoder", {})
    kwargs = dict(
        input_channels=mc.get("input_channels", 1),
        output_channels=mc.get("output_channels", 1),
        encoder_channels=tuple(enc.get("channels", (64, 128, 256))),
        encoder_kernel_sizes=tuple(enc.get("kernel_sizes", (3, 3, 3))),
        encoder_pool_sizes=tuple(enc.get("pool_sizes", (2, 2, 1))),
        embed_dim=tr.get("embed_dim", 512),
        num_heads=tr.get("num_heads", 8),
        num_layers=tr.get("num_layers", 6),
        mlp_ratio=float(tr.get("mlp_ratio", 4)),
        patch_size=tr.get("patch_size", 4),
        decoder_channels=tuple(dec.get("channels", (256, 128, 64, 1))),
        decoder_kernel_sizes=tuple(dec.get("kernel_sizes", (3, 3, 3, 3))),
        decoder_upsample_factors=tuple(dec.get("upsample_factors", (1, 2, 2, 1))),
        dropout=enc.get("dropout", 0.1),
        attn_dropout=tr.get("attention_dropout", 0.1),
        drop_path_rate=tr.get("drop_path_rate", 0.1),
        use_skip_connections=dec.get("use_skip_connections", True),
        pos_embed_type=tr.get("pos_embed", "learned_1d"),
        max_freq_patches=tr.get(
            "max_freq_patches", _derive_max_freq_patches(config)
        ),
        attention_type=tr.get("attention_type", "standard"),
        remat=tr.get("remat", config.get("tpu", {}).get("remat", False)),
        use_pallas_attention=config.get("tpu", {}).get(
            "use_pallas_attention", False
        ),
        head_type=mc.get("head", "resize"),
        head_channels=mc.get("head_channels", 16),
    )
    kwargs.update(overrides)
    if kwargs["head_type"] == "fullres_mask":
        # spatial factor still missing after the decoder: the encoder
        # pools + patchify downsample, the decoder upsamples back part way
        down = 1
        for p in kwargs["encoder_pool_sizes"]:
            down *= max(int(p), 1)
        down *= int(kwargs["patch_size"])
        up = 1
        for u in kwargs["decoder_upsample_factors"]:
            up *= max(int(u), 1)
        rem = max(1, down // up)
        kwargs.setdefault("head_freq_up", rem)
        kwargs.setdefault("head_time_up", rem)
    return HybridViT(**kwargs)
