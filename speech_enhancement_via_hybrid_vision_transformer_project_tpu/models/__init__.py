"""Model family: Hybrid CNN-ViT denoiser and its building blocks.

(Exports are complete — the reference's models/__init__.py:8-27 forgot to
re-export ``create_hybrid_vit``, breaking its CLIs; SURVEY.md §7.1.)
"""

from .attention import (  # noqa: F401
    EfficientAttention,
    MultiHeadSelfAttention,
    TransformerEncoderBlock,
    VisionTransformer,
    sdpa_reference,
)
from .components import (  # noqa: F401
    ConvBlock,
    DropPath,
    FeedForward,
    PatchEmbedding,
    PositionalEncoding,
    PositionalEncoding2D,
    patch_validity_mask,
    TransposeConvBlock,
)
from .fold import fold_batchnorm  # noqa: F401
from .hybrid_vit import HybridViT, count_parameters, create_hybrid_vit  # noqa: F401

__all__ = [
    "HybridViT",
    "create_hybrid_vit",
    "count_parameters",
    "fold_batchnorm",
    "ConvBlock",
    "TransposeConvBlock",
    "FeedForward",
    "PatchEmbedding",
    "PositionalEncoding",
    "PositionalEncoding2D",
    "patch_validity_mask",
    "DropPath",
    "MultiHeadSelfAttention",
    "TransformerEncoderBlock",
    "VisionTransformer",
    "EfficientAttention",
    "sdpa_reference",
]
