"""Inference layer: batched + streaming enhancement."""

from .enhancer import (  # noqa: F401
    AudioEnhancer,
    enhance_audio,
    enhance_file,
    load_model_for_inference,
)
