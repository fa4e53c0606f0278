"""Inference layer: batched + streaming enhancement + serving."""

from .enhancer import (  # noqa: F401
    AudioEnhancer,
    enhance_audio,
    enhance_file,
    load_model_for_inference,
)
from .server import DynamicBatcher, make_server  # noqa: F401
