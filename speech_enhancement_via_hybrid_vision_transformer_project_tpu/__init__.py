"""TPU-native speech-enhancement framework (Hybrid CNN-ViT denoiser).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
project ``InnaBoby/Speech-Enhancement-via-Hybrid-Vision-Transformer-Project``
(see SURVEY.md): STFT front-end, hybrid CNN-encoder -> ViT -> CNN-decoder
magnitude-spectrogram denoiser with U-Net skips, noisy-phase iSTFT
reconstruction, VoiceBank-DEMAND data pipeline, training loop, evaluation
metrics and CLIs - redesigned TPU-first (static shapes, bf16, MXU-friendly
matmul DFT, mesh/data-parallel training via jax.sharding).

Import as::

    import speech_enhancement_via_hybrid_vision_transformer_project_tpu as sevit

Subpackages
-----------
ops        DSP core (STFT/iSTFT, windows, resize) + Pallas TPU kernels
models     Flax HybridViT model family and building blocks
data       Host-side dataset/pairing/bucketing + on-device augmentation
training   Losses, optax optimizers/schedules, Trainer
parallel   Mesh construction and sharding rules (DP/TP)
inference  Batched + streaming enhancement
evaluation Metrics (SI-SDR/SNR/SegSNR/LSD/STOI, PESQ via the ITU package
           when installed, else the native P.862 model) + Evaluator
utils      Config system, checkpointing, logging, visualization
"""

__version__ = "0.1.0"

# Short ergonomic alias: `import sevit_tpu` also works once this package has
# been imported (and via the sevit_tpu shim module on sys.path).
import sys as _sys

_sys.modules.setdefault("sevit_tpu", _sys.modules[__name__])

__all__ = [
    "ops",
    "models",
    "data",
    "training",
    "parallel",
    "inference",
    "evaluation",
    "utils",
]


def __getattr__(name):  # lazy subpackage import keeps `import sevit` cheap
    if name in __all__:
        import importlib

        mod = importlib.import_module(f"{__name__}.{name}")
        setattr(_sys.modules[__name__], name, mod)
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
