#!/usr/bin/env python
"""Root launcher: train the Hybrid ViT enhancer (reference: train.py)."""
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.cli.train import main

if __name__ == "__main__":
    raise SystemExit(main())
