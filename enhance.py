#!/usr/bin/env python
"""Root launcher: enhance noisy audio (reference: enhance.py)."""
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.cli.enhance import main

if __name__ == "__main__":
    raise SystemExit(main())
