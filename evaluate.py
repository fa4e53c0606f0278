#!/usr/bin/env python
"""Root launcher: evaluate on VoiceBank-DEMAND (reference: evaluate.py)."""
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.cli.evaluate import main

if __name__ == "__main__":
    raise SystemExit(main())
