#!/usr/bin/env python
"""Root launcher: batched enhancement server (no reference counterpart —
the TPU-native production-serving surface)."""
from speech_enhancement_via_hybrid_vision_transformer_project_tpu.cli.serve import main

if __name__ == "__main__":
    raise SystemExit(main())
