#!/usr/bin/env bash
# Environment setup for the TPU-native speech-enhancement framework
# (equivalent of the reference's scripts/setup_environment.sh, which built a
# CUDA torch venv — here: JAX TPU + native runtime + project scaffolding).
set -euo pipefail

PYTHON=${PYTHON:-python3}

echo "== Python/JAX environment =="
$PYTHON - <<'PY'
import jax, flax, optax
print("jax", jax.__version__, "backend:", jax.default_backend())
print("devices:", jax.devices())
print("flax", flax.__version__, "optax", optax.__version__)
PY

echo "== Building native audio runtime =="
make -C "$(dirname "$0")/../speech_enhancement_via_hybrid_vision_transformer_project_tpu/native"

echo "== Creating project directories =="
mkdir -p data/voicebank_demand checkpoints logs

echo "Setup complete. Put VoiceBank-DEMAND under data/voicebank_demand/"
echo "(see scripts/download_dataset.sh), then: python train.py"
