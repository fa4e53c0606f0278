#!/usr/bin/env bash
# VoiceBank-DEMAND download helper (equivalent of the reference's
# scripts/download_dataset.sh — the dataset requires a manual license
# acknowledgement, so this generates instructions + verifies layout).
set -euo pipefail

ROOT=${1:-data/voicebank_demand}
mkdir -p "$ROOT"

cat > "$ROOT/README.md" <<'MD'
# VoiceBank-DEMAND (Valentini et al.)

Download the 28-speaker training set and the test set from the Edinburgh
DataShare page (requires accepting the license):

  https://datashare.ed.ac.uk/handle/10283/2791

Extract the following archives into this directory:

  clean_trainset_28spk_wav.zip -> clean_trainset_28spk_wav/
  noisy_trainset_28spk_wav.zip -> noisy_trainset_28spk_wav/
  clean_testset_wav.zip        -> clean_testset_wav/
  noisy_testset_wav.zip        -> noisy_testset_wav/

Audio is 48 kHz; this framework resamples to 16 kHz on load.
MD

echo "Instructions written to $ROOT/README.md"
for d in clean_trainset_28spk_wav noisy_trainset_28spk_wav \
         clean_testset_wav noisy_testset_wav; do
  if [ -d "$ROOT/$d" ]; then
    n=$(find "$ROOT/$d" -name '*.wav' | wc -l)
    echo "  found $d ($n wavs)"
  else
    echo "  MISSING $d"
  fi
done
