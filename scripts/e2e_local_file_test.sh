#!/bin/bash
# End-to-end file-mode audio test (parity with the reference's
# scripts/test/e2e_local_file_test.sh): generate a sine WAV, run it through
# the streamer CLI with a freshly designed filter, validate the output by
# signal metrics (correlation >= 0.7, spectral similarity >= 0.8,
# |RMS diff| <= 6 dB).
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

export TOTTON_PLATFORM="${TOTTON_PLATFORM:-cpu}"

echo "[e2e] designing a 2000-tap 2x filter..."
python -m totton_tpu.filters.generate --config 44k_2x --taps 2000 \
  --output-dir "$WORK/coeff" >/dev/null

echo "[e2e] generating test sine..."
python - "$WORK" <<'EOF'
import sys
from totton_tpu.io.wav import write_wav
from totton_tpu.testing.signals import sine
work = sys.argv[1]
write_wav(f"{work}/in.wav", sine(1000.0, 0.05, 352800, 0.5, 2), 352800)
EOF

echo "[e2e] streaming through totton-stream..."
python -m totton_tpu.cli.stream \
  --in "$WORK/in.wav" --out "$WORK/out.wav" \
  --filter "$WORK"/coeff/filter_44k_2x_2000_min_phase.json

echo "[e2e] validating output..."
python -m totton_tpu.testing.validate_output "$WORK/in.wav" "$WORK/out.wav" \
  --ratio 2

echo "[e2e] PASS"
