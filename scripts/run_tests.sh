#!/bin/bash
# Test runner (parity with the reference's scripts/deployment/run_tests.sh):
# full pytest suite on the virtual CPU mesh, then a quick benchmark smoke.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/ -q

TOTTON_PLATFORM=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m benchmarks.bench_configs --quick

echo "all tests + bench smoke passed"
