#!/bin/bash
# Dockerized end-to-end test (parity with the reference's
# scripts/test/e2e_docker_test.sh + docker-compose.test.yml).
#
# Three legs:
#   A. file-mode audio pipeline INSIDE the container (sine -> stream ->
#      signal-metric validation: correlation >= 0.7, spectral sim >= 0.8,
#      |RMS diff| <= 6 dB)
#   B. live control plane: RELOAD / PHASE_TYPE_SET against the RUNNING
#      containerized streamer over ZMQ (acts on the live engine — the
#      reference needs a container restart for this)
#   C. web restart hook: POST /api/daemon/restart from the web container
#      restarts the DSP container through the Docker socket
#
# Requires a Docker host with compose v2. Exits 2 (skip) when unavailable.
set -euo pipefail
cd "$(dirname "$0")/.."

if ! command -v docker >/dev/null 2>&1 || ! docker info >/dev/null 2>&1; then
  echo "[e2e-docker] SKIP: no usable docker daemon on this host" >&2
  exit 2
fi

COMPOSE=(docker compose -f deploy/docker-compose.test.yml)
export TOTTON_TEST_DIR="$(mktemp -d)"
chmod 777 "$TOTTON_TEST_DIR"

cleanup() {
  "${COMPOSE[@]}" down --remove-orphans >/dev/null 2>&1 || true
  rm -rf "$TOTTON_TEST_DIR"
}
trap cleanup EXIT

echo "[e2e-docker] building image..."
"${COMPOSE[@]}" build dsp-test >/dev/null

echo "[e2e-docker] leg A: file pipeline inside the container..."
"${COMPOSE[@]}" run --rm --no-deps --entrypoint bash dsp-test -c '
  set -euo pipefail
  export TOTTON_PLATFORM=cpu
  totton-generate-filters --config 44k_2x --taps 2000 \
      --output-dir /work/coeff >/dev/null
  totton-generate-filters --config 44k_2x --taps 2000 --phase linear \
      --output-dir /work/coeff >/dev/null
  python - <<PY
from totton_tpu.io.wav import write_wav
from totton_tpu.testing.signals import sine
write_wav("/work/in.wav", sine(1000.0, 0.05, 352800, 0.5, 2), 352800)
PY
  totton-stream --in /work/in.wav --out /work/out.wav \
      --filter /work/coeff/filter_44k_2x_2000_min_phase.json
  python -m totton_tpu.testing.validate_output /work/in.wav /work/out.wav \
      --ratio 2
'

echo "[e2e-docker] leg B: live control plane against the running streamer..."
"${COMPOSE[@]}" up -d dsp-test
"${COMPOSE[@]}" exec -T dsp-test python - <<'PY'
import sys, time
from totton_tpu.control.client import DaemonClient

c = DaemonClient(endpoint="tcp://127.0.0.1:5555", timeout_ms=20000)
deadline = time.monotonic() + 120
while not c.ping():
    if time.monotonic() > deadline:
        sys.exit("control endpoint never came up")
    time.sleep(1.0)

r = c.get_phase_type()
assert r.ok and r.data["phase_type"] == "minimum", r.data
r = c.set_phase_type("linear")          # hot-swaps the live filter
assert r.ok and r.data["phase_type"] == "linear", r.data
r = c.reload_config()
assert r.ok, r.data
r = c.stats()
assert r.ok and r.data["reloads"] >= 1, r.data
assert r.data["phase_type"] == "linear", r.data
print("live control ok:", r.data)
PY

echo "[e2e-docker] leg C: web restart hook over the Docker socket..."
"${COMPOSE[@]}" up -d web-test
started_before=$(docker inspect -f '{{.State.StartedAt}}' totton-dsp-test)
for i in $(seq 1 60); do
  curl -fsS http://127.0.0.1:18080/api/status >/dev/null 2>&1 && break
  sleep 1
done
resp=$(curl -fsS -X POST http://127.0.0.1:18080/api/daemon/restart)
echo "restart response: $resp"
echo "$resp" | grep -q '"restarted": *true'
sleep 2
started_after=$(docker inspect -f '{{.State.StartedAt}}' totton-dsp-test)
if [ "$started_before" = "$started_after" ]; then
  echo "[e2e-docker] FAIL: DSP container was not restarted" >&2
  exit 1
fi

echo "[e2e-docker] PASS (pipeline + live control + restart hook)"
