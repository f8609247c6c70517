#!/bin/bash
# Container entrypoint: config.json first, TOTTON_* env overrides win
# (same precedence as the reference docker/entrypoint.sh:33-110).
#
# Modes:
#   all      streamer with in-process control plane + web (default)
#   dsp      streamer with in-process control plane
#   control  standalone control daemon only (no engine: counters/stats —
#            the reference stub's behavior; use dsp for live control)
#   web      web UI only
#   stream   streamer only, no control endpoint (needs TOTTON_IN/TOTTON_OUT)
#
# Unlike the reference (whose shipped ZMQ server is a stub and RELOAD takes
# effect via container restart, docker/entrypoint.sh:148-167), dsp/all serve
# the ZMQ control protocol from INSIDE the streamer process
# (totton-stream --control-endpoint): RELOAD / PHASE_TYPE_SET / SOFT_RESET
# act on the live engine with no restart.
set -euo pipefail

MODE="${1:-all}"

CONFIG_PATH="${TOTTON_CONFIG_PATH:-/opt/totton-tpu/config.json}"

cfg() {  # cfg <python-expr over config dict 'c'> <default>
  python3 - "$CONFIG_PATH" "$2" <<EOF
import json, sys
try:
    c = json.load(open(sys.argv[1]))
except Exception:
    c = {}
try:
    v = eval("""$1""")
except Exception:
    v = None
print(v if v is not None else sys.argv[2])
EOF
}

IN_DEV="${TOTTON_IN:-$(cfg "c['alsa']['inputDevice']" null)}"
OUT_DEV="${TOTTON_OUT:-$(cfg "c['alsa']['outputDevice']" null)}"
RATE="${TOTTON_RATE:-$(cfg "c['alsa']['sampleRate']" 44100)}"
CHANNELS="${TOTTON_CHANNELS:-$(cfg "c['alsa']['channels']" 2)}"
FORMAT="${TOTTON_FORMAT:-$(cfg "c['alsa']['format']" S32_LE)}"
PERIOD="${TOTTON_PERIOD:-$(cfg "c['alsa']['periodFrames']" 4096)}"
DITHER="${TOTTON_DITHER:-$(cfg "c['alsa'].get('dither')" false)}"
RATIO="${TOTTON_RATIO:-$(cfg "c['filter']['ratio']" 2)}"
PHASE="${TOTTON_PHASE:-$(cfg "c['filter']['phaseType']" minimum)}"
FILTER_DIR="${TOTTON_FILTER_DIR:-$(cfg "c['filter']['directory']" /opt/totton-tpu/data/coefficients)}"
STATS_PATH="${TOTTON_STATS_PATH:-/tmp/gpu_upsampler_stats.json}"
WEB_PORT="${TOTTON_WEB_PORT:-8080}"
ZMQ_ENDPOINT="${TOTTON_ZMQ_ENDPOINT:-ipc:///tmp/totton_zmq.sock}"

PIDS=()
cleanup() {
  for pid in "${PIDS[@]}"; do kill "$pid" 2>/dev/null || true; done
  wait || true
}
trap cleanup EXIT INT TERM

start_control() {
  totton-control --stats-path "$STATS_PATH" --endpoint "$ZMQ_ENDPOINT" &
  PIDS+=("$!")
}

start_stream() {  # $1: extra args (e.g. --control-endpoint ...)
  # shellcheck disable=SC2086
  # --config: the streamer re-reads eqEnabled/eqProfilePath from config.json
  # on every RELOAD, so web EQ apply/activate reaches the live engine.
  totton-stream --in "$IN_DEV" --out "$OUT_DEV" \
    --rate "$RATE" --channels "$CHANNELS" --format "$FORMAT" \
    --period "$PERIOD" --ratio "$RATIO" --phase "$PHASE" \
    --filter-dir "$FILTER_DIR" --stats-path "$STATS_PATH" \
    --config "$CONFIG_PATH" \
    $([ "${DITHER,,}" = "true" ] && echo --dither) ${1:-} &
  PIDS+=("$!")
}

start_web() {
  totton-web --port "$WEB_PORT" &
  PIDS+=("$!")
}

start_serve() {
  # Multi-stream serving plane (totton_tpu/serve.py): N client streams
  # on one batched engine step over a duplex socket each. The serving
  # plane serves the ZMQ control protocol itself — RELOAD / PHASE_TYPE
  # swap the shared spectrum under live listeners with per-stream
  # crossfades (no restart).
  totton-serve --listen "${TOTTON_SERVE_LISTEN:-tcp-listen://0.0.0.0:9100}" \
    --rate "$RATE" --ratio "$RATIO" --channels "$CHANNELS" \
    --phase "$PHASE" --filter-dir "$FILTER_DIR" \
    --max-streams "${TOTTON_SERVE_MAX_STREAMS:-64}" \
    --control-endpoint "$ZMQ_ENDPOINT" \
    --config "$CONFIG_PATH" \
    --stats-path "${TOTTON_SERVE_STATS_PATH:-/tmp/totton_serve_stats.json}" \
    --recycle-rss-mb "${TOTTON_SERVE_RECYCLE_RSS_MB:-0}" &
  PIDS+=("$!")
}

case "$MODE" in
  all)      start_stream "--control-endpoint $ZMQ_ENDPOINT"; start_web ;;
  dsp)      start_stream "--control-endpoint $ZMQ_ENDPOINT" ;;
  control)  start_control ;;
  stream)   start_stream ;;
  web)      start_web ;;
  serve)    start_serve ;;
  *) echo "unknown mode: $MODE" >&2; exit 2 ;;
esac

wait -n
exit $?
