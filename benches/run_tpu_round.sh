#!/usr/bin/env bash
# One-shot TPU measurement pass: run each pending bench serially (the
# remote-compile helper is single-client; CLAUDE.md forbids concurrent
# CPU load while timing) and append to the round's JSONL archive.
#
#   ./benches/run_tpu_round.sh [archive.jsonl]
set -uo pipefail
cd "$(dirname "$0")/.."
ARCHIVE="${1:-BENCHES_r04.jsonl}"

run() {
  echo "== $* ==" >&2
  timeout 3000 "$@" | tee -a "$ARCHIVE"
}

run python benches/check_fm_accuracy.py
run python benches/bench_kernels.py fm_chain
run python benches/bench_kernels.py fir
run python benches/bench_kernels.py fft_filter
run python benches/bench_kernels.py quad_demod
run python benches/bench_kernels.py channelizer
run python benches/bench_kernels.py bell202
run python benches/bench_kernels.py decode_bank
run python benches/bench_kernels.py scan_stream_device
run python benches/bench_kernels.py native
run python bench.py
echo "done; rows appended to $ARCHIVE" >&2
