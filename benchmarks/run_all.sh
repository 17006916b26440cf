#!/usr/bin/env bash
# Run every benchmark and collect the JSON lines into one report
# (reference analog: tests/benchmark/PWGAN/run_all.sh orchestrating the
# avg_ips protocol).  Usage:  benchmarks/run_all.sh [report.jsonl]
set -uo pipefail
cd "$(dirname "$0")/.."
out=${1:-benchmarks/report.jsonl}
: > "$out"

run() {
  echo ">>> $*" >&2
  # keep only the JSON result line(s)
  "$@" 2>/dev/null | grep -E '^\{' >> "$out" || echo "FAILED: $*" >&2
}

run python bench.py
run python benchmarks/waveflow_rtf.py
run python benchmarks/waveflow_rtf.py --dtype bfloat16
run python benchmarks/serving_throughput.py
run python benchmarks/serving_throughput.py --dtype bfloat16
run python benchmarks/ar_decode.py
run python benchmarks/train_fastspeech2.py --iters 20
run python benchmarks/train_fastspeech2.py --iters 20 --dtype bfloat16
run python benchmarks/train_fastspeech2.py --iters 20 --attn-impl flash
run python benchmarks/train_fastspeech2.py --iters 20 --dtype bfloat16 --attn-impl flash
run python benchmarks/train_pwgan.py --iters 20
run python benchmarks/train_pwgan.py --iters 20 --dtype bfloat16
run python benchmarks/train_pwgan.py --iters 20 --stack-impl pallas
run python benchmarks/train_pwgan.py --iters 20 --stack-impl pallas --dtype bfloat16
run python benchmarks/flash_sweep.py --iters 10
run python benchmarks/longform_rtf.py --iters 5

echo "report written to $out" >&2
cat "$out"
