#!/usr/bin/env bash
# One-shot runner for the benchmark variants that landed while the
# device tunnel was down (docs/benchmarks.md "not yet measured" list).
# Run on the real TPU, then fold the JSON lines into docs/benchmarks.md
# and docs/tpu_performance.md.  Usage: benchmarks/pending_tpu.sh [out.jsonl]
set -uo pipefail
cd "$(dirname "$0")/.."
out=${1:-benchmarks/pending_report.jsonl}
: > "$out"
export PYTHONPATH=.:/root/.axon_site

run() {
  echo ">>> $*" >&2
  timeout 3000 "$@" 2> >(tail -3 >&2) | grep -E '^\{' >> "$out" \
    || echo "FAILED: $*" >&2
}

# headline sanity first (driver metric of record)
run python bench.py
# custom-VJP fused-stack GAN training (fp32 losses per the protocol)
run python benchmarks/train_pwgan.py --iters 20 --stack-impl pallas
# flash-attention FastSpeech2 training (first run compiles the Pallas
# kernel on real hardware — also the flash compile check)
run python benchmarks/train_fastspeech2.py --iters 20 --attn-impl flash
run python benchmarks/train_fastspeech2.py --iters 20 --dtype bfloat16 \
    --attn-impl flash
# bf16 sampling-scan WaveFlow
run python benchmarks/waveflow_rtf.py --dtype bfloat16

echo "pending report written to $out" >&2
cat "$out"
