#!/usr/bin/env bash
# chain-5: model-family perf rows (Mistral sliding-window on chip,
# 13B int8/int4 single-chip) after chain-4 frees the chip.
set -u
OUT=${1:-/tmp/chain5_r3.log}
: > "$OUT"
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain3|perf_followup_chain4|attn_variant_probe" > /dev/null; do sleep 30; done
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" >&2
  line=$(timeout 2700 "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
run mistral_7b_50 python bench.py --model Mistral-7B
run 13b_int8_50 python bench.py --model 13B --weights int8
run 13b_int4_50 python bench.py --model 13B --weights int4
echo "=== chain5 complete ===" >&2
