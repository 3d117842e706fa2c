#!/usr/bin/env bash
# chain-B: rows whose dense baselines were lost to transient compile
# errors in earlier chains (int4, batch=8), after chain-A.
set -u
OUT=${1:-/tmp/chainB_r3.log}
: > "$OUT"
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain[3456A]|attn_variant_probe|attn_depth_probe|chip_smoke|spec_probe" > /dev/null; do sleep 30; done
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" >&2
  line=$(timeout 2700 "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
run int4_7b_50 python bench.py --weights int4
run batch8_7b_50 python bench.py --batch 8
echo "=== chainB complete ===" >&2
