#!/usr/bin/env bash
# chain-A (replaces 7/8/9, reordered): after chain-6's re-smoke —
# variant probe first (informs the production attention change), then
# spec decomposition, then the deep-context re-measures.
set -u
OUT=${1:-/tmp/chainA_r3.log}
: > "$OUT"
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain[3456]|attn_variant_probe|attn_depth_probe|chip_smoke" > /dev/null; do sleep 30; done
timeout 2700 python experiments/attn_variant_probe.py > /tmp/attn_variant_probe2.log 2>&1
echo "variant rc=$?" | tee -a "$OUT"
timeout 2700 python experiments/spec_probe.py > /tmp/spec_probe.log 2>&1
echo "spec_probe rc=$?" | tee -a "$OUT"
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" >&2
  line=$(timeout 2700 "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
run deep_ctx_7b_50 python bench.py --max-seq 2048 --start-pos 2048
echo "=== chainA complete ===" >&2
