#!/usr/bin/env bash
# chain-7: re-measure the rows lost to slow chip-memory reclamation
# (deep-context) once the re-smoke finishes, on the final kernel code.
set -u
OUT=${1:-/tmp/chain7_r3.log}
: > "$OUT"
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain[3456]|attn_variant_probe|attn_depth_probe|chip_smoke" > /dev/null; do sleep 30; done
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" >&2
  line=$(timeout 2700 "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
run deep_ctx_7b_50 python bench.py --max-seq 2048 --start-pos 2048
run deep_ctx_7b_50_fused python bench.py --max-seq 2048 --start-pos 2048 --no-token --no-packed --fused-attn --phases sparse
echo "=== chain7 complete ===" >&2
