#!/usr/bin/env bash
# chain-3: after the depth probe frees the chip — validate the MXU
# attention rewrite on real lowering (smoke gate), then re-measure the
# rows it affects (deep-context, int4) and the fixed spec bench.
set -u
OUT=${1:-/tmp/chain3_r3.log}
: > "$OUT"
cd "$(dirname "$0")/.."
while pgrep -f "attn_depth_probe|perf_followup.sh" > /dev/null; do sleep 30; done
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" >&2
  line=$(timeout 2700 "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
timeout 2400 python scripts/chip_smoke.py >> "${OUT}.err" 2>&1
echo "chip_smoke rc=$?" | tee -a "$OUT"
run deep_ctx_7b_50 python bench.py --max-seq 2048 --start-pos 2048
run headline_7b_50 python bench.py
run int4_7b_50 python bench.py --weights int4
run spec_decode python scripts/bench_spec.py
echo "=== chain3 complete ===" >&2
