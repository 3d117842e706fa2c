#!/usr/bin/env bash
# Round-3 follow-up chip jobs: wait for a running perf_table.sh to free
# the chip, then re-run the rows it lost to transient compile-service
# errors, the speculative bench, and deep-context diagnostics.
set -u
OUT=${1:-/tmp/perf_followup_r3.log}
: > "$OUT"
cd "$(dirname "$0")/.."
while pgrep -f "perf_table.sh" > /dev/null; do sleep 30; done
run() {
  tag=$1; shift
  echo "=== $tag: $* ===" >&2
  line=$(timeout 2700 "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
run headline_7b_50 python bench.py
run int4_7b_50 python bench.py --weights int4
run batch8_7b_50 python bench.py --batch 8
run spec_decode python scripts/bench_spec.py
# deep-context diagnostics: where do the 16.9 ms/token go?
run deep_fixedsel python bench.py --max-seq 2048 --start-pos 2048 --fixed-selection --phases sparse
run deep_notoken python bench.py --max-seq 2048 --start-pos 2048 --no-token --phases sparse
run deep_perkernel python bench.py --max-seq 2048 --start-pos 2048 --no-token --no-packed --phases sparse
echo "=== followup complete ===" >&2
