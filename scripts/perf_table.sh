#!/usr/bin/env bash
# Re-measure the full perf table on the current toolchain (VERDICT r2 #3).
# Sequential single-chip runs; each bench.py invocation emits one JSON line
# (degraded-mode: a broken path never zeroes the row). Results accumulate
# in $OUT as "<tag> <json>" lines.
set -u
OUT=${1:-/tmp/perf_table_r3.log}
: > "$OUT"
run() {
  tag=$1; shift
  echo "=== $tag: bench.py $* ===" >&2
  line=$(timeout 2400 python bench.py "$@" 2>>"${OUT}.err")
  echo "$tag $line" | tee -a "$OUT"
}
cd "$(dirname "$0")/.."
run headline_7b_50
run deep_ctx_7b_50 --max-seq 2048 --start-pos 2048
run int8_7b_50 --weights int8
run int8_8b_50 --model llama-3-8b --weights int8
run int4_7b_50 --weights int4
run batch4_7b_50 --batch 4
run batch8_7b_50 --batch 8
run sparsity25_7b --sparsity 0.25
run sparsity40_7b --sparsity 0.4
echo "=== perf table complete ===" >&2
