#!/bin/bash
# Chip runbook for this round — run ONE at a time (never two chip jobs:
# host-side compile contention makes 4-min suites exceed 15 min).
# Ordered by importance: secure the headline bench first, then the
# open int4@G=128 bisect, then coverage rows.
set -u
cd "$(dirname "$0")/.."
LOG_DIR=/tmp/chip_r2
mkdir -p "$LOG_DIR"
run() {
    name="$1"; tmo="$2"; shift 2
    echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG_DIR/summary.log" >&2
    timeout "$tmo" "$@" > "$LOG_DIR/${name}.log" 2>&1
    rc=$?
    echo "${name}_exit=$rc" | tee -a "$LOG_DIR/summary.log" >&2
    tail -n 6 "$LOG_DIR/${name}.log" | tee -a "$LOG_DIR/summary.log" >&2
}

for job in "$@"; do
    case "$job" in
        headline)  run headline 2400 python bench.py ;;                      # full-protocol 1.92x row
        bisect)    run bisect 2400 python experiments/int4_bisect.py ;;      # int4@G=128 backend error
        deep2048)  run deep2048 2400 python bench.py --quick --max-seq 2048 --start-pos 2032 ;;
        batch4)    run batch4 2400 python bench.py --quick --batch 4 ;;      # batched token kernel
        int4)      run int4 2400 python bench.py --quick --weights int4 ;;   # after bisect resolves
        int4g64)   run int4g64 2400 python bench.py --quick --weights int4 --block-size 64 --no-token ;;
        mistral8)  run mistral8 2400 python bench.py --quick --model Mistral-7B --weights int8 ;;
        mistral)   run mistral 2400 python bench.py --quick --model Mistral-7B ;;  # bf16 ~15 GB: may OOM
        b13int8)   run b13int8 2400 python bench.py --quick --model 13B --weights int8 ;;
        greedy)    run greedy 3600 python experiments/greedy_profile_bench.py ;;
        *) echo "unknown job $job" >&2 ;;
    esac
done
