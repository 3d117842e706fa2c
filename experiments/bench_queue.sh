#!/bin/bash
# Sequential chip-bench queue (one chip job at a time; bench.py retries
# transient RESOURCE_EXHAUSTED from the runtime's lazy memory reclaim).
set -u
cd "$(dirname "$0")/.."
run() {
    name="$1"; shift
    echo "=== $name: $* ===" >&2
    timeout 2400 python bench.py "$@" > "/tmp/bench_${name}.log" 2>&1
    echo "${name}_exit=$?" >> "/tmp/bench_${name}.log"
    tail -n 4 "/tmp/bench_${name}.log" >&2
}
for job in "$@"; do
    case "$job" in
        quick)       run quick --quick ;;
        long2048)    run long2048 --quick --max-seq 2048 ;;
        deep2048)    run deep2048 --quick --max-seq 2048 --start-pos 2032 ;;
        b13int8)     run 13b_int8 --quick --model 13B --weights int8 ;;
        b13int4)     run 13b_int4 --quick --model 13B --weights int4 ;;
        mistral)     run mistral --quick --model Mistral-7B ;;
        int4)        run int4_7b --quick --weights int4 ;;
        *) echo "unknown job $job" >&2 ;;
    esac
done
