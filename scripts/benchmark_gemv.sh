#!/usr/bin/env bash
# Kernel-level sparsity sweep vs dense and roofline
# (parity with reference scripts/benchmark_gemv.py protocol)
set -euo pipefail
python experiments/block_perf.py
