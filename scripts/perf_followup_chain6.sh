#!/usr/bin/env bash
# chain-6: after chain-5 — re-run the smoke gate + depth probe against
# the fp32-row-buffer decode_attention fix (the chain-3 smoke ran the
# pre-fix file).
set -u
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain3|perf_followup_chain4|perf_followup_chain5|attn_variant_probe" > /dev/null; do sleep 30; done
timeout 2400 python scripts/chip_smoke.py > /tmp/chip_smoke_r3b.log 2>&1
echo "chip_smoke rc=$?" >> /tmp/chip_smoke_r3b.log
timeout 1800 python experiments/attn_depth_probe.py > /tmp/attn_depth_probe2.log 2>&1
echo "rc=$?" >> /tmp/attn_depth_probe2.log
