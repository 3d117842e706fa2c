#!/usr/bin/env bash
# chain-9: re-run the slope-timed attention variant probe after chain-8
set -u
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain[345678]|attn_variant_probe|attn_depth_probe|chip_smoke|spec_probe" > /dev/null; do sleep 30; done
timeout 2700 python experiments/attn_variant_probe.py > /tmp/attn_variant_probe2.log 2>&1
echo "rc=$?" >> /tmp/attn_variant_probe2.log
