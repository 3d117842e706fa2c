#!/usr/bin/env bash
# chain-8: speculative latency decomposition after chain-7
set -u
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup_chain[34567]|attn_variant_probe|attn_depth_probe|chip_smoke" > /dev/null; do sleep 30; done
timeout 2700 python experiments/spec_probe.py > /tmp/spec_probe.log 2>&1
echo "rc=$?" >> /tmp/spec_probe.log
