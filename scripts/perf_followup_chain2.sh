#!/usr/bin/env bash
# chain-2: wait for perf_followup.sh, then run the attention depth probe
set -u
cd "$(dirname "$0")/.."
while pgrep -f "perf_followup.sh" > /dev/null; do sleep 30; done
timeout 1800 python experiments/attn_depth_probe.py > /tmp/attn_depth_probe.log 2>&1
echo rc=$? >> /tmp/attn_depth_probe.log
