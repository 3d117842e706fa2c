#!/bin/bash
# Probe the tunneled TPU until it answers; log each attempt.
# Usage: bash experiments/tpu_probe_loop.sh /tmp/tpu_probe.log
LOG="${1:-/tmp/tpu_probe.log}"
for i in $(seq 1 40); do
  echo "[$(date +%H:%M:%S)] probe $i" >> "$LOG"
  timeout 600 python -c "
import jax, jax.numpy as jnp, time
t0=time.time()
x = jnp.ones((1024,1024), jnp.bfloat16)
y = jax.device_get((x@x)[0,0])
print('TPU OK:', y, 'in', round(time.time()-t0,1), 's')
" >> "$LOG" 2>&1
  if grep -q "TPU OK" "$LOG"; then
    echo "[$(date +%H:%M:%S)] TPU RECOVERED" >> "$LOG"
    exit 0
  fi
  sleep 240
done
echo "[$(date +%H:%M:%S)] giving up" >> "$LOG"
exit 1
