#!/bin/bash
# Probe the axon TPU pool with a short-timeout trivial client every ~10 min.
# Logs one line per attempt to tools/tpu_health.log. Stops after first success
# streak of 2 (pool healthy) or after MAX_HOURS.
LOG=/root/repo/tools/tpu_health.log
MAX_HOURS=${MAX_HOURS:-11}
END=$(( $(date +%s) + MAX_HOURS*3600 ))
streak=0
while [ $(date +%s) -lt $END ]; do
  t0=$(date +%s)
  out=$(timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256)); y=(x@x).block_until_ready()
print('OK', float(y.sum()))" 2>&1)
  rc=$?
  echo "$(date -u +%FT%TZ) rc=$rc $(echo "$out" | tail -1)" >> "$LOG"
  if [ $rc -eq 0 ]; then
    streak=$((streak+1))
    [ $streak -ge 2 ] && { echo "$(date -u +%FT%TZ) HEALTHY, exiting probe loop" >> "$LOG"; exit 0; }
    sleep 60
  else
    streak=0
    sleep 540
  fi
done
