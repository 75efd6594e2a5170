#!/bin/bash
# Watch for tunnel recovery; on first successful probe, run the round-4
# TPU validation sequence once, then exit.  Serial probes only.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 150 python -c "
import numpy as np, jax
d=jax.devices()
y=np.asarray(jax.jit(lambda v: v*2.0)(np.arange(16,dtype=np.float32)))
assert y[3]==6.0
print('tunnel up:', d[0])
" >> /tmp/r4_watch.log 2>&1; then
    echo "== tunnel recovered $(date +%H:%M:%S), running validation" >> /tmp/r4_watch.log
    bash tools/tpu_round4_runner.sh >> /tmp/r4_watch.log 2>&1
    echo "== runner done rc=$? $(date +%H:%M:%S)" >> /tmp/r4_watch.log
    exit 0
  fi
  echo "probe failed $(date +%H:%M:%S)" >> /tmp/r4_watch.log
  sleep 240
done
