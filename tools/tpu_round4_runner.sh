#!/bin/bash
# Round-4 TPU validation sequence — run when the tunnel recovers.
# Serial, one probe/bench process at a time (CLAUDE.md probing protocol).
# Logs land in /tmp/r4_*.log; exits nonzero on the first hard failure.
set -u
cd "$(dirname "$0")/.."

echo "== 1/4 smoke probe $(date +%H:%M:%S)"
timeout 600 python -c "
import time, numpy as np, jax
t0=time.time(); d=jax.devices()
y=np.asarray(jax.jit(lambda v: v*2.0)(np.arange(16,dtype=np.float32)))
print('probe ok', d[0], y[3]==6.0, round(time.time()-t0,1))
" 2>&1 | tail -2 | tee /tmp/r4_probe.log || exit 1

echo "== 2/4 cr1 fused-kernel probe (vs ci1, bench geometry) $(date +%H:%M:%S)"
timeout 3000 python tools/tpu_cr1_probe.py --rounds 3 \
    > /tmp/r4_cr1.log 2>&1
tail -5 /tmp/r4_cr1.log

echo "== 3/4 sharded demod probe $(date +%H:%M:%S)"
timeout 3000 python tools/tpu_shard_probe.py > /tmp/r4_shard.log 2>&1
tail -4 /tmp/r4_shard.log

echo "== 4/4 full bench $(date +%H:%M:%S)"
AIS_TPU_BENCH_BUDGET_S=2400 timeout 2500 python bench.py \
    > /tmp/r4_bench.log 2>/tmp/r4_bench.err
tail -1 /tmp/r4_bench.log
echo "done $(date +%H:%M:%S)"
