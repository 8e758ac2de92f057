#!/bin/bash
# Armed TPU measurement pipeline: waits for the axon relay (port 8083),
# then runs the round-3 measurement sequence sequentially (one TPU process
# at a time).  Logs land in /tmp/tpu_pipe_*.log.
set -u
cd /root/repo

WAIT_MAX=${WAIT_MAX:-14400}   # give up after 4h of waiting
waited=0
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; do
  sleep 30
  waited=$((waited + 30))
  if [ "$waited" -ge "$WAIT_MAX" ]; then
    echo "RELAY NEVER CAME UP (waited ${waited}s)" | tee /tmp/tpu_pipe_status
    exit 2
  fi
done
echo "relay up after ${waited}s at $(date)" | tee /tmp/tpu_pipe_status

# quick sanity: can we actually run on the TPU?
if ! timeout 120 python -c "
import jax
jax.config.update('jax_platforms', 'axon,cpu')
d = jax.devices()[0]
print('device:', d)
import jax.numpy as jnp
print(float(jnp.ones(8).sum()))
" > /tmp/tpu_pipe_sanity.log 2>&1; then
  echo "SANITY FAILED" >> /tmp/tpu_pipe_status
  cat /tmp/tpu_pipe_sanity.log
  exit 3
fi
echo "sanity ok" >> /tmp/tpu_pipe_status

# 1) TPU-only solve (no CPU baseline, no transient): the headline number,
#    warms the compile cache for everything after.
BENCH_NO_CPU=1 BENCH_NO_TRANSIENT=1 timeout 3600 python bench.py \
  > /tmp/tpu_pipe_bench_tpuonly.log 2>&1
echo "bench tpu-only rc=$?" >> /tmp/tpu_pipe_status

# 2) operator probe: where does a Krylov iteration's time go now
#    (row-panel GS + bf16-ext tables + tiled Pallas, all new since the
#    last probe).
BENCH_PROBE=1 timeout 1800 python bench.py \
  > /tmp/tpu_pipe_probe.log 2>&1
echo "probe rc=$?" >> /tmp/tpu_pipe_status

# 3) A/B: splitK on the tiled apply (NSTPU_SPLITK), kernel microbench.
PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python scripts/microbench_apply3.py \
  > /tmp/tpu_pipe_mb3.log 2>&1
echo "microbench rc=$?" >> /tmp/tpu_pipe_status

echo "PIPELINE DONE at $(date)" >> /tmp/tpu_pipe_status
