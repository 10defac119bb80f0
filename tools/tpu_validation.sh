#!/bin/bash
# One-shot TPU validation pass for when the axon relay recovers:
#   bash tools/tpu_validation.sh [logfile]
# Probes the relay with a tiny matmul first (the relay hangs indefinitely
# when degraded — CLAUDE.md), then runs, in order: the headline bench, the
# kernel profiler (bench scene + example 2 + XLA-fused phase breakdown)
# and the hardware equivalence suite. Every stage is timeout-bounded so a
# mid-run relay outage cannot wedge the driver.
set -u
LOG=${1:-/tmp/tpu_validation.log}
cd /root/repo
# tools/*.py run with sys.path[0]=tools/ — put the repo (and the axon site,
# which must stay importable whenever PYTHONPATH is overridden; CLAUDE.md)
# on the path explicitly
export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
echo "=== tpu_validation $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "--- probe ---" | tee -a "$LOG"
# the relay degrades/hangs for stretches of minutes; retry the probe with
# backoff before giving up so a transient outage doesn't abort the pass
PROBE_OK=0
for attempt in 1 2 3; do
  timeout 240 python -c "
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((128, 128), jnp.bfloat16)
print('probe ok:', float((x @ x)[0, 0]), f'{time.time()-t0:.1f}s',
      jax.devices())" 2>&1 | tail -2 | tee -a "$LOG"
  if [ ${PIPESTATUS[0]} -eq 0 ]; then
    PROBE_OK=1
    break
  fi
  echo "probe attempt $attempt failed; retrying in 60s" | tee -a "$LOG"
  sleep 60
done
if [ $PROBE_OK -ne 1 ]; then
  echo "RELAY STILL DOWN after 3 probes — aborting" | tee -a "$LOG"
  exit 1
fi

echo "--- bench.py ---" | tee -a "$LOG"
timeout 1800 python bench.py 2>&1 | tail -6 | tee -a "$LOG"

echo "--- profile_kernel (bench + example2) ---" | tee -a "$LOG"
timeout 3000 python tools/profile_kernel.py 2>&1 | tail -30 | tee -a "$LOG"

echo "--- profile_kernel --fused (XLA fallback phases) ---" | tee -a "$LOG"
timeout 1800 python tools/profile_kernel.py --fused 2>&1 | tail -10 \
  | tee -a "$LOG"

echo "--- scene_throughput (VERDICT done-criteria) ---" | tee -a "$LOG"
timeout 4200 python tools/scene_throughput.py \
  --json /tmp/scene_throughput.json 2>&1 | tail -18 | tee -a "$LOG"

echo "--- scene_throughput XLA-fallback documentation numbers ---" | tee -a "$LOG"
timeout 3000 python tools/scene_throughput.py \
  --only xla_mesh_12k,xla_surf_5k,xla_surf_wall,xla_coupled_scatter,xla_mesh_dish_5k \
  --json /tmp/scene_throughput_fallbacks.json 2>&1 | tail -8 | tee -a "$LOG"

echo "--- hardware equivalence suite ---" | tee -a "$LOG"
OPTICS_TPU_TESTS_ON_TPU=1 timeout 5400 python -m pytest \
  tests/test_pallas_tpu.py -q -p no:cacheprovider 2>&1 | tail -4 \
  | tee -a "$LOG"

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
