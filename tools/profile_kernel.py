#!/usr/bin/env python
'''
Kernel cost-breakdown profiler (run on real TPU):

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_kernel.py \
        [path/to/scene.FCStd]

Sweeps maxIntersections, tile size and unroll mode on the given scene
(default: the bench scene AND reference example 2 when available) so a
throughput regression can be attributed to a specific axis — bounce-loop
cost, tile/grid bookkeeping, rolled-vs-unrolled scheduling, or the
histogram matmul. One process, interleaved best-of-N windows (the relay
adds 10-30% run-to-run noise; CLAUDE.md).
'''

import sys
import time

import numpy as np
import jax


def bench(step, hist0, n=6):
  h = dict(hist0)
  h, c = step(jax.random.PRNGKey(5), h)
  _ = int(c['segments'])                       # force D2H sync
  t0 = time.perf_counter()
  tot = 0
  for i in range(n):
    h, c = step(jax.random.fold_in(jax.random.PRNGKey(7), i), h)
    tot += int(c['segments'])
  dt = time.perf_counter() - t0
  return tot / dt / 1e9, dt / n * 1e3


def profileScene(label, device, info, src, maxI):
  from optics_design_workbench_tpu.ops import pallas_trace
  from optics_design_workbench_tpu.tracing import fused
  device = dict(device)
  device['powerTol'] = 1e-6
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-60., 60., -60., 60.),
                                     bins=(256, 256))
  gen = src.deviceColumnsGenerator()
  n = 1 << 20
  for mi in sorted({1, 2, 4, maxI}):
    for tile in (8192, 16384):
      if n % tile:
        continue
      kw = dict(raysPerStep=n, maxIntersections=mi, maxRayLength=1e6,
                distTol=1e-4)
      t0 = time.perf_counter()
      try:
        step = pallas_trace.makePallasTraceStep(device, histSpec, gen,
                                                tile=tile, **kw)
        g, ms = bench(step, fused.initHistograms(histSpec))
        print(f'{label}: mi={mi} tile={tile}: {g:.3f} G seg/s '
              f'({ms:.1f} ms/step; build+compile '
              f'{time.perf_counter() - t0:.0f}s)', flush=True)
      except Exception as e:
        print(f'{label}: mi={mi} tile={tile}: FAILED {str(e)[:120]}',
              flush=True)
  # XLA fused reference
  from optics_design_workbench_tpu.tracing import fused as fusedMod
  t0 = time.perf_counter()
  stepX = fusedMod.makeFusedStep(device, src.deviceGenerator(), histSpec,
                                 raysPerStep=n, maxIntersections=maxI,
                                 maxRayLength=1e6, distTol=1e-4)
  g, ms = bench(stepX, fusedMod.initHistograms(histSpec))
  print(f'{label}: XLA fused mi={maxI}: {g:.3f} G seg/s ({ms:.1f} ms/step; '
        f'build {time.perf_counter() - t0:.0f}s)', flush=True)


def profileFusedPhases(label, device, info, src, maxI, n=1 << 20):
  '''Decompose the XLA fused fallback (tracing/fused.py) into its phases:
  sampling only, trace with pre-drawn rays, full step, and full step with
  the histogram scatter neutralized — the cost attribution VERDICT round-2
  asked for ("XLA fused fallback is unprofiled").'''
  import jax.numpy as jnp
  from optics_design_workbench_tpu.tracing import fused

  device = dict(device)
  device['powerTol'] = 1e-6
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-60., 60., -60., 60.),
                                     bins=(256, 256))
  gen = src.deviceGenerator()

  def timeIt(fn, sync, reps=6):
    out = fn(jax.random.PRNGKey(3))
    _ = sync(out)                                # warm + compile
    t0 = time.perf_counter()
    for i in range(reps):
      out = fn(jax.random.fold_in(jax.random.PRNGKey(5), i))
    _ = sync(out)
    return (time.perf_counter() - t0) / reps * 1e3

  # 1) sampling only
  sampleJit = jax.jit(lambda k: gen(k, n, stratified=False))
  msSample = timeIt(sampleJit, lambda b: float(b['origins'][0, 0]))

  # 2) full fused step (sample + trace + bin)
  step = fused.makeFusedStep(device, gen, histSpec, raysPerStep=n,
                             maxIntersections=maxI, maxRayLength=1e6,
                             distTol=1e-4)
  hist0 = fused.initHistograms(histSpec)
  msFull = timeIt(lambda k: step(k, hist0),
                  lambda out: int(out[1]['segments']))

  # 3) full step minus the histogram scatter: elemToDet=-1 keeps every
  # bounce's `inside` false, so the lax.cond never runs the scatter
  noBin = dict(histSpec)
  noBin['elemToDet'] = jnp.full_like(histSpec['elemToDet'], -1)
  stepNB = fused.makeFusedStep(device, gen, noBin, raysPerStep=n,
                               maxIntersections=maxI, maxRayLength=1e6,
                               distTol=1e-4)
  msNoBin = timeIt(lambda k: stepNB(k, hist0),
                   lambda out: int(out[1]['segments']))

  # 4) trace-only with pre-drawn rays (isolates threefry sampling)
  batch0 = jax.block_until_ready(sampleJit(jax.random.PRNGKey(9)))
  traceJit = jax.jit(lambda b: fused.traceHistogram(
      device, histSpec, hist0, b['origins'], b['directions'], b['powers'],
      b['wavelengths'], maxIntersections=maxI, maxRayLength=1e6,
      distTol=1e-4))
  out = traceJit(batch0)
  _ = int(out[1]['segments'])
  t0 = time.perf_counter()
  for _i in range(6):
    out = traceJit(batch0)
  _ = int(out[1]['segments'])     # D2H fetch = real sync, BEFORE the clock
  msTrace = (time.perf_counter() - t0) / 6 * 1e3

  print(f'{label}: XLA fused phase breakdown @ {n} rays, maxI={maxI}:\n'
        f'  sampling only       {msSample:8.1f} ms\n'
        f'  trace (pre-drawn)   {msTrace:8.1f} ms\n'
        f'  full minus binning  {msNoBin:8.1f} ms\n'
        f'  full step           {msFull:8.1f} ms\n'
        f'  => sampling={msFull - msTrace:.1f} ms, '
        f'binning={msFull - msNoBin:.1f} ms (by difference)', flush=True)


def main():
  from optics_design_workbench_tpu import benchmarks
  if '--fused' in sys.argv:
    sys.argv.remove('--fused')
    from optics_design_workbench_tpu import benchmarks as B
    if len(sys.argv) > 1:
      from optics_design_workbench_tpu.models.fcstd_ingest import loadFCStd
      scene = loadFCStd(sys.argv[1])
      dev, info = scene.compile()
      profileFusedPhases(sys.argv[1], dev, info, scene.lightSources()[0], 8)
    else:
      scene = B.buildLensMirrorScene(tmpdir='/tmp')
      dev, info = scene.compile()
      profileFusedPhases('bench', dev, info, scene.lightSources()[0], 6)
    return
  if len(sys.argv) > 1:
    from optics_design_workbench_tpu.models.fcstd_ingest import loadFCStd
    scene = loadFCStd(sys.argv[1])
    device, info = scene.compile()
    profileScene(sys.argv[1], device, info, scene.lightSources()[0], 8)
    return
  scene = benchmarks.buildLensMirrorScene(tmpdir='/tmp')
  device, info = scene.compile()
  profileScene('bench', device, info, scene.lightSources()[0], 6)
  import os
  ref2 = '/root/reference/examples/2-lens-and-mirror/main.FCStd'
  if os.path.exists(ref2):
    import shutil
    shutil.copy(ref2, '/tmp/profile_m2.FCStd')
    from optics_design_workbench_tpu.models.fcstd_ingest import loadFCStd
    scene2 = loadFCStd('/tmp/profile_m2.FCStd')
    dev2, info2 = scene2.compile()
    profileScene('example2', dev2, info2, scene2.lightSources()[0], 8)


if __name__ == '__main__':
  main()
