'''
Multi-chip path tests on the virtual 8-device CPU mesh: the shard_map fused
step must agree with the single-device fused step (same physics, psum'd
histograms), and per-shard RNG streams must differ.
'''

import numpy as np
import jax
import pytest

from optics_design_workbench_tpu import benchmarks
from optics_design_workbench_tpu.parallel import makeMesh
from optics_design_workbench_tpu.tracing import fused


def test_sharded_step_matches_single_device():
  mesh = makeMesh(nDevices=8)
  N = 8 * 512
  stepSharded, hist0, meta = benchmarks.makeBenchStep(
      raysPerStep=N, maxIntersections=4, mesh=mesh, bins=(32, 32))
  histS, countersS = stepSharded(jax.random.PRNGKey(0), hist0)
  segS, hitsS = int(countersS['segments']), int(countersS['hits'])
  assert segS >= N                      # at least one segment per ray
  assert hitsS > 0.9 * N                # nearly all rays reach the detector
  total = float(histS['counts'].sum())
  assert total == hitsS

  # single-device step on the same scene: statistics agree within MC error
  stepSingle, hist1, _ = benchmarks.makeBenchStep(
      raysPerStep=N, maxIntersections=4, mesh=None, bins=(32, 32),
      usePallas=False)
  hist1, counters1 = stepSingle(jax.random.PRNGKey(0), hist1)
  hits1 = int(counters1['hits'])
  assert abs(hitsS - hits1) < 0.05 * N

  # centroid of the detector spot agrees
  def centroid(h):
    H = np.asarray(h['counts'])[0]
    n = H.sum()
    ys, xs = np.indices(H.shape)
    return (H * ys).sum() / n, (H * xs).sum() / n
  cS, c1 = centroid(histS), centroid(hist1)
  assert abs(cS[0] - c1[0]) < 1.5 and abs(cS[1] - c1[1]) < 1.5


def test_sharded_steps_accumulate():
  mesh = makeMesh(nDevices=8)
  N = 8 * 256
  step, hist, meta = benchmarks.makeBenchStep(
      raysPerStep=N, maxIntersections=4, mesh=mesh, bins=(32, 32))
  hist, c1 = step(jax.random.PRNGKey(1), hist)
  t1 = float(hist['counts'].sum())
  hist, c2 = step(jax.random.PRNGKey(2), hist)
  t2 = float(hist['counts'].sum())
  # accumulation without shard-count double counting
  assert t2 == t1 + int(c2['hits'])


def test_per_shard_rng_streams_differ():
  mesh = makeMesh(nDevices=8)
  scene = benchmarks.buildSourceDetectorScene()
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  gen = scene.lightSources()[0].deviceGenerator()
  from jax.experimental.shard_map import shard_map
  from jax.sharding import PartitionSpec as P

  def sample(keys):
    key = jax.random.fold_in(keys[0], jax.lax.axis_index('rays'))
    batch = gen(key, 64)
    return batch['directions']

  sharded = shard_map(sample, mesh=mesh, in_specs=(P('rays'),),
                      out_specs=P('rays'), check_rep=False)
  keys = jax.random.split(jax.random.PRNGKey(5), 8)
  out = np.asarray(sharded(keys))            # (8*64, 3)
  shards = out.reshape(8, 64, 3)
  # different shards draw different samples
  assert not np.allclose(shards[0], shards[1])
