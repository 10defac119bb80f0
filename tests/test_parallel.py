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
  from jax import shard_map
  from jax.sharding import PartitionSpec as P

  def sample(keys):
    key = jax.random.fold_in(keys[0], jax.lax.axis_index('rays'))
    batch = gen(key, 64)
    return batch['directions']

  sharded = shard_map(sample, mesh=mesh, in_specs=(P('rays'),),
                      out_specs=P('rays'), check_vma=False)
  keys = jax.random.split(jax.random.PRNGKey(5), 8)
  out = np.asarray(sharded(keys))            # (8*64, 3)
  shards = out.reshape(8, 64, 3)
  # different shards draw different samples
  assert not np.allclose(shards[0], shards[1])


def test_fans_shard_with_padding_matches_single_device(tmp_path):
  '''Deterministic fan batches whose ray count does not divide the mesh
  (4 fans x 33 rays = 132, 132 % 8 = 4) are padded with throwaway rays and
  sharded statically over all 8 devices; the recorded hit set must equal
  the unsharded run exactly (the TPU analog of the reference's
  initial-conditions queue, results_store.py:679-738).'''
  import glob
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  from optics_design_workbench_tpu import simulation
  from optics_design_workbench_tpu.simulation import results_store as RS

  def makeScene(path):
    scene = Scene(label='fanshard', path=path)
    scene.addOpticalGroup(OpticalGroup(
        OpticalType='Absorber', Label='Detector',
        surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(50., 50.))],
        placements=[T.translation(0, 0, 100)]))
    scene.addSource(PointSource(
        Label='Source', PowerDensity='exp(-theta^2/0.01)',
        ThetaDomain='0, pi/4', Wavelength=532., Fans=4, RaysPerFan=33,
        ThetaResolutionNumericMode='2e4'))
    scene.addSimulationSettings(
        RaysPerIteration=1000, MaxIntersections=5, MaxRayLength=1000,
        EnableStoreSingleShotData=True,
        StoreHitFanIndex=True, StoreHitRayIndex=True)
    return scene

  def loadHits(runPath):
    cols = None
    for folder in glob.glob(f'{runPath}/source-*/object-*'):
      for f in RS.resultFilePaths(folder, 'hits'):
        data = RS.loadResultFile(f)
        if cols is None:
          cols = {k: [v] for k, v in data.items() if v.ndim > 0}
        else:
          for k in cols:
            cols[k].append(data[k])
    out = {k: np.concatenate(v) for k, v in cols.items()}
    n = len(out['points'])
    return {k: v for k, v in out.items() if len(v) == n}

  single = loadHits(simulation.runSimulation(
      makeScene(str(tmp_path / 'single')), 'fans', store=True))
  sharded = loadHits(simulation.runSimulation(
      makeScene(str(tmp_path / 'sharded')), 'fans', store=True,
      mesh=makeMesh(nDevices=8)))
  assert len(sharded['points']) == len(single['points'])

  def sortRows(cols):
    order = np.lexsort((cols['rayIndex'], cols['fanIndex']))
    return {k: v[order] for k, v in cols.items()}

  s1, s2 = sortRows(single), sortRows(sharded)
  np.testing.assert_allclose(s2['points'], s1['points'], atol=1e-5)
  np.testing.assert_array_equal(s2['fanIndex'], s1['fanIndex'])
  np.testing.assert_array_equal(s2['rayIndex'], s1['rayIndex'])
