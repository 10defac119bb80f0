'''Pallas fused-kernel equivalence checks — run only on real TPU hardware
(the CPU test mesh cannot execute Mosaic kernels; the driver's bench run
exercises this path every round regardless).'''

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != 'tpu',
    reason='pallas trace kernel requires a TPU backend')


def test_in_kernel_hist_matches_scatter():
  from optics_design_workbench_tpu import benchmarks
  from optics_design_workbench_tpu.ops import histogram

  key = jax.random.PRNGKey(42)
  step, hist, meta = benchmarks.makeBenchStep(raysPerStep=1 << 15)
  assert meta['backend'] == 'pallas'
  hK, cK = step(key, hist)

  orig = histogram.matmulWorthwhile
  histogram.matmulWorthwhile = lambda *a: False
  try:
    # histPrecision='high' routes around the in-kernel path; the patched
    # heuristic then forces the plain scatter
    stepS, histS, _ = benchmarks.makeBenchStep(raysPerStep=1 << 15,
                                               histPrecision='high')
    hS, cS = stepS(key, histS)
  finally:
    histogram.matmulWorthwhile = orig

  assert np.array_equal(np.asarray(hK['counts']), np.asarray(hS['counts']))
  for k in cK:
    assert int(cK[k]) == int(cS[k])
  pm, ps = np.asarray(hK['power']), np.asarray(hS['power'])
  # bf16 binning: per-bin error bounded well below shot noise
  assert np.abs(pm - ps).max() < 1e-2 * max(ps.max(), 1.)
  assert abs(pm.sum() - ps.sum()) < 2e-3 * ps.sum()
