'''MXU one-hot-matmul histogram accumulation vs the scatter it replaces.'''

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optics_design_workbench_tpu.ops import histogram


@pytest.mark.parametrize('rows,cols,n', [(256, 256, 1 << 14),
                                         (8, 128, 1000),      # pad path
                                         (1, 16, 64)])
def test_matches_scatter(rows, cols, n):
  rng = np.random.default_rng(0)
  flatIdx = rng.integers(0, rows * cols, n).astype(np.int32)
  payload = rng.random((n, 2)).astype(np.float32)
  # zero-payload masking contract: clamped-invalid entries contribute 0
  payload[: n // 10] = 0.

  got = np.asarray(histogram.matmulAccumulate(
      jnp.asarray(flatIdx), jnp.asarray(payload), rows, cols, chunk=512))
  want = np.zeros((rows * cols, 2), np.float64)
  np.add.at(want, flatIdx, payload.astype(np.float64))
  # CPU matmuls are exact f32 regardless of the precision flag
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_precision_flags_accepted():
  flatIdx = jnp.zeros((100,), jnp.int32)
  payload = jnp.ones((100, 1))
  for prec in ('default', 'high', 'highest'):
    out = histogram.matmulAccumulate(flatIdx, payload, 4, 128,
                                     chunk=128, precision=prec)
    assert float(out[0, 0]) == 100.


def test_worthwhile_heuristic():
  # bench shape: clear win
  assert histogram.matmulWorthwhile(256, 256, 1 << 20)
  # many detectors / huge histograms: fall back to scatter
  assert not histogram.matmulWorthwhile(4096, 256, 1 << 20)
  assert not histogram.matmulWorthwhile(256, 4096, 1 << 20)
  # tiny batches: scatter is cheap anyway
  assert not histogram.matmulWorthwhile(256, 256, 128)


def test_additivity_under_jit():
  '''Accumulating twice == accumulating the concatenation (the step adds
  the matmul result onto the running histogram).'''
  rng = np.random.default_rng(1)
  idx = jnp.asarray(rng.integers(0, 32 * 64, 4096).astype(np.int32))
  pay = jnp.asarray(rng.random((4096, 1)).astype(np.float32))

  acc = jax.jit(lambda i, p: histogram.matmulAccumulate(i, p, 32, 64,
                                                        chunk=1024))
  a = acc(idx[:2048], pay[:2048]) + acc(idx[2048:], pay[2048:])
  b = acc(idx, pay)
  np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                             atol=1e-6)
