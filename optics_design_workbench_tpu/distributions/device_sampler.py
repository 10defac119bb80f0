'''
On-device sampling from compiled random variables.

The reference draws all random numbers with per-process numpy and feeds them
through python loops (random_number_generator.py:467-560). Here the compiled
per-variable conditional inverse-CDF transforms are exported as JAX arrays so
that source sampling runs *inside* the jitted trace step: millions of
(theta, phi) draws per step, chained conditionally, with `jax.random` keyed
streams. Conditional draws use a vectorized binary search over the CDF rows
instead of materializing per-draw CDF columns, so HBM traffic stays at
O(N log R) gathered scalars.
'''

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


_TENT_Q = 257


def tentInterp(table, u):
  '''Linear interpolation of `table` ((Q,), tabulated on a uniform [0,1]
  grid) at quantiles u — evaluated as a matmul with a tent-weight matrix so
  it runs on the MXU instead of per-lane gathers.'''
  Q = table.shape[0]
  pos = u * (Q - 1)
  cols = jnp.arange(Q, dtype=pos.dtype)
  W = jnp.maximum(0., 1. - jnp.abs(pos[:, None] - cols[None, :]))
  return W @ table


def nearestIndex(grid, x):
  '''Index of the nearest entry of sorted 1-D `grid` for each x (device).'''
  pos = jnp.clip(jnp.searchsorted(grid, x), 1, grid.shape[0] - 1)
  lo, hi = grid[pos - 1], grid[pos]
  return jnp.where(jnp.abs(x - lo) <= jnp.abs(hi - x), pos - 1, pos)


def interpInverseRows(cdf, values, rows, u):
  '''
  Row-wise inverse interpolation: for each draw j, find v such that
  cdf[rows[j], :] crosses u[j] and linearly interpolate into `values`.
  cdf rows are ascending with cdf[:, 0] == 0 and cdf[:, -1] == 1.
  Implemented as a batched binary search (log2(R) gathers of N scalars).
  '''
  R = cdf.shape[1]
  lo = jnp.zeros(rows.shape, dtype=jnp.int32)
  hi = jnp.full(rows.shape, R - 1, dtype=jnp.int32)
  steps = int(math.ceil(math.log2(max(R, 2))))

  def body(_, lh):
    lo, hi = lh
    mid = (lo + hi) // 2
    cm = cdf[rows, mid]
    goRight = u >= cm
    return (jnp.where(goRight, mid, lo), jnp.where(goRight, hi, mid))

  lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
  c0, c1 = cdf[rows, lo], cdf[rows, hi]
  v0, v1 = values[lo], values[hi]
  frac = jnp.where(c1 > c0, (u - c0) / (c1 - c0), 0.)
  return v0 + frac * (v1 - v0)


def _tablesFromTransform(vrv, varI, dtype):
  '''Build the device table dict for one variable of a compiled
  VectorRandomVariable.'''
  import sympy as sy
  from .random_variables import _NumericTransform

  t = vrv._transforms[varI]
  discreteVals = np.asarray(getattr(t, 'discreteVals', np.zeros(0)), dtype=float)
  discreteProbs = np.asarray(getattr(t, 'discreteProbs', np.zeros(0)), dtype=float)

  if isinstance(t, _NumericTransform):
    values, cdf, laterGrids = t.values, t.cdf, t.laterGrids
  else:
    # analytic mode: tabulate the continuum part numerically
    smooth = (vrv._probabilityDensityExpr
              .replace(sy.Heaviside, lambda *a: 0)
              .replace(sy.DiracDelta, lambda *a: 0))
    if smooth == 0 and len(discreteVals):
      # purely discrete variable: dummy continuum table (never selected
      # because the discrete probabilities sum to one)
      l1, l2 = vrv._variableDomains.get(str(vrv._variables[varI]), (0., 1.))
      values = np.linspace(l1, l2, 2)
      cdf = np.array([[0., 1.]])
      laterGrids = []
    else:
      num = vrv._numericTransform(varI, exprOverride=smooth)
      values, cdf, laterGrids = num.values, num.cdf, num.laterGrids

  # zero-mass conditional rows would be NaN; replace with a uniform ramp so
  # they cannot poison downstream arithmetic (they are only reachable via
  # measure-zero conditioning values)
  ramp = np.linspace(0., 1., cdf.shape[1])
  cdf = np.where(np.isnan(cdf), ramp[None, :], cdf)

  # conditioning grids come from linspace in practice: record uniform-grid
  # parameters so nearest-index lookups become a round() instead of a
  # searchsorted binary-search loop (~58 ms per 1e6 draws on v5e)
  gridMeta = []
  for g in laterGrids:
    g = np.asarray(g, dtype=float)
    steps = np.diff(g)
    uniform = len(g) > 1 and np.allclose(steps, steps[0], rtol=1e-6)
    gridMeta.append((bool(uniform), float(g[0]),
                     float(steps[0]) if len(g) > 1 else 1., len(g)))
  # host numpy here — buildDeviceTables post-processes these rows and
  # transfers everything to device exactly once at the end (device-side
  # dtype conversions each cost one tiny XLA compile, ~0.5 s over a
  # remote-compile link)
  npDtype = np.dtype(dtype.dtype if hasattr(dtype, 'dtype') else dtype)
  return dict(
      values=np.asarray(values, dtype=npDtype),
      cdf=np.asarray(cdf, dtype=npDtype),
      laterGrids=tuple(np.asarray(g, dtype=npDtype) for g in laterGrids),
      laterGridMeta=tuple(gridMeta),
      discreteVals=np.asarray(discreteVals, dtype=npDtype),
      discreteCum=np.cumsum(discreteProbs).astype(npDtype),
  )


def buildDeviceTables(vrv, dtype=jnp.float32, quantileRes=4097):
  '''
  Export a compiled VectorRandomVariable as a tuple of per-variable device
  table dicts (a pytree), ordered like vrv._variables. Pass the result to
  `deviceDraw`. When a `variableOrder` was given, the output rows of
  `deviceDraw` follow it.

  Each variable also carries a pre-inverted CDF tabulated on a uniform
  quantile grid (`invCdf`, shape (M, quantileRes)): drawing then costs two
  flat gathers + a lerp instead of a per-draw binary search over the CDF —
  the difference between ~376 ms and ~10 ms per 1e6 conditional draws on a
  v5e chip.
  '''
  if vrv._transforms is None:
    vrv.compile()
  tables = tuple(_tablesFromTransform(vrv, i, dtype)
                 for i in range(len(vrv._variables)))
  # pre-invert the CDF rows onto a uniform quantile grid; detect structure
  # that removes gathers entirely (each 1e6-element random gather costs
  # ~9 ms on a v5e):
  #   * affine rows (uniform marginal)   -> closed form, zero gathers
  #   * all rows identical (separable)   -> no row-index conditioning
  #   * (v[j], v[j+1]) pair rows         -> one 2-wide gather, not two
  q = np.linspace(0., 1., quantileRes)
  npDtype = np.dtype(dtype.dtype if hasattr(dtype, 'dtype') else dtype)
  newTables = []
  for t in tables:
    cdf = np.asarray(t['cdf'], dtype=np.float64)
    values = np.asarray(t['values'], dtype=np.float64)
    inv = np.stack([np.interp(q, row, values) for row in cdf])
    t = dict(t)
    rowsEqual = bool(np.all(np.abs(inv - inv[0:1])
                            <= 1e-7 * max(np.ptp(values), 1e-30)))
    if rowsEqual:
      inv = inv[:1]
    lin = np.linspace(inv[0, 0], inv[0, -1], inv.shape[1])
    affine = rowsEqual and bool(
        np.all(np.abs(inv[0] - lin) <= 1e-6 * max(np.ptp(values), 1e-30)))
    t['invCdf'] = inv.astype(npDtype)
    pairs = np.stack([inv[:, :-1], inv[:, 1:]], axis=-1)  # (M, Q-1, 2)
    t['invCdfPairs'] = pairs.reshape(-1, 2).astype(npDtype)
    t['affine'] = (affine, float(inv[0, 0]), float(inv[0, -1]))
    t['rowsEqual'] = rowsEqual
    if rowsEqual and not affine:
      # small inverse table for the MXU tent-interpolation path: a linear
      # interpolation IS a matmul with a tent-weight matrix, which beats a
      # random gather ~4x on v5e (9 ms -> ~2 ms per 1e6 draws)
      qs = np.linspace(0., 1., _TENT_Q)
      small = np.interp(qs, q, inv[0])
      t['invCdfSmall'] = small.astype(npDtype)
    # single device transfer per array, already in the target dtype
    newTables.append({k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                          else (tuple(jnp.asarray(g) for g in v)
                                if k == 'laterGrids' else v))
                      for k, v in t.items()})
  tables = tuple(newTables)
  names = [str(v) for v in vrv._variables]
  if vrv._variableOrder:
    order = tuple(names.index(v) for v in vrv._variableOrder if v in names)
  else:
    order = tuple(range(len(names)))
  return dict(tables=tables, order=jnp.asarray(order, dtype=jnp.int32),
              names=tuple(names))


def deviceDraw(deviceTables, key, N, stratified=False):
  '''
  Draw N samples on device; returns an array of shape (numVariables, N) with
  rows ordered by the variable order the tables were built with. Jittable
  (N static). `stratified=True` feeds latin-hypercube quantiles through the
  same transforms (the device analog of drawPseudo).
  '''
  tables = deviceTables['tables']
  k = len(tables)
  drawn = [None] * k
  for i in reversed(range(k)):
    t = tables[i]
    key, kU, kPerm, kD = jax.random.split(key, 4)
    if stratified:
      u = (jnp.arange(N, dtype=t['values'].dtype)
           + jax.random.uniform(kU, (N,), dtype=t['values'].dtype)) / N
      u = jax.random.permutation(kPerm, u)
    else:
      u = jax.random.uniform(kU, (N,), dtype=t['values'].dtype)

    laterGrids = t['laterGrids']
    invCdf = t['invCdf']
    Q = invCdf.shape[1]
    pos = u * (Q - 1)
    j = jnp.clip(pos.astype(jnp.int32), 0, Q - 2)
    frac = pos - j
    affine, aLo, aHi = t.get('affine', (False, 0., 1.))
    rowsEqual = t.get('rowsEqual', False)
    if affine:
      # uniform marginal: closed form, no gathers at all
      out = aLo + u * (aHi - aLo)
    elif 'invCdfSmall' in t:
      out = tentInterp(t['invCdfSmall'], u)
    else:
      if laterGrids and not rowsEqual:
        rows = jnp.zeros((N,), dtype=jnp.int32)
        meta = t.get('laterGridMeta', ((False,) * 4,) * len(laterGrids))
        for g, m, vals in zip(laterGrids, meta,
                              [drawn[j2] for j2 in range(i + 1, k)]):
          uniform, lo, step, L = m
          if uniform:
            near = jnp.clip(jnp.round((vals - lo) / step).astype(jnp.int32),
                            0, L - 1)
          else:
            near = nearestIndex(g, vals).astype(jnp.int32)
          rows = rows * g.shape[0] + near
        base = rows * (Q - 1) + j
      else:
        base = j
      pair = t['invCdfPairs'][base]        # one 2-wide gather
      v0, v1 = pair[:, 0], pair[:, 1]
      out = v0 + frac * (v1 - v0)

    if t['discreteVals'].shape[0]:
      u2 = jax.random.uniform(kD, (N,), dtype=t['values'].dtype)
      cum = t['discreteCum']
      idx = jnp.clip(jnp.searchsorted(cum, u2, side='left'),
                     0, cum.shape[0] - 1)
      out = jnp.where(u2 <= cum[-1], t['discreteVals'][idx], out)
    drawn[i] = out

  result = jnp.stack(drawn)
  return result[deviceTables['order']]


def fitPiecewisePoly(inv, maxSegments=12, deg=9, relTol=5e-3):
  '''Fit the tabulated inverse CDF `inv` (uniform quantile grid) as a few
  Horner polynomials in per-segment scaled coordinates, for the in-kernel
  Pallas sampler (ops/pallas_trace._marginal 'pwpoly'). Inverse CDFs of
  truncated smooth densities have boundary layers at u=0 (sqrt from the
  area Jacobian) and u=1 (thin tail), so fitting starts from the segment
  split [0, .03, .97, 1] and refines the worst segment until the max error
  is below relTol * range. Returns ('pwpoly', segments, lo, hi) or None
  if the tolerance is unmet at maxSegments.'''
  q = np.linspace(0., 1., inv.shape[0])
  qd = np.linspace(0., 1., 40001)
  ref = np.interp(qd, q, inv)
  rng = max(np.ptp(inv), 1e-30)
  splits = [0., .03, .97, 1.]

  def fit(splits):
    segs, errs = [], []
    for a, b in zip(splits[:-1], splits[1:]):
      m = (qd >= a) & (qd <= b)
      mid, half = (a + b) / 2., max((b - a) / 2., 1e-9)
      s = (qd[m] - mid) / half
      d = min(deg, max(1, m.sum() - 1))
      c = np.polyfit(s, ref[m], d)[::-1]          # ascending coeffs
      est = np.polyval(c[::-1], s)
      segs.append((a, b, mid, half, tuple(float(x) for x in c)))
      errs.append(float(np.abs(est - ref[m]).max()))
    return segs, errs

  while True:
    segs, errs = fit(splits)
    worst = int(np.argmax(errs))
    if errs[worst] <= relTol * rng:
      return ('pwpoly', tuple(segs), float(inv.min()), float(inv.max()))
    if len(splits) - 1 >= maxSegments:
      return None
    a, b = splits[worst], splits[worst + 1]
    splits = sorted(set(splits) | {(a + b) / 2.})
