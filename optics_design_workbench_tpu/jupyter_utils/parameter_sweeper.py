'''
Parameter sweeps and geometry optimization (reference:
jupyter_utils/parameter_sweeper.py):

  * `ParameterSweeper(getParametersFunc)` mapping names to parameter nodes,
    `set()` with bounds clamping and read-back verification (:382-452),
    `MetaParameter` derived-parameter families (:170-226),
  * `optimize(minimizeFunc, parameters, ...)`: normalize bounded parameters
    to [0,1], run scipy minimize / dual_annealing / differential_evolution,
    exceptions become penalty 1e99 so the minimizer routes around failures,
    history ring buffer + periodic dumps, best parameters restored at exit
    (:757-918),
  * `optimizeStrategyStep([...])`: several optimize configs with arg-dict
    inheritance and global best tracking (:454-746). The reference runs them
    as OS processes each owning a FreeCAD instance; here the TPU is a single
    shared resource, so strategies run sequentially against the in-process
    scene (documented deviation),
  * TPU-native addition `evaluateBatched`: an extra leading scene-parameter
    axis — N geometry variants compiled into stacked device tables and
    traced in ONE vmapped fused call (the examples/3 lens-radius sweep runs
    all candidates in parallel on one chip).
'''

import math
import os
import pickle
import time

import numpy as np

from .. import simulation
from ..utils import io
from .document import RawFolder, saveScene
from .retries import retryOnError

PENALTY = 1e99


class Parameter:
  '''A settable scene parameter: either (obj, attributeName) or explicit
  getter/setter callables. Optional bounds clamp set().'''

  def __init__(self, obj=None, attr=None, getter=None, setter=None,
               bounds=None):
    if obj is not None and attr is not None:
      self._get = lambda: getattr(obj, attr)
      self._set = lambda v: setattr(obj, attr, v)
    elif getter is not None and setter is not None:
      self._get, self._set = getter, setter
    else:
      raise ValueError('pass (obj, attr) or (getter, setter)')
    self.bounds = bounds

  def get(self):
    return self._get()

  def set(self, value):
    if self.bounds is not None:
      lo, hi = self.bounds
      value = min(max(value, lo), hi)
    self._set(value)
    return value


class MetaParameter:
  '''A family of derived parameters applied only once ALL siblings have
  been assigned (reference: parameter_sweeper.py:170-226). `apply` receives
  the dict of sibling values.'''

  def __init__(self, names, apply):
    self.names = list(names)
    self.apply = apply
    self._pending = {}

  def set(self, name, value):
    self._pending[name] = value
    if set(self._pending) >= set(self.names):
      self.apply(dict(self._pending))
      self._pending = {}
      return True
    return False


def _asParameter(node):
  if isinstance(node, Parameter):
    return node
  if isinstance(node, tuple) and len(node) == 2 and callable(node[0]):
    return Parameter(getter=node[0], setter=node[1])
  if isinstance(node, tuple) and len(node) == 2:
    return Parameter(obj=node[0], attr=node[1])
  raise TypeError(f'cannot interpret parameter node {node!r}')


class ParameterSweeper:

  def __init__(self, getParametersFunc=None, doc=None, scene=None):
    self.doc = doc
    self.scene = scene if scene is not None else (doc.scene if doc else None)
    self._getParametersFunc = getParametersFunc
    self._parameters = None
    self._metaParameters = {}
    self.history = []
    self._bestPenalty = math.inf
    self._bestParams = None

  # ------------------------------------------------------------- parameters

  def parameters(self):
    if self._parameters is None:
      if self._getParametersFunc is None:
        raise ValueError('no getParametersFunc given')
      raw = self._getParametersFunc(self.doc if self.doc is not None
                                    else self.scene)
      self._parameters = {}
      for name, node in raw.items():
        if isinstance(node, MetaParameter):
          self._metaParameters[name] = node
        else:
          self._parameters[name] = _asParameter(node)
    return self._parameters

  def parameterNames(self):
    return list(self.parameters().keys()) + list(self._metaParameters)

  def get(self, name):
    return self.parameters()[name].get()

  def set(self, _verify=True, **kwargs):
    '''Set parameters with bounds clamping and read-back verification
    (reference: parameter_sweeper.py:382-432).'''
    params = self.parameters()
    applied = {}
    for name, value in kwargs.items():
      if name in self._metaParameters:
        self._metaParameters[name].set(name, value)
        applied[name] = value
        continue
      p = params[name]
      clamped = p.set(value)
      if _verify:
        back = p.get()
        try:
          if not np.isclose(float(back), float(clamped), rtol=1e-9,
                            atol=1e-12):
            io.warn(f'read-back of parameter {name} gives {back}, expected '
                    f'{clamped}')
        except (TypeError, ValueError):
          pass
      applied[name] = clamped
    return applied

  def setBounds(self, **kwargs):
    params = self.parameters()
    for name, bounds in kwargs.items():
      params[name].bounds = tuple(bounds)

  def bounds(self, name=None):
    params = self.parameters()
    if name is not None:
      return params[name].bounds
    return {n: p.bounds for n, p in params.items()}

  # --------------------------------------------------------------- sweeping

  def sweep(self, parameterValues, minimizeFunc, simulationMode='true',
            seed=None, prepareSimulation=None, **runKwargs):
    '''Grid sweep: set each parameter combination, simulate, evaluate.
    `parameterValues` is {name: listOfValues}; all lists must have equal
    length (zipped, not cartesian). Returns list of (paramsDict, penalty,
    runPath).'''
    names = list(parameterValues)
    lists = [list(parameterValues[n]) for n in names]
    if len({len(l) for l in lists}) != 1:
      raise ValueError('all parameter value lists must have equal length')
    results = []
    for i in range(len(lists[0])):
      params = {n: l[i] for n, l in zip(names, lists)}
      self.set(**params)
      if prepareSimulation is not None:
        prepareSimulation()
      runPath = simulation.runSimulation(self.scene, simulationMode,
                                         seed=seed, **runKwargs)
      penalty = minimizeFunc(RawFolder(runPath))
      results.append((params, penalty, runPath))
      self._recordHistory(params, penalty)
    return results

  # ------------------------------------------------------------ optimization

  def _recordHistory(self, params, penalty):
    self.history.append(dict(params=dict(params), penalty=float(penalty),
                             time=time.time()))
    if penalty < self._bestPenalty:
      self._bestPenalty = penalty
      self._bestParams = dict(params)

  def optimize(self, minimizeFunc, parameters, simulationMode='true',
               method='Nelder-Mead', maxIterations=100, seed=None,
               prepareSimulation=None, retries=2, historyDumpPath=None,
               restoreBestAtExit=True, autosaveBestTo=None, **runKwargs):
    '''Minimize `minimizeFunc(rawFolder)` over the named parameters
    (reference: parameter_sweeper.py:757-918). Bounded parameters are
    normalized to [0, 1] for the optimizer; failures score PENALTY so the
    minimizer routes around crashes; the best parameters are restored (and
    optionally autosaved) at exit.'''
    import scipy.optimize
    params = self.parameters()
    names = list(parameters)
    boundsList = []
    for n in names:
      b = params[n].bounds
      if b is None:
        raise ValueError(f'parameter {n} needs bounds for optimization '
                         f'(call setBounds)')
      boundsList.append(tuple(b))

    def denorm(x):
      return {n: lo + xi * (hi - lo)
              for n, xi, (lo, hi) in zip(names, x, boundsList)}

    @retryOnError(subject='simulate+evaluate', maxRetries=retries)
    def _simulateAndEvaluate(paramDict):
      if prepareSimulation is not None:
        prepareSimulation()
      self.set(**paramDict)
      runPath = simulation.runSimulation(self.scene, simulationMode,
                                         seed=seed, **runKwargs)
      return float(minimizeFunc(RawFolder(runPath)))

    def objective(x):
      paramDict = denorm(np.clip(np.asarray(x, float), 0, 1))
      try:
        penalty = _simulateAndEvaluate(paramDict)
      except Exception as e:
        io.warn(f'optimization step failed, assigning penalty {PENALTY:g}: '
                f'{e}')
        penalty = PENALTY
      self._recordHistory(paramDict, penalty)
      if historyDumpPath:
        try:
          io.atomicWrite(historyDumpPath, pickle.dumps(self.history))
        except Exception:
          pass
      return penalty

    x0 = []
    for n, (lo, hi) in zip(names, boundsList):
      cur = float(self.get(n)) if not isinstance(self.get(n), str) \
          else float(eval(str(self.get(n))))
      x0.append(np.clip((cur - lo) / (hi - lo) if hi > lo else 0.5, 0, 1))

    try:
      if method == 'dual_annealing':
        result = scipy.optimize.dual_annealing(
            objective, bounds=[(0, 1)] * len(names),
            maxiter=int(maxIterations), x0=np.asarray(x0))
      elif method == 'differential_evolution':
        result = scipy.optimize.differential_evolution(
            objective, bounds=[(0, 1)] * len(names),
            maxiter=int(maxIterations))
      else:
        result = scipy.optimize.minimize(
            objective, np.asarray(x0), method=method,
            bounds=[(0, 1)] * len(names),
            options=dict(maxiter=int(maxIterations)))
    finally:
      if restoreBestAtExit and self._bestParams is not None:
        self.set(**self._bestParams)
        if autosaveBestTo:
          saveScene(self.scene, autosaveBestTo)
    result.bestParams = dict(self._bestParams or {})
    result.bestPenalty = self._bestPenalty
    return result

  def optimizeStrategyStep(self, strategies, **commonKwargs):
    '''Run several optimize() configurations, each inheriting unset keys
    from the first (reference: parameter_sweeper.py:454-746). The reference
    parallelizes across OS processes each owning a FreeCAD; on TPU the chip
    is one shared resource, so strategies run sequentially and the global
    best survives into each next strategy.'''
    if not strategies:
      return []
    base = dict(strategies[0])
    results = []
    for i, strat in enumerate(strategies):
      cfg = {**commonKwargs, **base, **strat}
      io.info(f'optimize strategy {i + 1}/{len(strategies)}: '
              f'{cfg.get("method", "Nelder-Mead")}')
      try:
        results.append(self.optimize(**cfg))
      except Exception as e:
        io.warn(f'strategy {i + 1} failed: {e}')
        results.append(None)
    if self._bestParams is not None:
      self.set(**self._bestParams)
    return results

  # ------------------------------------------------------- batched evaluation

  def evaluateBatched(self, parameterSets, metric, sceneFactory=None,
                      raysPerScene=100_000, maxIntersections=8, bins=(64, 64),
                      histBounds=(-50., 50., -50., 50.), seed=0):
    '''
    TPU-native sweep: evaluate MANY geometry variants in one vmapped trace.
    `parameterSets` is a list of parameter dicts; each is applied (via
    set()) before compiling one scene variant; all variants must share the
    same structure (same surfaces/elements). `metric(histPower, histCounts)`
    maps each variant's detector histogram to a scalar. Returns an (N,)
    numpy array of metric values.
    '''
    import jax
    import jax.numpy as jnp
    from ..tracing import fused

    devices, infos, gens = [], [], []
    for ps in parameterSets:
      self.set(**ps)
      scene = sceneFactory() if sceneFactory is not None else self.scene
      device, info = scene.compile()
      device['powerTol'] = 1e-6
      devices.append(device)
      infos.append(info)
      gens.append(scene.lightSources()[0].deviceGenerator())

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *devices)
    histSpec = fused.makeHistogramSpec(devices[0], infos[0],
                                       bounds=histBounds, bins=bins)
    hist0 = fused.initHistograms(histSpec)
    settings = self.scene.activeSimulationSettings()
    gen0 = gens[0]

    def one(sceneDev, key):
      batch = gen0(key, raysPerScene)
      hist, counters = fused.traceHistogram(
          sceneDev, histSpec, hist0, batch['origins'], batch['directions'],
          batch['powers'], batch['wavelengths'],
          maxIntersections=maxIntersections,
          maxRayLength=settings.maxRayLength(),
          distTol=max(settings.distanceTolerance(), 1e-4),
          earlyExit=False)
      return hist

    keys = jax.random.split(jax.random.PRNGKey(seed), len(parameterSets))
    try:
      hists = jax.jit(jax.vmap(one))(stacked, keys)
      power = np.asarray(hists['power'])
      counts = np.asarray(hists['counts'])
    except Exception as e:
      # some TPU compiler versions SIGILL on the vmapped fused
      # histogram loop; fall back to the plain record-producing tracer
      # (one compilation, reused across variants) + host histogramming
      io.warn(f'vmapped batched sweep failed ({str(e)[:120]}); '
              f'falling back to per-variant tracing')
      from ..tracing import trace as rawTrace
      H, W = bins
      D = int(np.asarray(histSpec['bounds']).shape[0])
      elemToDet = np.asarray(histSpec['elemToDet'])
      boundsArr = np.asarray(histSpec['bounds'])
      power = np.zeros((len(parameterSets), D, H, W))
      counts = np.zeros((len(parameterSets), D, H, W))
      for vi, (dev, k) in enumerate(zip(devices, keys)):
        batch = gen0(k, raysPerScene)
        _, rec = rawTrace(dev, batch['origins'], batch['directions'],
                          batch['powers'], batch['wavelengths'],
                          maxIntersections=maxIntersections,
                          maxRayLength=settings.maxRayLength(),
                          distTol=max(settings.distanceTolerance(), 1e-4),
                          recordSegments=False)
        hitElem = np.asarray(rec['hitElem'])
        mask = np.asarray(rec['recordHit']) & (hitElem >= 0)
        if not mask.any():
          continue
        det = elemToDet[np.maximum(hitElem, 0)]
        mask &= det >= 0
        pts = np.asarray(rec['point'])[mask]
        pw = np.asarray(rec['power'])[mask]
        dd = det[mask]
        # world->local of the hit surfaces
        sIdx = np.asarray(rec['hitSurface'])[mask]
        rot = np.asarray(dev['surfaces']['w2lRot'])[sIdx]
        off = np.asarray(dev['surfaces']['w2lOff'])[sIdx]
        local = np.einsum('nij,nj->ni', rot, pts) + off
        b = boundsArr[dd]
        fx = (local[:, 0] - b[:, 0]) / (b[:, 1] - b[:, 0])
        fy = (local[:, 1] - b[:, 2]) / (b[:, 3] - b[:, 2])
        ok = (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1)
        ix = np.clip((fx[ok] * W).astype(int), 0, W - 1)
        iy = np.clip((fy[ok] * H).astype(int), 0, H - 1)
        np.add.at(power[vi], (dd[ok], iy, ix), pw[ok])
        np.add.at(counts[vi], (dd[ok], iy, ix), 1.)
    return np.array([metric(power[i], counts[i])
                     for i in range(len(parameterSets))])
