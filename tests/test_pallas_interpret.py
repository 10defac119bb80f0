'''Pallas kernel logic tests in Mosaic INTERPRET mode — run on the default
CPU CI mesh every time, so a kernel-logic regression fails `pytest tests/`
instead of surfacing only as a silent bench-number change on hardware
(the hardware equivalence suite is tests/test_pallas_tpu.py).

The interpreter stubs the on-core PRNG to zeros, so the stochastic paths
(in-kernel sampler, scatter) are exercised through the kernel's
deterministic-uniform seam (`uniformProvider='input'`): the step feeds
jax.random uniforms as VMEM inputs, and the tests recompute the identical
uniforms to drive an independent reference implementation.
'''

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                OpticalGroup)
from optics_design_workbench_tpu.geometry import surfaces as S
from optics_design_workbench_tpu.geometry import transforms as T
from optics_design_workbench_tpu.ops import pallas_trace
from optics_design_workbench_tpu.tracing import fused

N = 1 << 11
TILE = 1 << 10


def _runPair(scene, bounds, bins=(32, 128), maxIntersections=6, n=N,
             seed=11, **pallasKw):
  '''(pallasCounts, xlaCounts, pallasCounters, xlaCounters) for the same
  key on the interpret-mode kernel and the XLA fused step.'''
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  assert pallas_trace.pallasEligible(device)
  src = scene.lightSources()[0]
  histSpec = fused.makeHistogramSpec(device, info, bounds=bounds, bins=bins)
  kw = dict(raysPerStep=n, maxIntersections=maxIntersections,
            maxRayLength=1e6, distTol=1e-4)
  key = jax.random.PRNGKey(seed)
  stepP = pallas_trace.makePallasTraceStep(
      device, histSpec, src.deviceColumnsGenerator(), interpret=True,
      tile=TILE, **kw, **pallasKw)
  hP, cP = stepP(key, fused.initHistograms(histSpec))
  stepX = fused.makeFusedStep(device, src.deviceGenerator(), histSpec, **kw)
  hX, cX = stepX(key, fused.initHistograms(histSpec))
  return (np.asarray(hP['counts']), np.asarray(hX['counts']), cP, cX)


def _nearlyEqualCounts(hP, hX, budget=2):
  '''Bin-for-bin equality up to `budget` rays migrating across a bin edge
  (interpret-mode float op order differs from the XLA fusion order by an
  ulp, which can flip floor() exactly at a bin boundary).'''
  return np.abs(hP - hX).sum() <= 2 * budget


def test_grating_matches_xla_tracer_interpret():
  '''In-kernel Ludwig-1970 grating vs the XLA batch tracer (the
  interpret-mode twin of test_pallas_tpu.test_grating_matches_xla_tracer).'''
  scene = Scene(label='gratinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Grating', Label='Grat', GratingType='Reflection',
      GratingLinesPerMillimeter=600., GratingDiffractionOrder=1,
      GratingLinesOrientation=(1., 0., 0.),
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(30., 30.))],
      placements=[T.compose(T.translation(0, 0, 100),
                            T.rotation((1, 0, 0), 20))]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.sphere(T.translation(0, 0, 100), elem=0, radius=300.,
                         orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.005)',
      ThetaDomain='0, 0.2', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            maxIntersections=3)
  assert int(cX['hits']) > 0
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_quadric_lens_matches_xla_interpret():
  '''QUADRIC surfaces (ellipsoid dome + elliptic-cylinder rim, the closed
  forms geometry/brep.py refits from scaled-NURBS faces) through the
  kernel vs the XLA fused step: refraction at a non-axisymmetric surface
  exercises the quadric gradient normal.'''
  scene = Scene(label='quadinterp')
  # plano-convex lens with an ellipsoid front face: ellipsoid semi-axes
  # (20, 30, 15) centered at z=40, dome cap z in [50, 55] (local z band
  # [10, 15]); flat back at z=50
  ell = np.array([1. / 400., 1. / 900., 1. / 225., 0., -1.])
  ell = ell / ell[:3].max()
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Lens', Label='Lens', RefractiveIndex=1.6,
      surfaces=[
          S.quadric(T.translation(0, 0, 40), elem=0, coeffs=tuple(ell),
                    zRange=(10., 15.)),
          S.plane(np.eye(4), elem=0, radius=16., orient=-1),
      ],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(100., 100.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.05)',
      ThetaDomain='0, 0.35', Wavelength=532.,
      ThetaResolutionNumericMode='1e4',
      placement=T.compose(T.translation(0, 0, 120),
                          T.rotation((1, 0, 0), 180))))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=6)
  hP, hX, cP, cX = _runPair(scene, bounds=(-100., 100., -100., 100.))
  assert int(cX['hits']) > N // 4          # the lens actually refracts rays
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def _stackedDetectorScene():
  scene = Scene(label='stackinterp')
  for i, z in enumerate((40., 60.)):
    scene.addOpticalGroup(OpticalGroup(
        OpticalType='Vacuum', Label=f'Det{i}', RecordHits=True,
        surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(50., 50.))],
        placements=[T.translation(0, 0, z)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Back',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(50., 50.))],
      placements=[T.translation(0, 0, 90.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.02)',
      ThetaDomain='0, 0.3', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=8)
  return scene


def test_multi_detector_hit_ring_interpret():
  '''Stacked pass-through detectors + a mirror: the hit-slot ring must keep
  EVERY pass (reference: ray.py:276-277) with the topology-derived auto
  slot count.'''
  hP, hX, cP, cX = _runPair(_stackedDetectorScene(),
                            bounds=(-50., 50., -50., 50.),
                            maxIntersections=8)
  assert int(cX['hits']) > 3.5 * N     # ~4 recorded passes per ray
  assert int(cP['hitOverflow']) == 0   # auto slots must cover all passes
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_hit_slot_overflow_counter_interpret():
  '''With hitSlots forced to 1, overflowing passes must be COUNTED:
  kernel hits + hitOverflow == XLA hits (under-recording is detectable,
  never silent).'''
  hP, hX, cP, cX = _runPair(_stackedDetectorScene(),
                            bounds=(-50., 50., -50., 50.),
                            maxIntersections=8, hitSlots=1)
  assert int(cP['hitOverflow']) > 0
  assert abs(int(cP['hits']) + int(cP['hitOverflow'])
             - int(cX['hits'])) <= 2


def test_sequential_with_lens_matches_xla_interpret():
  '''Sequential mode with a LENS in the stage list: the sequence index is
  per-ray and does NOT advance on lens entry (batch_tracer seqInc), so the
  kernel must track it per ray — a bounce-counted mask desyncs (the lens
  exit surface would be masked off at its bounce and rays would die inside
  the glass).'''
  scene = Scene(label='seqlensinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Lens', Label='Ball', RefractiveIndex=1.5,
      surfaces=[S.sphere(np.eye(4), elem=0, radius=10.)],
      placements=[T.translation(0, 0, 30.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.translation(0, 0, 80.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.02)',
      ThetaDomain='0, 0.25', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(
      RaysPerIteration=1e4, MaxIntersections=5, SequentialMode=True,
      SequentialModeElements=[['Ball'], ['Det']])
  hP, hX, cP, cX = _runPair(scene, bounds=(-80., 80., -80., 80.),
                            maxIntersections=5)
  device, _ = scene.compile()
  assert 'seqMask' in device
  # the ball lens covers only part of the theta cone; most rays still
  # reach the detector (and MUST: the lens-exit bounce may not be masked)
  assert int(cX['hits']) > 0.9 * N
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_in_kernel_scatter_uniform_seam_interpret():
  '''In-kernel stochastic scatter via the deterministic-uniform seam: with
  the SAME uniforms, the kernel's lobe draw + Rodrigues rotations must
  reproduce an independent numpy reference (marginal eval through
  batch_tracer._evalPwpoly + closed-form rotation algebra) bin for bin.'''
  from optics_design_workbench_tpu.tracing.batch_tracer import (
      scatterConstants, _evalPwpoly)

  scene = Scene(label='scatinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Diffuser', Reflectivity=1.0,
      ReflectedProbabilityDensity='exp(-theta^2/0.02)',
      PowerThetaDomain='0, pi/3',
      surfaces=[S.plane(np.eye(4), elem=0, radius=50., orient=-1)],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(500., 500.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(Label='Src', PowerDensity='1',
                              ThetaDomain='0, 0.01',
                              ThetaResolutionNumericMode='1e3',
                              placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  consts = scatterConstants(device)
  assert consts is not None and len(consts) == 1
  _e, kind, phiSpec, thetaSpec, _pD, _tD = consts[0]
  assert kind == 0    # REFLECT lobe on the mirror

  H, W = 64, 128
  bounds = (-100., 100., -100., 100.)
  histSpec = fused.makeHistogramSpec(device, info, bounds=bounds,
                                     bins=(H, W))

  # straight-up rays from (0, 0, 1e-3): every ray hits the diffuser center
  def columnsGen(key, n, stratified=False):
    z = jnp.zeros((n,), jnp.float32)
    return dict(ox=z, oy=z, oz=z + 1e-3, dx=z, dy=z, dz=z + 1.,
                pw=z + 1., wl=z + 532.)

  key = jax.random.PRNGKey(5)
  step = pallas_trace.makePallasTraceStep(
      device, histSpec, columnsGen, raysPerStep=N, maxIntersections=4,
      maxRayLength=1e6, distTol=1e-4, interpret=True, tile=TILE,
      uniformProvider='input')
  h, c = step(key, fused.initHistograms(histSpec))
  hK = np.asarray(h['counts'])[0]

  # identical uniforms (the step derives them from fold_in(key, 0x0177));
  # the kernel draws 2 lobe uniforms (u1=phi, u2=theta) PER BOUNCE; the
  # mirror hit is bounce 0, so its draws are us[0], us[1]
  us = np.asarray(jax.random.uniform(jax.random.fold_in(key, 0x0177),
                                     (2 * 4, N // 128, 128)))
  u1, u2 = us[0].reshape(-1), us[1].reshape(-1)
  theta = np.asarray(_evalPwpoly(thetaSpec, jnp.asarray(u2)))
  phi = np.asarray(_evalPwpoly(phiSpec, jnp.asarray(u1)))
  # geometry reference: mirror at z=50, outward normal -z; lobe axis is the
  # incidence-side normal (0,0,-1); scattered direction
  # Rot(n, phi) Rot(n x dIn -> degenerate alt axis (0,-1,0), theta) n
  # = (sin t cos p, -sin t sin p, -cos t); landing on the floor at
  # (50 tan t cos p, -50 tan t sin p)
  x = 50. * np.tan(theta) * np.cos(phi)
  y = -50. * np.tan(theta) * np.sin(phi)
  x0, x1, y0, y1 = bounds
  fx, fy = (x - x0) / (x1 - x0), (y - y0) / (y1 - y0)
  inside = (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1)
  ref = np.zeros((H, W))
  np.add.at(ref, (np.floor(fy[inside] * H).astype(int),
                  np.floor(fx[inside] * W).astype(int)), 1.)
  assert int(c['hits']) == int(inside.sum())
  assert np.abs(hK - ref).sum() <= 4     # bin-edge ulp wobble only


def test_in_kernel_conditioned_dirac_scatter_interpret():
  '''theta_in-CONDITIONED lobe + DiracDelta ideal-specular event inside the
  kernel, via the deterministic-uniform seam: rays arrive at VARYING
  incidence angles, so the kernel must evaluate the bivariate pwpoly2d fit
  and the poly1d event constants at the per-ray arccosApprox(d.n) — the
  reference recomputes the identical draws through the SAME shared
  device_sampler eval functions and closed-form geometry.'''
  from optics_design_workbench_tpu.tracing.batch_tracer import (
      scatterConstants)
  from optics_design_workbench_tpu.distributions.device_sampler import (
      evalPwpoly, evalPwpoly2d, evalDiscreteEvents, arccosApprox)

  scene = Scene(label='condscatinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Diffuser', Reflectivity=1.0,
      ReflectedProbabilityDensity='DiracDelta(theta-theta_refl)'
                                  ' + 5*exp(-(theta-theta_in)**2/0.02)',
      PowerThetaDomain='0, pi/2', PowerPhiDomain='0, 2*pi',
      surfaces=[S.plane(np.eye(4), elem=0, radius=50., orient=-1)],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(500., 500.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(Label='Src', PowerDensity='1',
                              ThetaDomain='0, 0.01',
                              ThetaResolutionNumericMode='1e3',
                              placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  consts = scatterConstants(device)
  assert consts is not None and len(consts) == 1
  _e, kind, phiSpec, thetaSpec, phiDisc, thetaDisc = consts[0]
  assert kind == 0 and thetaSpec[0] == 'pwpoly2d'
  assert phiDisc == () and len(thetaDisc) == 1

  H, W = 64, 128
  bounds = (-100., 100., -100., 100.)
  histSpec = fused.makeHistogramSpec(device, info, bounds=bounds,
                                     bins=(H, W))

  # rays from (0, 0, 1e-3) fanned in the x-z plane: incidence angle on the
  # flat mirror = the launch angle, varying 0..0.4 across the batch
  thetaR = jnp.linspace(0., 0.4, N, dtype=jnp.float32)
  sR, cR = jnp.sin(thetaR), jnp.cos(thetaR)

  def columnsGen(key, n, stratified=False):
    z = jnp.zeros((n,), jnp.float32)
    return dict(ox=z, oy=z, oz=z + 1e-3, dx=sR, dy=z, dz=cR,
                pw=z + 1., wl=z + 532.)

  key = jax.random.PRNGKey(7)
  step = pallas_trace.makePallasTraceStep(
      device, histSpec, columnsGen, raysPerStep=N, maxIntersections=4,
      maxRayLength=1e6, distTol=1e-4, interpret=True, tile=TILE,
      uniformProvider='input')
  h, c = step(key, fused.initHistograms(histSpec))
  hK = np.asarray(h['counts'])[0]

  # identical uniforms: with Dirac events the kernel draws FOUR lobe
  # uniforms per bounce (u1=phi, u2=theta, u3=phi events, u4=theta
  # events); the mirror hit is bounce 0 -> us[0..3]
  us = jax.random.uniform(jax.random.fold_in(key, 0x0177),
                          (4 * 4, N // 128, 128))
  u1, u2 = us[0].reshape(-1), us[1].reshape(-1)
  u4 = us[3].reshape(-1)
  thetaC = arccosApprox(cR)                # = thetaR through the kernel's
  th = evalPwpoly2d(thetaSpec, u2, thetaC)    # own acos polynomial
  th = evalDiscreteEvents(thetaDisc, thetaC, u4, th)
  phi = evalPwpoly(phiSpec, u1)
  t = np.asarray(th, dtype=np.float64)
  p = np.asarray(phi, dtype=np.float64)
  # geometry: hit the mirror at ((50 - 1e-3) tan thetaR, 0, 50); the lobe
  # axis is the incidence-side normal (0,0,-1) and the rotation axis
  # b x dIn = (0,-1,0) for every ray in the x-z fan (also the degenerate
  # alt axis), so the scattered direction is
  # (sin t cos p, -sin t sin p, -cos t) -> lands on the floor at
  # x = xHit + 50 tan t cos p, y = -50 tan t sin p
  xHit = (50. - 1e-3) * np.tan(np.asarray(thetaR, dtype=np.float64))
  x = xHit + 50. * np.tan(t) * np.cos(p)
  y = -50. * np.tan(t) * np.sin(p)
  x0, x1, y0, y1 = bounds
  fx, fy = (x - x0) / (x1 - x0), (y - y0) / (y1 - y0)
  inside = (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1)
  ref = np.zeros((H, W))
  np.add.at(ref, (np.floor(fy[inside] * H).astype(int),
                  np.floor(fx[inside] * W).astype(int)), 1.)
  assert abs(int(c['hits']) - int(inside.sum())) <= 2
  assert np.abs(hK - ref).sum() <= 8     # bin-edge ulp wobble only
  # the Dirac event must actually fire: specular rays land in a tight
  # diagonal band y ~ 0 (phi rotation around the specular direction keeps
  # them near the x axis only when t == thetaR exactly) — cheap proxy:
  # a substantial fraction of reference draws equals the event value
  frac = np.mean(np.abs(t - np.asarray(thetaC, np.float64)) < 1e-4)
  assert 0.25 < frac < 0.75


def test_in_kernel_sampler_uniform_seam_interpret():
  '''The in-kernel inverse-CDF sampler via the uniform seam: the sampler
  kernel must equal the SAME kernel fed ray columns computed from the
  identical uniforms through the pwpoly marginals + the point-source
  placement math.'''
  from optics_design_workbench_tpu.tracing.batch_tracer import _evalPwpoly

  scene = Scene(label='samplerinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.translation(0, 0, 60.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.02)',
      ThetaDomain='0, 0.4', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=2)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  spec = src.pallasSamplerSpec()
  assert spec is not None and spec['finite'] and spec['f'] == 0.
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-80., 80., -80., 80.),
                                     bins=(32, 128))
  key = jax.random.PRNGKey(17)
  kw = dict(raysPerStep=N, maxIntersections=2, maxRayLength=1e6,
            distTol=1e-4, interpret=True, tile=TILE)
  # tileStratified=False: the reference recomputation below feeds the RAW
  # uniforms through the marginals; the (now default-on) per-tile strata
  # would remap them per tile (covered by the distribution-level test)
  stepS = pallas_trace.makePallasTraceStep(
      device, histSpec, src.deviceColumnsGenerator(), sampler=spec,
      uniformProvider='input', tileStratified=False, **kw)
  hS, cS = stepS(key, fused.initHistograms(histSpec))

  us = jax.random.uniform(jax.random.fold_in(key, 0x0177),
                          (2, N // 128, 128))
  t = _evalPwpoly(spec['first'], us[0].reshape(-1)) \
      if spec['first'][0] == 'pwpoly' else \
      spec['first'][1] + us[0].reshape(-1) * (spec['first'][2]
                                              - spec['first'][1])
  pSpec = spec['phi']
  p = pSpec[1] + us[1].reshape(-1) * (pSpec[2] - pSpec[1]) \
      if pSpec[0] == 'affine' else _evalPwpoly(pSpec, us[1].reshape(-1))
  st, ct = jnp.sin(t), jnp.cos(t)
  sp, cp = jnp.sin(p), jnp.cos(p)
  cols = dict(ox=jnp.zeros_like(t), oy=jnp.zeros_like(t),
              oz=jnp.zeros_like(t), dx=st * sp, dy=-st * cp, dz=ct,
              pw=jnp.ones_like(t), wl=jnp.full_like(t, 532.))

  def columnsGen(k, n, stratified=False):
    return cols

  stepC = pallas_trace.makePallasTraceStep(device, histSpec, columnsGen,
                                           **kw)
  hC, cC = stepC(key, fused.initHistograms(histSpec))
  assert int(cS['hits']) == int(cC['hits']) and int(cS['hits']) > 0.9 * N
  assert np.array_equal(np.asarray(hS['counts']), np.asarray(hC['counts']))


def _slotBitmap(R=64, rDisc=20., slotHalf=2., window=25.):
  '''Disc occupancy bitmap with a vertical slot cut (the example-2 slotted
  mirror shape): mask[iv, iu] over a square chart window.'''
  ax = (np.arange(R) + .5) / R * (2 * window) - window
  X, Y = np.meshgrid(ax, ax)                     # row iv -> y, col iu -> x
  mask = ((X ** 2 + Y ** 2 <= rDisc ** 2)
          & (np.abs(X) >= slotHalf)).astype(np.uint8)
  return dict(mask=mask, u0=-window, v0=-window,
              invDu=R / (2 * window), invDv=R / (2 * window))


def test_bitmap_trim_plane_matches_xla_interpret():
  '''UV-bitmap face trims in the kernel (ops/pallas_trace._bitmapOkConst,
  the packed one-hot MXU gather) vs the XLA path's trimMasks lookup: a
  slotted plane mirror (reference example 2's boolean-cut shape,
  ray.py:357-383 trims) — rays through the slot reach the far detector,
  the rest fold back.'''
  scene = Scene(label='bitmapinterp')
  slotted = S.plane(np.eye(4), elem=0, halfExtents=(25., 25.))
  slotted['trimBitmap'] = _slotBitmap()
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Slotted', surfaces=[slotted],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=300., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.1)',
      ThetaDomain='0, 0.45', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            maxIntersections=4)
  assert int(cX['hits']) > 0.9 * N           # everything lands somewhere
  # the slot must actually split the population: both reflected (z < 0
  # hemisphere, low rows) and transmitted rays exist
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_bitmap_trim_azimuth_chart_matches_xla_interpret():
  '''Azimuth-charted bitmap (cylinder kind: u = chartAtan2, v = z) — the
  kernel and the XLA path share the polynomial atan2
  (geometry/surfaces.chartAtan2), so pixel indices agree bit-for-bit.'''
  R = 64
  iu = np.arange(R)
  u = (iu + .5) / R * (2 * np.pi) - np.pi        # azimuth centers
  ax = (np.arange(R) + .5) / R * 40. - 20.       # z centers
  U, Z = np.meshgrid(u, ax)
  mask = ((np.abs(U) <= np.pi / 2) & (np.abs(Z) <= 15.)).astype(np.uint8)
  cylSurf = S.cylinder(np.eye(4), elem=0, radius=30., zRange=(-20., 20.))
  cylSurf['trimBitmap'] = dict(mask=mask, u0=-np.pi, v0=-20.,
                               invDu=R / (2 * np.pi), invDv=R / 40.)
  scene = Scene(label='azbitmapinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='HalfPipe', surfaces=[cylSurf],
      placements=[T.compose(T.translation(0, 0, 60),
                            T.rotation((1, 0, 0), 90))]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=300., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.1)',
      ThetaDomain='0, 0.5', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            maxIntersections=4)
  assert int(cX['hits']) > 0.9 * N
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_trim_prims_matches_xla_interpret():
  '''Hole/add trim primitives in the kernel
  (ops/pallas_trace._applyPrimsConst, compile-time immediates) vs the XLA
  path (geometry/surfaces._applyPrims): a slotted disc mirror (annulus
  base minus a rotated rect strip, example 2's boolean-cut shape) plus a
  half-plane cut — rays through the slot pass, the rest fold back.'''
  scene = Scene(label='priminterp')
  slotted = S.plane(np.eye(4), elem=0, radius=22.)
  slotted['trim'][0] = 3.                      # annulus base + prims
  ang = np.deg2rad(30.)
  slotted['trimPrims'] = dict(holes=[
      (1., 0.5, -0.25, 1e7, 2.2, float(np.cos(ang)), float(np.sin(ang))),
      (3., 14., 14., 1., 1., 0., 0.),          # half-plane corner cut
  ])
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Slotted', surfaces=[slotted],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=300., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.1)',
      ThetaDomain='0, 0.45', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            maxIntersections=4)
  assert int(cX['hits']) > 0.9 * N
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_raw_hit_records_match_xla_interpret():
  '''Raw per-hit rows from the kernel hit ring
  (pallas_trace.makePallasRawStep) vs the XLA records path
  (tracing.trace): identical hit multisets — points, incoming directions,
  powers, isEntering — per element, on the stacked pass-through-detector
  scene (the ring must keep EVERY recording pass; reference
  results_store.py:348-460 per-hit contract).'''
  from optics_design_workbench_tpu.tracing import trace

  scene = _stackedDetectorScene()
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  from optics_design_workbench_tpu.tracing import fused as fusedMod
  histSpec = fusedMod.makeHistogramSpec(device, info,
                                        bounds=(-50., 50., -50., 50.),
                                        bins=(32, 128))
  key = jax.random.PRNGKey(23)
  stepR = pallas_trace.makePallasRawStep(
      device, histSpec, src.deviceColumnsGenerator(), raysPerStep=N,
      maxIntersections=6, maxRayLength=1e6, distTol=1e-4,
      interpret=True, tile=TILE)
  rec, counters = stepR(key)
  assert int(counters['hits']) > 1.5 * N      # two detectors + mirror pass

  gen = src.deviceGenerator()
  batch = gen(key, N)
  _state, recX = trace(device, batch['origins'], batch['directions'],
                       batch['powers'], batch['wavelengths'],
                       maxIntersections=6, maxRayLength=1e6, distTol=1e-4,
                       recordSegments=False)

  def rowset(recordHit, hitElem, point, direction, power, isEntering):
    m = np.asarray(recordHit).reshape(-1)
    cols = np.concatenate([
        np.asarray(hitElem).reshape(-1, 1)[m],
        np.asarray(point).reshape(-1, 3)[m],
        np.asarray(direction).reshape(-1, 3)[m],
        np.asarray(power).reshape(-1, 1)[m],
        np.asarray(isEntering).reshape(-1, 1)[m].astype(float)], axis=1)
    return cols[np.lexsort(cols.T[::-1])]

  rP = rowset(rec['recordHit'], rec['hitElem'], rec['point'],
              rec['direction'], rec['power'], rec['isEntering'])
  rX = rowset(recX['recordHit'], recX['hitElem'], recX['point'],
              recX['direction'], recX['power'], recX['isEntering'])
  assert rP.shape == rX.shape, (rP.shape, rX.shape)
  assert np.allclose(rP, rX, atol=1e-4), \
      np.abs(rP - rX).max(axis=0)


def test_triangle_mesh_matches_xla_interpret():
  '''Small triangle meshes in the kernel (Moeller-Trumbore with edge
  immediates, constant normals): a two-triangle square fold mirror vs the
  XLA batch tracer (reference: arbitrary tessellated OCC faces,
  ray.py:357-383).'''
  import math
  scene = Scene(label='triinterp')
  # square mirror at z=60 tilted 45 deg about x: two world-space triangles
  c, s = math.cos(math.radians(45.)), math.sin(math.radians(45.))

  def pt(x, y):
    return (x, y * c, 60. + y * s)
  tris = [S.triangle(pt(-25, -25), pt(25, -25), pt(25, 25), elem=0),
          S.triangle(pt(-25, -25), pt(25, 25), pt(-25, 25), elem=0)]
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='FoldTri', surfaces=tris,
      placements=[np.eye(4)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=300., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.05)',
      ThetaDomain='0, 0.3', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            maxIntersections=3)
  assert int(cX['hits']) > 0.9 * N
  assert abs(int(cP['hits']) - int(cX['hits'])) <= 2
  assert _nearlyEqualCounts(hP, hX)


def test_early_exit_modes_identical_interpret():
  '''EARLY_EXIT in {'none', 'while', 'cond'} selects the bounce-loop
  build (plain unroll / fori, lax.while_loop early exit, per-bounce
  lax.cond guards) — all three are semantically the identity on dead
  tiles, so the histograms and counters must be bit-identical.'''
  scene = Scene(label='eexitinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Fold', Reflectivity=0.9,
      surfaces=[S.plane(np.eye(4), elem=0, radius=40.)],
      placements=[T.compose(T.translation(0, 0, 60),
                            T.rotation((0, 1, 0), 45))]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.compose(T.translation(-60, 0, 60),
                            T.rotation((0, 1, 0), 90))]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.05)',
      ThetaDomain='0, 0.3', Wavelength=532.,
      ThetaResolutionNumericMode='1e3'))
  # budget 7 >> the scene's 2 real bounces: the while mode must stop early
  # yet produce identical results
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=7)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-80., 80., -80., 80.),
                                     bins=(32, 128))
  key = jax.random.PRNGKey(7)
  results = {}
  saved = pallas_trace.EARLY_EXIT
  try:
    for mode in ('none', 'while', 'cond'):
      pallas_trace.EARLY_EXIT = mode
      step = pallas_trace.makePallasTraceStep(
          device, histSpec, src.deviceColumnsGenerator(), interpret=True,
          tile=TILE, raysPerStep=N, maxIntersections=7, maxRayLength=1e6,
          distTol=1e-4)
      h, c = step(key, fused.initHistograms(histSpec))
      results[mode] = (np.asarray(h['counts']), np.asarray(h['power']),
                       int(c['segments']), int(c['hits']))
  finally:
    pallas_trace.EARLY_EXIT = saved
  cN, pN, sN, hN = results['none']
  assert hN > 0 and sN > 0
  for mode in ('while', 'cond'):
    cM, pM, sM, hM = results[mode]
    assert np.array_equal(cM, cN), mode
    assert np.array_equal(pM, pN), mode
    assert (sM, hM) == (sN, hN), mode


def test_attr_pass_modes_identical_interpret():
  '''ATTR_PASS in {'persurf', 'accum'} selects the winner-attribute pass
  after the argmin sweep (recompute transform+normal per surface and mask,
  vs accumulate the winner's constants as columns and compute once). For
  kinds whose normal math is pure f32 both ways (PLANE/SPHERE/QUADRIC/CONE
  — no host-double constant folding like the asphere polynomial), the two
  builds are the same FMA sequence and must bin bit-identically, including
  through a rotated non-identity placement (the R/T accumulation path).'''
  ell = np.array([1. / 400., 1. / 900., 1. / 225., 0., -1.])
  ell = ell / ell[:3].max()
  scene = Scene(label='attrinterp')
  # ellipsoid-front plano lens (test_quadric_lens_... layout), whole group
  # tilted 6 deg so the winner pass must route through accumulated R/T
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Lens', Label='Lens', RefractiveIndex=1.6,
      surfaces=[
          S.quadric(T.translation(0, 0, 40), elem=0, coeffs=tuple(ell),
                    zRange=(10., 15.)),
          S.plane(np.eye(4), elem=0, radius=16., orient=-1),
      ],
      placements=[T.compose(T.translation(0, 0, 50),
                            T.rotation((0, 1, 0), 6))]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(100., 100.))],
      placements=[T.translation(0, 0, 0)]))
  # enclosing sphere catches every stray ray: SPHERE normals + identity
  # transform take the allIdent=False masked path alongside the lens rows
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Shell', RecordHits=True,
      surfaces=[S.sphere(np.eye(4), elem=0, radius=300., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.05)',
      ThetaDomain='0, 0.35', Wavelength=532.,
      ThetaResolutionNumericMode='1e4',
      placement=T.compose(T.translation(0, 0, 120),
                          T.rotation((1, 0, 0), 180))))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=6)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  assert pallas_trace.pallasEligible(device)
  src = scene.lightSources()[0]
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-120., 120., -120., 120.),
                                     bins=(32, 128))
  key = jax.random.PRNGKey(5)
  results = {}
  saved = pallas_trace.ATTR_PASS
  try:
    for mode in ('persurf', 'accum'):
      pallas_trace.ATTR_PASS = mode
      step = pallas_trace.makePallasTraceStep(
          device, histSpec, src.deviceColumnsGenerator(), interpret=True,
          tile=TILE, raysPerStep=N, maxIntersections=6, maxRayLength=1e6,
          distTol=1e-4)
      h, c = step(key, fused.initHistograms(histSpec))
      results[mode] = (np.asarray(h['counts']), np.asarray(h['power']),
                       int(c['segments']), int(c['hits']))
  finally:
    pallas_trace.ATTR_PASS = saved
  cP, pP, sP, hP = results['persurf']
  assert hP > 0 and sP > N        # rays actually refract/reflect
  cA, pA, sA, hA = results['accum']
  assert np.array_equal(cA, cP)
  assert np.array_equal(pA, pP)
  assert (sA, hA) == (sP, hP)


def test_xform_groups_identical_interpret():
  '''XFORM_GROUPS hoists one ray rotation per signed-permutation transform
  group per bounce; member surfaces derive their local frames with sign/
  axis picks. After geometry/transforms.snapSignedPermGroups snapped the
  table, the grouped arithmetic is the SAME IEEE op sequence as the
  per-surface 9-FMA rotation (sign flips are exact), so histograms and
  counters must be bit-identical with the hoist on and off.'''
  scene = Scene(label='xgrpinterp')
  # an open box of four mirror walls: face frames are axis permutations of
  # the part frame, the whole part tilted 17 deg about an oblique axis so
  # the group rotation is non-trivial and all four faces share it
  part = T.compose(T.translation(0, 0, 60), T.rotation((1, 2, 3), 17))
  walls = [
      S.plane(T.compose(T.translation(20, 0, 0), T.rotation((0, 1, 0), 90)),
              elem=0, halfExtents=(25., 25.)),
      S.plane(T.compose(T.translation(-20, 0, 0),
                        T.rotation((0, 1, 0), -90)),
              elem=0, halfExtents=(25., 25.)),
      S.plane(T.compose(T.translation(0, 20, 0), T.rotation((1, 0, 0), -90)),
              elem=0, halfExtents=(25., 25.)),
      S.plane(T.compose(T.translation(0, -20, 0), T.rotation((1, 0, 0), 90)),
              elem=0, halfExtents=(25., 25.)),
  ]
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Box', Reflectivity=0.9,
      surfaces=walls, placements=[part]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(120., 120.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Shell', RecordHits=True,
      surfaces=[S.sphere(np.eye(4), elem=0, radius=400., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.3)',
      ThetaDomain='0, 1.2', Wavelength=532.,
      ThetaResolutionNumericMode='1e4',
      placement=T.compose(T.translation(0, 0, 120),
                          T.rotation((1, 0, 0), 180))))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=6)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  assert pallas_trace.pallasEligible(device)
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-150., 150., -150., 150.),
                                     bins=(32, 128))
  # the four wall frames must actually have collapsed to ONE hoisted group
  rows, _e, _m = pallas_trace._sceneRows(device, histSpec)
  hoisted = {r['grp'] for r in rows if r.get('grp', -1) >= 0}
  assert len(hoisted) == 1, [r.get('grp') for r in rows]
  assert sum(1 for r in rows if r.get('grp', -1) >= 0) == 4
  src = scene.lightSources()[0]
  key = jax.random.PRNGKey(3)
  results = {}
  saved = pallas_trace.XFORM_GROUPS
  try:
    for mode in (False, True):
      pallas_trace.XFORM_GROUPS = mode
      step = pallas_trace.makePallasTraceStep(
          device, histSpec, src.deviceColumnsGenerator(), interpret=True,
          tile=TILE, raysPerStep=N, maxIntersections=6, maxRayLength=1e6,
          distTol=1e-4)
      h, c = step(key, fused.initHistograms(histSpec))
      results[mode] = (np.asarray(h['counts']), np.asarray(h['power']),
                       int(c['segments']), int(c['hits']))
  finally:
    pallas_trace.XFORM_GROUPS = saved
  cF, pF, sF, hF = results[False]
  assert hF > 0 and sF > N        # rays actually bounce off the walls
  cT, pT, sT, hT = results[True]
  assert np.array_equal(cT, cF)
  assert np.array_equal(pT, pF)
  assert (sT, hT) == (sF, hF)


def test_many_surface_scene_matches_xla_interpret():
  '''Scenes past the old 64-analytic-surface cap now take the kernel
  (rolled bounce loop; the VMEM-aware auto tile shrinks with the surface
  count — hardware-validated to 256 surfaces). An 80-mirror grid must
  bin identically to the XLA fused step.'''
  import math
  scene = Scene(label='manysurf')
  side, k = 9, 0
  for i in range(side):
    for j in range(side):
      if k >= 80:
        break
      x = (i - side / 2 + .5) * 12.
      y = (j - side / 2 + .5) * 12.
      scene.addOpticalGroup(OpticalGroup(
          OpticalType='Mirror', Label=f'M{k}', Reflectivity=0.95,
          surfaces=[S.plane(np.eye(4), elem=0, radius=6.)],
          placements=[T.compose(T.translation(x, y, 50.),
                                T.rotation((0, 1, 0), 45.))]))
      k += 1
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(500., 500.))],
      placements=[T.compose(T.translation(-200., 0., 50.),
                            T.rotation((0, 1, 0), 90.))]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.5)', ThetaDomain='0, 0.9',
      Wavelength=532., ThetaResolutionNumericMode='1e3'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cX['hits']) > 0
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_smem_triangle_mesh_matches_xla_interpret():
  '''Meshes past the 128-triangle immediates budget ride as a (nTri, 11)
  SMEM table looped in-kernel (scalar-fed Moeller-Trumbore with argmin
  normal/element tracking). A 200-triangle paraboloid-ish dish mirror
  must reproduce the XLA fused step bin-for-bin.'''
  import math
  scene = Scene(label='smemtri')
  tris = []
  nR, nP = 10, 10                       # 10 x 10 quads x 2 = 200 triangles
  R0, z0 = 40., 60.

  def pt(ir, ip):
    r = R0 * ir / nR
    ph = 2 * math.pi * ip / nP
    return (r * math.cos(ph), r * math.sin(ph),
            z0 + 0.004 * r * r)         # shallow dish, focusing down

  for ir in range(nR):
    for ip in range(nP):
      a, b = pt(ir, ip), pt(ir + 1, ip)
      c, d = pt(ir + 1, ip + 1), pt(ir, ip + 1)
      tris.append(S.triangle(a, b, c, elem=0))
      tris.append(S.triangle(a, c, d, elem=0))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Dish', surfaces=tris,
      placements=[np.eye(4)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(200., 200.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.1)', ThetaDomain='0, 0.5',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  assert pallas_trace.pallasEligible(device)
  hP, hX, cP, cX = _runPair(scene, bounds=(-200., 200., -200., 200.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cX['hits']) > 0.2 * N      # the dish reflects back to z=0
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_chunk_triangles_host_invariants():
  '''_chunkTriangles: Morton reorder is a permutation, chunk AABBs cover
  their triangles (incl. the partial last chunk), single-chunk meshes
  skip chunking.'''
  rng = np.random.default_rng(3)
  n = 330                               # 6 chunks, last one partial
  v0 = rng.uniform(-50, 50, (n, 3))
  tab = np.concatenate([v0, rng.uniform(-2, 2, (n, 6)),
                        np.zeros((n, 1)), np.ones((n, 1))],
                       axis=1).astype(np.float32)
  out, chunks = pallas_trace._chunkTriangles(tab.copy())
  C = pallas_trace._TRI_CHUNK
  assert len(out) == n and len(chunks) == -(-n // C)
  # permutation: same multiset of rows
  assert np.allclose(np.sort(out, axis=0), np.sort(tab, axis=0))
  for c in range(len(chunks)):
    rowsC = out[c * C:(c + 1) * C]
    pts = np.concatenate([rowsC[:, 0:3],
                          rowsC[:, 0:3] + rowsC[:, 3:6],
                          rowsC[:, 0:3] + rowsC[:, 6:9]])
    assert (pts >= chunks[c, :3] - 1e-4).all()
    assert (pts <= chunks[c, 3:] + 1e-4).all()
  small, noChunks = pallas_trace._chunkTriangles(tab[:C].copy())
  assert len(noChunks) == 0 and np.allclose(small, tab[:C])


def test_smem_chunked_large_mesh_matches_xla_interpret():
  '''A 648-triangle sphere-ish shell (11 Morton chunks incl. a partial
  last chunk) through the chunk-culled SMEM sweep must reproduce the XLA
  fused step bin-for-bin.'''
  import math
  scene = Scene(label='smemchunk')
  tris = []
  nT, nP, R0 = 18, 18, 50.

  def pt(it, ip):
    th = math.pi * 0.55 * it / nT
    ph = 2 * math.pi * ip / nP
    return (R0 * math.sin(th) * math.cos(ph),
            R0 * math.sin(th) * math.sin(ph),
            60. + R0 * (1. - math.cos(th)))

  for it in range(nT):
    for ip in range(nP):
      a, b = pt(it, ip), pt(it + 1, ip)
      c, d = pt(it + 1, ip + 1), pt(it, ip + 1)
      if it:
        tris.append(S.triangle(a, b, c, elem=0))
      tris.append(S.triangle(a, c, d, elem=0))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Shell', surfaces=tris,
      placements=[np.eye(4)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(300., 300.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.2)', ThetaDomain='0, 0.6',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  assert pallas_trace.pallasEligible(device)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cX['hits']) > 0.2 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_torus_mirror_matches_xla_interpret():
  '''TORUS kind through the kernel: the quartic solver
  (surfaces._quarticSmallestRoot) is shared VERBATIM between the XLA
  sweep and the kernel immediates branch, so a toroidal fold mirror must
  reproduce the XLA fused step bin-for-bin (reference delegates tori to
  OCC line.Curve.intersect, ray.py:357-383).'''
  scene = Scene(label='tork')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Ring',
      surfaces=[S.torus(np.eye(4), elem=0, majorRadius=30.,
                        minorRadius=8.)],
      placements=[T.translation(0, 0, 80.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(200., 200.))],
      placements=[T.translation(0, 0, 0)]))
  # aim at the lower tube of the ring (the source sits on the axis; the
  # tube's nearest band is ~R-r .. R+r off-axis at z=80)
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-(theta-0.38)^2/0.01)',
      ThetaDomain='0.15, 0.55', Wavelength=532.,
      ThetaResolutionNumericMode='1e3'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  assert pallas_trace.pallasEligible(device)
  hP, hX, cP, cX = _runPair(scene, bounds=(-200., 200., -200., 200.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cX['hits']) > 0.1 * N      # the ring reflects a band down
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_torus_vband_trim_matches_xla_interpret():
  '''v-band-trimmed torus (outer half only) through the kernel.'''
  scene = Scene(label='torkband')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='HalfRing',
      surfaces=[S.torus(np.eye(4), elem=0, majorRadius=30., minorRadius=8.,
                        vRange=(-1.5707, 1.5707))],
      placements=[T.translation(0, 0, 80.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(400., 400.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-(theta-0.44)^2/0.02)',
      ThetaDomain='0.2, 0.7', Wavelength=532.,
      ThetaResolutionNumericMode='1e3'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  hP, hX, cP, cX = _runPair(scene, bounds=(-400., 400., -400., 400.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_first_bounce_cull_prunes_and_matches_xla():
  '''Static first-bounce reachability cull: a narrow source aimed at one
  of two mirrors must prune the other from the bounce-0 sweep
  (host-checkable via _firstBounceSurfs) while the kernel stays
  bin-identical to the XLA path (which never culls).'''
  scene = Scene(label='fbcull')
  # target mirror on-axis; decoy mirror far off to the side
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Target',
      surfaces=[S.plane(np.eye(4), elem=0, radius=30., orient=-1)],
      placements=[T.translation(0, 0, 100.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Decoy',
      surfaces=[S.plane(np.eye(4), elem=0, radius=30.)],
      placements=[T.translation(500., 0, 100.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(200., 200.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.01)', ThetaDomain='0, 0.25',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  bound = src.emissionBound()
  assert bound is not None
  hs = fused.makeHistogramSpec(device, info,
                               bounds=(-200., 200., -200., 200.),
                               bins=(32, 128))
  surfRows, _e, _m = pallas_trace._sceneRows(device, hs)
  keep = pallas_trace._firstBounceSurfs(surfRows, bound)
  assert len(keep) < len(surfRows)        # the decoy mirror is culled
  # the culled kernel must still match the (uncalled) XLA path exactly
  hP, hX, cP, cX = _runPair(scene, bounds=(-200., 200., -200., 200.),
                            bins=(32, 128), maxIntersections=3, n=N,
                            emissionBound=bound)
  assert int(cX['hits']) > 0.5 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_first_bounce_cull_surface_source():
  '''SurfaceSource.emissionBound: a flat +z emitter with theta<=pi/2-ish
  domain prunes a decoy mirror BEHIND the emitter from the bounce-0 sweep
  while staying bin-identical to the XLA path. Curved emitters return
  None (no cull).'''
  from optics_design_workbench_tpu.models import SurfaceSource
  scene = Scene(label='sscull')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Emitter',
      surfaces=[S.plane(np.eye(4), elem=0, radius=5.)],
      placements=[T.translation(0, 0, 0.5)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Decoy',
      surfaces=[S.plane(np.eye(4), elem=0, radius=30.)],
      placements=[T.translation(0, 0, -500.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(300., 300.),
                        orient=-1)],
      placements=[T.translation(0, 0, 120.)]))
  src = SurfaceSource(Label='SS', ActiveSurfaces=['Emitter'],
                      PowerDensity='cos(theta)**2', ThetaDomain='0, 1.2',
                      Wavelength=532.)
  scene.addSource(src)
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  bound = src.emissionBound()
  assert bound is not None
  o, axis, cosA, rO = bound
  assert axis[2] > 0.99 and rO >= 5.
  hs = fused.makeHistogramSpec(device, info,
                               bounds=(-300., 300., -300., 300.),
                               bins=(32, 128))
  surfRows, _e, _m = pallas_trace._sceneRows(device, hs)
  keep = pallas_trace._firstBounceSurfs(surfRows, bound)
  assert len(keep) < len(surfRows)       # decoy behind the emitter culled
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            bins=(32, 128), maxIntersections=3, n=N,
                            emissionBound=bound)
  assert int(cX['hits']) > 0.5 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)
  # curved emitter: no bound
  sc2 = Scene(label='sscull2')
  sc2.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Emitter',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=8., zRange=(2., 8.))],
      placements=[T.translation(0, 0, 0)]))
  src2 = SurfaceSource(Label='S2', ActiveSurfaces=['Emitter'],
                       PowerDensity='cos(theta)**2')
  sc2.addSource(src2)
  sc2.addSimulationSettings(RaysPerIteration=1e3)
  sc2.compile()
  assert src2.emissionBound() is None


def test_first_bounce_cull_conservative_cases():
  '''_boundingSphere / _firstBounceSurfs conservatism: unbounded trims and
  boolean-ADD prims are never culled; surfaces inside the origin sphere
  always stay.'''
  rowBase = dict(kind=0, r00=1., r01=0., r02=0., r10=0., r11=1., r12=0.,
                 r20=0., r21=0., r22=1., t0=0., t1=0., t2=-50.,
                 orient=1., elemF=0., p0=0., p1=0., p2=0., p3=0., p4=0.,
                 p5=0., p6=0., p7=0., p8=0., trim0=0., trim1=0.,
                 trim2=10., _rawTrim=(0., 10.), ident=False)
  bound = (np.zeros(3), np.array([0., 0., 1.]), np.cos(0.1), 0.)
  # bounded disc plane at z=+50, on-axis: kept
  assert pallas_trace._firstBounceSurfs([dict(rowBase)], bound) == [0]
  # same plane BEHIND the source: culled
  behind = dict(rowBase, t2=50.)
  assert pallas_trace._firstBounceSurfs([behind], bound) == []
  # unbounded disc: kept regardless
  unb = dict(rowBase, t2=50., _rawTrim=(0., np.inf))
  assert pallas_trace._firstBounceSurfs([unb], bound) == [0]
  # ADD-prim surface: kept regardless
  addp = dict(rowBase, t2=50., holePrims=((11., 0., 0., 1., 1., 1., 0.),))
  assert pallas_trace._firstBounceSurfs([addp], bound) == [0]
  # bitmap-trimmed face: trim[1:5] is a UV chart, not a window — kept
  # regardless (even when the fake window would cull it)
  bmp = dict(rowBase, t2=50., trim0=2.)
  assert pallas_trace._firstBounceSurfs([bmp], bound) == [0]
  # far off-axis sphere: culled; fattened by a big origin radius: kept
  sph = dict(rowBase, kind=1, p0=5., t0=-200., t2=-50.,
             _rawTrim=(-5., 5.))
  assert pallas_trace._firstBounceSurfs([sph], bound) == []
  fat = (np.zeros(3), np.array([0., 0., 1.]), np.cos(0.1), 250.)
  assert pallas_trace._firstBounceSurfs([sph], fat) == [0]


def _marginalsClose(hA, hB, tolL1=0.15, minCount=200):
  '''Statistical comparison of two 2-D count histograms drawn with
  INDEPENDENT entropy: normalized row- and column-marginals must agree
  within an L1 distance budget set by the Monte-Carlo noise floor.'''
  for axis in (0, 1):
    a = hA.sum(axis=axis)
    b = hB.sum(axis=axis)
    if a.sum() < minCount or b.sum() < minCount:
      return False
    d = float(np.abs(a / a.sum() - b / b.sum()).sum())
    if d > tolL1:
      return False
  return True


def test_sampler_distribution_matches_xla_sampler_interpret():
  '''Distribution-level validation of the IN-KERNEL sampler against the
  XLA-side deviceDraw sampler with REAL entropy (round-4 verdict #7: the
  exact-uniform seam pins the transform chain, but only hardware runs
  checked the sampled DISTRIBUTION; this runs in default CPU CI). The two
  paths use independent draws, so the comparison is statistical:
  row/column marginals of the detector histogram within an L1 budget.'''
  scene = Scene(label='samplerdist')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.translation(0, 0, 60.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.03)*(1+sin(phi)/3)',
      ThetaDomain='0, 0.5', PhiDomain='0, 2*pi', Wavelength=532.,
      ThetaResolutionNumericMode='2e3', PhiResolutionNumericMode='5e2'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=2)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  spec = src.pallasSamplerSpec()
  assert spec is not None
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-80., 80., -80., 80.),
                                     bins=(16, 128))
  n = 1 << 13
  kw = dict(raysPerStep=n, maxIntersections=2, maxRayLength=1e6,
            distTol=1e-4)
  stepK = pallas_trace.makePallasTraceStep(
      device, histSpec, src.deviceColumnsGenerator(), sampler=spec,
      uniformProvider='input', interpret=True, tile=TILE, **kw)
  hK, cK = stepK(jax.random.PRNGKey(101), fused.initHistograms(histSpec))
  stepX = fused.makeFusedStep(device, src.deviceGenerator(), histSpec, **kw)
  hX, cX = stepX(jax.random.PRNGKey(707), fused.initHistograms(histSpec))
  assert int(cK['hits']) > 0.9 * n and int(cX['hits']) > 0.9 * n
  assert _marginalsClose(np.asarray(hK['counts'])[0],
                         np.asarray(hX['counts'])[0])


def test_scatter_distribution_matches_xla_tracer_interpret():
  '''Distribution-level validation of the in-kernel scatter chain
  (inverse-CDF lobe draw + Rodrigues rotations) against the XLA tracer's
  gather-based scatter with REAL, independent entropy in default CPU CI
  (round-4 verdict #7).'''
  scene = Scene(label='scatdist')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Diffuser', Reflectivity=1.0,
      ReflectedProbabilityDensity='exp(-theta^2/0.05)',
      PowerThetaDomain='0, pi/3',
      surfaces=[S.plane(np.eye(4), elem=0, radius=50., orient=-1)],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(200., 200.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(Label='Src', PowerDensity='exp(-theta^2/0.01)',
                              ThetaDomain='0, 0.1',
                              ThetaResolutionNumericMode='1e3',
                              placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-150., 150., -150., 150.),
                                     bins=(16, 128))
  src = scene.lightSources()[0]
  n = 1 << 13
  kw = dict(raysPerStep=n, maxIntersections=4, maxRayLength=1e6,
            distTol=1e-4)
  stepK = pallas_trace.makePallasTraceStep(
      device, histSpec, src.deviceColumnsGenerator(),
      uniformProvider='input', interpret=True, tile=TILE, **kw)
  hK, cK = stepK(jax.random.PRNGKey(11), fused.initHistograms(histSpec))
  stepX = fused.makeFusedStep(device, src.deviceGenerator(), histSpec, **kw)
  hX, cX = stepX(jax.random.PRNGKey(77), fused.initHistograms(histSpec))
  assert int(cK['hits']) > 0.8 * n and int(cX['hits']) > 0.8 * n
  assert _marginalsClose(np.asarray(hK['counts'])[0],
                         np.asarray(hX['counts'])[0])


def _shellScene(nT, nP, label):
  import math
  scene = Scene(label=label)
  tris = []
  R0 = 50.

  def pt(it, ip):
    th = math.pi * 0.55 * it / nT
    ph = 2 * math.pi * ip / nP
    return (R0 * math.sin(th) * math.cos(ph),
            R0 * math.sin(th) * math.sin(ph),
            60. + R0 * (1. - math.cos(th)))

  for it in range(nT):
    for ip in range(nP):
      a, b = pt(it, ip), pt(it + 1, ip)
      c, d = pt(it + 1, ip + 1), pt(it, ip + 1)
      if it:
        tris.append(S.triangle(a, b, c, elem=0))
      tris.append(S.triangle(a, c, d, elem=0))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Shell', surfaces=tris,
      placements=[np.eye(4)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(300., 300.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.2)', ThetaDomain='0, 0.6',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  return scene


def test_smem_mesh_past_1024_matches_xla_interpret():
  '''A 1368-triangle shell — past the round-3/4 1024-row SMEM ceiling
  (raised by round-5 verdict #2) — through the per-ray chunk-culled SMEM
  sweep must reproduce the XLA fused step bin-for-bin.'''
  scene = _shellScene(26, 27, 'smembig')
  device, info = scene.compile()
  assert pallas_trace.pallasEligible(device)
  from optics_design_workbench_tpu.geometry import surfaces as GS
  assert (np.asarray(device['surfaces']['kind'])
          == GS.TRIANGLE).sum() > 1024
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cX['hits']) > 0.2 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_tile_stratified_sampler_distribution_interpret():
  '''tileStratified sampling: each tile draws its (theta, phi) quantiles
  from its own stratum — the sampled DISTRIBUTION over the whole step must
  match the XLA sampler (unbiasedness); exercised through the uniform seam
  with real entropy.'''
  scene = Scene(label='stratdist')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.translation(0, 0, 60.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.03)',
      ThetaDomain='0, 0.5', Wavelength=532.,
      ThetaResolutionNumericMode='2e3'))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=2)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  spec = src.pallasSamplerSpec()
  assert spec is not None
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-80., 80., -80., 80.),
                                     bins=(16, 128))
  n = 1 << 13
  kw = dict(raysPerStep=n, maxIntersections=2, maxRayLength=1e6,
            distTol=1e-4)
  stepK = pallas_trace.makePallasTraceStep(
      device, histSpec, src.deviceColumnsGenerator(), sampler=spec,
      uniformProvider='input', interpret=True, tile=1 << 10,
      tileStratified=True, **kw)
  hK, cK = stepK(jax.random.PRNGKey(3), fused.initHistograms(histSpec))
  stepX = fused.makeFusedStep(device, src.deviceGenerator(), histSpec, **kw)
  hX, cX = stepX(jax.random.PRNGKey(9), fused.initHistograms(histSpec))
  assert int(cK['hits']) > 0.9 * n and int(cX['hits']) > 0.9 * n
  assert _marginalsClose(np.asarray(hK['counts'])[0],
                         np.asarray(hX['counts'])[0])


def test_smem_surface_table_matches_xla_interpret():
  '''A 522-surface assembly — past the 256-surface immediates budget — must
  ride the SMEM analytic-surface table and reproduce the XLA fused step
  bin-for-bin (round-4 verdict #5). The scene is a 20x26 wall of small
  tilted mirror discs plus a spherical cap and a detector, so the sweep
  exercises PLANE and SPHERE runs and the argmin-tracked normals/locals.'''
  import math
  scene = Scene(label='smemsurf')
  mirrors = []
  nx, ny, pitch = 26, 20, 8.
  for iy in range(ny):
    for ix in range(nx):
      cx = (ix - (nx - 1) / 2.) * pitch
      cy = (iy - (ny - 1) / 2.) * pitch
      tilt = T.compose(
          T.translation(cx, cy, 80. + 2. * math.sin(ix * 0.7 + iy)),
          T.rotation((1, 0, 0), 3. * math.cos(ix + iy * 0.5)),
          T.rotation((0, 1, 0), 3. * math.sin(ix * 0.3)))
      mirrors.append(S.plane(tilt, elem=0, radius=0.7 * pitch, orient=-1))
  # one spherical cap in the middle of the wall -> a SPHERE run too
  mirrors.append(S.sphere(T.translation(0, 0, 140.), elem=0, radius=60.,
                          zRange=(-60., -40.), orient=+1))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Wall', surfaces=mirrors,
      placements=[np.eye(4)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(300., 300.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.3)', ThetaDomain='0, 0.9',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  assert pallas_trace.pallasEligible(device), \
      pallas_trace.pallasIneligibleReason(device)
  from optics_design_workbench_tpu.geometry import surfaces as GS
  assert (np.asarray(device['surfaces']['kind'])
          != GS.TRIANGLE).sum() > 256
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            bins=(32, 128), maxIntersections=3, n=N)
  assert int(cX['hits']) > 0.2 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_in_kernel_coupled_scatter_interpret():
  '''theta|phi-COUPLED scatter (low-rank separable expansion) inside the
  kernel via the deterministic-uniform seam: with the SAME uniforms the
  kernel's phi draw + phi-conditioned theta draw + Rodrigues rotations
  must reproduce an independent numpy reference built from the shared
  evaluators (round-4 verdict #4).'''
  from optics_design_workbench_tpu.tracing.batch_tracer import (
      scatterConstants, _evalMarginalConst)

  scene = Scene(label='coupinterp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Diffuser', Reflectivity=1.0,
      ReflectedProbabilityDensity='exp(-(theta*cos(phi))**2/0.003'
                                  ' - (theta*sin(phi))**2/0.05)',
      PowerThetaDomain='0, pi/3', PowerPhiDomain='0, 2*pi',
      surfaces=[S.plane(np.eye(4), elem=0, radius=50., orient=-1)],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(500., 500.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(Label='Src', PowerDensity='1',
                              ThetaDomain='0, 0.01',
                              ThetaResolutionNumericMode='1e3',
                              placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  consts = scatterConstants(device)
  assert consts is not None and consts[0][3][0] == 'lowrank'
  assert pallas_trace.pallasEligible(device)
  _e, _kind, phiSpec, thetaSpec, _pD, _tD = consts[0]

  H, W = 64, 128
  bounds = (-100., 100., -100., 100.)
  histSpec = fused.makeHistogramSpec(device, info, bounds=bounds,
                                     bins=(H, W))

  def columnsGen(key, n, stratified=False):
    z = jnp.zeros((n,), jnp.float32)
    return dict(ox=z, oy=z, oz=z + 1e-3, dx=z, dy=z, dz=z + 1.,
                pw=z + 1., wl=z + 532.)

  key = jax.random.PRNGKey(6)
  step = pallas_trace.makePallasTraceStep(
      device, histSpec, columnsGen, raysPerStep=N, maxIntersections=4,
      maxRayLength=1e6, distTol=1e-4, interpret=True, tile=TILE,
      uniformProvider='input')
  h, c = step(key, fused.initHistograms(histSpec))
  hK = np.asarray(h['counts'])[0]

  us = np.asarray(jax.random.uniform(jax.random.fold_in(key, 0x0177),
                                     (2 * 4, N // 128, 128)))
  u1, u2 = (jnp.asarray(us[0].reshape(-1)), jnp.asarray(us[1].reshape(-1)))
  thetaIn = jnp.zeros_like(u1)      # normal incidence
  phi = np.asarray(_evalMarginalConst(phiSpec, u1, thetaIn))
  theta = np.asarray(_evalMarginalConst(thetaSpec, u2, thetaIn,
                                        jnp.asarray(phi)))
  x = 50. * np.tan(theta) * np.cos(phi)
  y = -50. * np.tan(theta) * np.sin(phi)
  x0, x1, y0, y1 = bounds
  fx, fy = (x - x0) / (x1 - x0), (y - y0) / (y1 - y0)
  inside = (fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1)
  ref = np.zeros((H, W))
  np.add.at(ref, (np.floor(fy[inside] * H).astype(int),
                  np.floor(fx[inside] * W).astype(int)), 1.)
  assert int(c['hits']) == int(inside.sum())
  assert np.abs(hK - ref).sum() <= 4


# ---------------------------------------------------------------------------
# per-bounce beam culling (ops/beam_cull, round-4 verdict #3)
# ---------------------------------------------------------------------------

def test_beam_cull_per_bounce_sets_and_matches_xla():
  '''A 45-degree fold mirror sends the beam to a side detector: bounce 0
  must sweep only the fold, bounce 1 only the detector, bounce 2 nothing
  (the absorber terminates propagation) — and decoy mirrors the beam can
  never reach stay culled at EVERY bounce while the kernel remains
  bin-identical to the uncalled XLA path.'''
  from optics_design_workbench_tpu.ops import beam_cull
  scene = Scene(label='bcull')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Fold',
      surfaces=[S.plane(np.eye(4), elem=0, radius=60.)],
      placements=[T.placement((0, 0, 100.), axis=(1, 0, 0), angleDeg=45.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(50., 50.))],
      placements=[T.placement((0, 200., 100.), axis=(1, 0, 0),
                              angleDeg=-90.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='DecoyBehind',
      surfaces=[S.plane(np.eye(4), elem=0, radius=40.)],
      placements=[T.translation(0, 0, -300.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='DecoyBelow',
      surfaces=[S.plane(np.eye(4), elem=0, radius=40.)],
      placements=[T.placement((0, -200., 100.), axis=(1, 0, 0),
                              angleDeg=-90.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.01)', ThetaDomain='0, 0.2',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=4)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  bound = src.emissionBound()
  assert bound is not None
  hs = fused.makeHistogramSpec(device, info,
                               bounds=(-300., 300., -300., 300.),
                               bins=(32, 128))
  surfRows, elemRows, _m = pallas_trace._sceneRows(device, hs)
  from optics_design_workbench_tpu.tracing.batch_tracer import \
      scatterConstants
  sets = beam_cull.propagateBounceSets(
      surfRows, elemRows, scatterConstants(device), bound, 4)
  byElem = {int(r['elemF']): i for i, r in enumerate(surfRows)}
  fold, det = byElem[0], byElem[1]
  decoys = {byElem[2], byElem[3]}
  assert sets[0] == [fold]
  assert det in sets[1]
  # only the fold/detector pair ever stays reachable (the fold keeps
  # ITSELF in later sets — a conservative self-reach, not a miss)
  assert all(s is not None and set(s) <= {fold, det} for s in sets)
  assert all(not (set(s) & decoys) for s in sets)
  hP, hX, cP, cX = _runPair(scene, bounds=(-300., 300., -300., 300.),
                            bins=(32, 128), maxIntersections=4, n=N,
                            emissionBound=bound)
  assert int(cX['hits']) > 0.5 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_beam_cull_reflect_back_keeps_detector():
  '''Punish optimistic culling: a concave spherical mirror reflects the
  beam BACK past the source onto a detector behind it. A naive
  forward-only cull would drop that detector from every set; the
  normal-cone reflection must keep it at bounce 1 and the kernel must
  stay bin-identical (equal hit counts) with the XLA path.'''
  from optics_design_workbench_tpu.ops import beam_cull
  scene = Scene(label='bcullback')
  # cap of a R=40 sphere centered at z=140: patch near z=100 facing -z
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Concave',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=40.,
                         zRange=(-40., -36.))],
      placements=[T.translation(0, 0, 140.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='DetBehind', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(200., 200.))],
      placements=[T.translation(0, 0, -50.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.01)', ThetaDomain='0, 0.15',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=3)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  bound = src.emissionBound()
  assert bound is not None
  hs = fused.makeHistogramSpec(device, info,
                               bounds=(-200., 200., -200., 200.),
                               bins=(32, 128))
  surfRows, elemRows, _m = pallas_trace._sceneRows(device, hs)
  from optics_design_workbench_tpu.tracing.batch_tracer import \
      scatterConstants
  sets = beam_cull.propagateBounceSets(
      surfRows, elemRows, scatterConstants(device), bound, 3)
  byElem = {int(r['elemF']): i for i, r in enumerate(surfRows)}
  assert byElem[1] in (sets[1] if sets[1] is not None else [byElem[1]])
  hP, hX, cP, cX = _runPair(scene, bounds=(-200., 200., -200., 200.),
                            bins=(32, 128), maxIntersections=3, n=N,
                            emissionBound=bound)
  assert int(cX['hits']) > 0.5 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_beam_cull_ball_lens_matches_xla():
  '''Refraction through a full ball lens (enter + exit + possible TIR):
  the culled kernel must keep every reachable surface (equal hit counts,
  bin-identical) while a decoy far outside any refraction cone is culled
  from every set.'''
  from optics_design_workbench_tpu.ops import beam_cull
  scene = Scene(label='bculllens')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Lens', Label='Ball', RefractiveIndex=1.5,
      surfaces=[S.sphere(np.eye(4), elem=0, radius=10.)],
      placements=[T.translation(0, 0, 30.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.translation(0, 0, 80.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Decoy',
      surfaces=[S.plane(np.eye(4), elem=0, radius=30.)],
      placements=[T.translation(0, 0, -400.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.02)', ThetaDomain='0, 0.3',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=6)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  bound = src.emissionBound()
  assert bound is not None
  hs = fused.makeHistogramSpec(device, info,
                               bounds=(-100., 100., -100., 100.),
                               bins=(32, 128))
  surfRows, elemRows, _m = pallas_trace._sceneRows(device, hs)
  from optics_design_workbench_tpu.tracing.batch_tracer import \
      scatterConstants
  sets = beam_cull.propagateBounceSets(
      surfRows, elemRows, scatterConstants(device), bound, 6)
  byElem = {int(r['elemF']): i for i, r in enumerate(surfRows)}
  decoy = byElem[2]
  assert all(s is None or decoy not in s for s in sets)
  assert any(s is not None and decoy not in s for s in sets)
  hP, hX, cP, cX = _runPair(scene, bounds=(-100., 100., -100., 100.),
                            bins=(32, 128), maxIntersections=6, n=N,
                            emissionBound=bound)
  assert int(cX['hits']) > 0.3 * N
  assert int(cP['hits']) == int(cX['hits'])
  assert _nearlyEqualCounts(hP, hX)


def test_beam_cull_normal_cone_conservative():
  '''normalCone must CONTAIN every oriented world normal of the patch:
  sampled numerically for a rotated sphere band, an off-axis cap and an
  asphere; unknown kinds return None.'''
  from optics_design_workbench_tpu.ops import beam_cull
  rng = np.random.default_rng(3)
  axis = np.array([1., 2., -0.5])
  axis /= np.linalg.norm(axis)
  M = T.placement((3., -2., 7.), axis=axis, angleDeg=37.)
  for zr, orient in (((2., 8.), +1), ((-8., -3.), -1), ((-4., 5.), +1)):
    surf = S.sphere(M, elem=0, radius=8., zRange=zr, orient=orient)
    tab = S.buildSurfaceTable([surf], devicePut=False)
    hs = dict(elemToDet=np.array([-1]), bounds=np.zeros((0, 4)))
    rows, _e, _m = pallas_trace._sceneRows(
        dict(surfaces=tab, elements=dict(packed=np.zeros((1, 11)),
                                         optType=np.zeros(1))), hs)
    nc = beam_cull.normalCone(rows[0])
    assert nc is not None
    cAxis, cAlpha = nc
    R = np.array([[rows[0]['r00'], rows[0]['r01'], rows[0]['r02']],
                  [rows[0]['r10'], rows[0]['r11'], rows[0]['r12']],
                  [rows[0]['r20'], rows[0]['r21'], rows[0]['r22']]])
    z = rng.uniform(zr[0], zr[1], 400)
    phi = rng.uniform(0, 2 * np.pi, 400)
    r = np.sqrt(np.maximum(64. - z * z, 0.))
    nLoc = np.stack([r * np.cos(phi), r * np.sin(phi), z], 1) / 8.
    nW = (R.T @ nLoc.T).T * orient
    cosang = nW @ cAxis
    assert (np.arccos(np.clip(cosang, -1, 1)) <= cAlpha + 1e-6).all()
  # plane: exact
  rowsP, _e2, _m2 = pallas_trace._sceneRows(
      dict(surfaces=S.buildSurfaceTable(
          [S.plane(M, elem=0, radius=5., orient=-1)], devicePut=False),
           elements=dict(packed=np.zeros((1, 11)), optType=np.zeros(1))),
      dict(elemToDet=np.array([-1]), bounds=np.zeros((0, 4))))
  ncP = beam_cull.normalCone(rowsP[0])
  assert ncP is not None and ncP[1] == 0.
  # cylinders have no useful cone
  rowsC, _e3, _m3 = pallas_trace._sceneRows(
      dict(surfaces=S.buildSurfaceTable(
          [S.cylinder(M, elem=0, radius=5., zRange=(0., 4.))],
          devicePut=False),
           elements=dict(packed=np.zeros((1, 11)), optType=np.zeros(1))),
      dict(elemToDet=np.array([-1]), bounds=np.zeros((0, 4))))
  assert beam_cull.normalCone(rowsC[0]) is None


def test_smem_surface_chunking_host_invariants():
  '''_chunkSurfRows: long runs with bounding spheres are Morton-chunked at
  a fixed _SURF_CHUNK stride (padded with never-hit dummy rows), every
  real surface appears exactly once, chunk AABBs contain their members'
  spheres, and runs without spheres stay plain.'''
  from optics_design_workbench_tpu.ops.pallas_trace import (
      _chunkSurfRows, _dummySurfRow, _SURF_CHUNK, _intersectConst, _BIG)
  rng = np.random.default_rng(5)
  entries = []
  for i in range(80):            # an 80-plane run (chunked)
    row = np.zeros(21, np.float32)
    row[0] = row[4] = row[8] = 1.
    row[9:12] = rng.uniform(-50., 50., 3)
    row[12], row[13] = 1., 0.
    row[19], row[20] = 0., 5.    # disc r <= 5
    entries.append((0, 0., row, (np.asarray(-row[9:12], float), 5.)))
  rowU = np.zeros(21, np.float32)
  rowU[0] = rowU[4] = rowU[8] = 1.
  rowU[12], rowU[20] = 1., 1e30
  entries.append((0, 1., rowU, None))   # unbounded rect run: plain
  table, plain, boxes, chunkRuns = _chunkSurfRows(entries)
  assert len(chunkRuns) == 1 and len(plain) == 1
  kind, trim0, c0, c1, rowStart = chunkRuns[0]
  nCh = c1 - c0
  assert nCh == -(-80 // _SURF_CHUNK) and len(boxes) == nCh
  # every real row appears exactly once in the chunked block
  block = table[rowStart:rowStart + nCh * _SURF_CHUNK]
  real = block[np.abs(block[:, 20] - 5.) < 1e-6]
  assert len(real) == 80
  offs = sorted(map(tuple, real[:, 9:12].tolist()))
  assert offs == sorted(map(tuple,
                            np.stack([e[2][9:12] for e in entries[:80]])
                            .tolist()))
  # chunk AABBs contain their member spheres
  for c in range(nCh):
    rows = block[c * _SURF_CHUNK:(c + 1) * _SURF_CHUNK]
    rows = rows[np.abs(rows[:, 20] - 5.) < 1e-6]
    cen = -rows[:, 9:12]
    assert (cen - 5. >= boxes[c, :3] - 1e-3).all()
    assert (cen + 5. <= boxes[c, 3:] + 1e-3).all()
  # dummy rows can never be hit, for every smem kind/trim combo
  for kind, trim0 in ((0, 0.), (0, 1.), (1, 0.), (2, 0.), (5, 0.),
                      (6, 0.)):
    d = _dummySurfRow(kind, trim0)
    r = dict(kind=kind, trim0=trim0, p0=float(d[14]), p1=float(d[15]),
             p2=float(d[16]), p3=float(d[17]), p4=float(d[18]),
             trim1=float(d[19]), trim2=float(d[20]), ident=True)
    o = jnp.asarray(rng.uniform(-20., 20., (3, 64)))
    dirs = rng.normal(size=(3, 64))
    dirs /= np.linalg.norm(dirs, axis=0)
    dv = jnp.asarray(dirs)
    t = _intersectConst(r, o[0], o[1], o[2], dv[0], dv[1], dv[2], 1e-4)
    assert float(jnp.min(t)) >= 0.5 * _BIG, (kind, trim0)


def test_pallas_sweep_step_matches_single_scene_interpret():
  '''makePallasSweepStep: the variant-major sweep kernel (stacked SMEM
  surface rows, per-variant histogram blocks, within-variant tile
  seeding/strata) must reproduce EACH variant's single-scene pallas step
  bin-for-bin with the same key (common random numbers across variants).'''
  from optics_design_workbench_tpu.models import Scene, PointSource, \
      OpticalGroup

  def build(R):
    aperture, thickness = 12., 5.
    sag = R - np.sqrt(R ** 2 - aperture ** 2)
    sc = Scene(label=f'sweep{R}')
    sc.addOpticalGroup(OpticalGroup(
        OpticalType='Lens', Label='Lens', RefractiveIndex=1.5,
        surfaces=[
            S.sphere(T.translation(0, 0, R), elem=0, radius=R,
                     zRange=(-R, -R + sag + 1e-6), orient=+1),
            S.plane(T.translation(0, 0, thickness), elem=0,
                    radius=aperture, orient=+1),
            S.cylinder(T.translation(0, 0, thickness / 2), elem=0,
                       radius=aperture,
                       zRange=(-thickness / 2, thickness / 2), orient=+1)],
        placements=[T.translation(0, 0, 40)]))
    sc.addOpticalGroup(OpticalGroup(
        OpticalType='Absorber', Label='Det', RecordHits=True,
        surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(60., 60.))],
        placements=[T.translation(0, 0, 160)]))
    sc.addSource(PointSource(Label='Src', PowerDensity='exp(-r^2/40)',
                             FocalLength='inf', RadiusDomain='0, 10',
                             RadiusResolutionNumericMode='1e3',
                             Wavelength=532.))
    sc.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=6)
    return sc

  radii = (45., 60., 80.)
  scenes = [build(r) for r in radii]
  hostScenes = []
  for sc in scenes:
    host, info = sc.compile(devicePut=False)
    host['powerTol'] = 1e-6
    hostScenes.append((host, info))
  src0 = scenes[0].lightSources()[0]
  spec = src0.pallasSamplerSpec()
  assert spec is not None
  bounds = (-60., 60., -60., 60.)
  step, packTables = pallas_trace.makePallasSweepStep(
      hostScenes, bounds, (32, 64), spec, raysPerVariant=N,
      maxIntersections=6, maxRayLength=1e6, distTol=1e-4,
      interpret=True, tile=TILE)
  table = packTables(hostScenes)
  assert table.shape == (3 * 1, 21)      # only the sphere cap varies
  key = jax.random.PRNGKey(9)
  power, counts, segs = step(key, table)
  assert power.shape == (3, 1, 32, 64)
  from optics_design_workbench_tpu.tracing import fused as F
  for v, sc in enumerate(scenes):
    device, info = sc.compile()
    device['powerTol'] = 1e-6
    hs = F.makeHistogramSpec(device, info, bounds=bounds, bins=(32, 64))
    srcV = sc.lightSources()[0]
    stepS = pallas_trace.makePallasTraceStep(
        device, hs, srcV.deviceColumnsGenerator(), raysPerStep=N,
        maxIntersections=6, maxRayLength=1e6, distTol=1e-4,
        interpret=True, tile=TILE, sampler=srcV.pallasSamplerSpec())
    hS, cS = stepS(key, F.initHistograms(hs))
    dC = np.abs(np.asarray(counts[v]) - np.asarray(hS['counts'])).sum()
    assert dC <= 4, (v, dC)
    assert abs(float(np.asarray(counts[v]).sum())
               - float(cS['hits'])) <= 4
  # different radii must actually produce different histograms
  assert np.abs(np.asarray(counts[0]) - np.asarray(counts[2])).sum() > 0


def test_pallas_sweep_geom_mode_matches_single_scene_interpret():
  '''geomMode sweep: variants differing ONLY in source placement read
  their [R, off, wl] row from SMEM; each variant must reproduce the
  single-scene kernel (which bakes that same placement as constants)
  bin-for-bin.'''
  from optics_design_workbench_tpu.models import Scene, PointSource, \
      OpticalGroup

  def build(xOff):
    sc = Scene(label=f'gsweep{xOff}')
    sc.addOpticalGroup(OpticalGroup(
        OpticalType='Absorber', Label='Det', RecordHits=True,
        surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
        placements=[T.translation(0, 0, 60.)]))
    sc.addSource(PointSource(Label='Src', PowerDensity='exp(-theta^2/0.02)',
                             ThetaDomain='0, 0.4', Wavelength=532.,
                             ThetaResolutionNumericMode='1e3',
                             placement=T.translation(xOff, 0, 1e-3)))
    sc.addSimulationSettings(RaysPerIteration=1e4, MaxIntersections=2)
    return sc

  offs = (0., 15., -25.)
  scenes = [build(x) for x in offs]
  hostScenes = []
  for sc in scenes:
    host, info = sc.compile(devicePut=False)
    host['powerTol'] = 1e-6
    hostScenes.append((host, info))
  from optics_design_workbench_tpu.jupyter_utils.parameter_sweeper import \
      _sourceGeomRow
  geoms = np.stack([_sourceGeomRow(sc.lightSources()[0])
                    for sc in scenes]).astype(np.float32)
  spec0 = scenes[0].lightSources()[0].pallasSamplerSpec()
  bounds = (-80., 80., -80., 80.)
  step, packTables = pallas_trace.makePallasSweepStep(
      hostScenes, bounds, (32, 64), spec0, raysPerVariant=N,
      maxIntersections=2, maxRayLength=1e6, distTol=1e-4,
      interpret=True, tile=TILE, geomMode=True)
  table = packTables(hostScenes)
  assert table.shape[0] == 0          # nothing varies but the source
  key = jax.random.PRNGKey(21)
  power, counts, _segs = step(key, table, geoms)
  from optics_design_workbench_tpu.tracing import fused as F
  for v, sc in enumerate(scenes):
    device, info = sc.compile()
    device['powerTol'] = 1e-6
    hs = F.makeHistogramSpec(device, info, bounds=bounds, bins=(32, 64))
    srcV = sc.lightSources()[0]
    stepS = pallas_trace.makePallasTraceStep(
        device, hs, srcV.deviceColumnsGenerator(), raysPerStep=N,
        maxIntersections=2, maxRayLength=1e6, distTol=1e-4,
        interpret=True, tile=TILE, sampler=srcV.pallasSamplerSpec())
    hS, cS = stepS(key, F.initHistograms(hs))
    dC = np.abs(np.asarray(counts[v]) - np.asarray(hS['counts'])).sum()
    assert dC <= 4, (v, dC)
  assert np.abs(np.asarray(counts[0]) - np.asarray(counts[1])).sum() > 0
