#!/usr/bin/env python
'''
Scene-class throughput criteria (run on real TPU):

    python tools/scene_throughput.py [--json /tmp/scene_throughput.json]

Measures, in ONE process (relay noise is +-10-20%; CLAUDE.md), the
hardware throughput of each scene class the round-2 VERDICT set a "done"
bar for, and prints measured-vs-target:

  headline           lens+mirror+detector        >= 1.0  G seg/s (north star)
  surface_source     cos^2(theta) disc emitter   >= 0.5  G seg/s (VERDICT #1)
  diffuse_scatter    theta-only lobe diffuser    >= 0.3  G seg/s (VERDICT #2)
  conditioned_dirac  theta_in lobe + DiracDelta  >= 0.3  G seg/s (VERDICT #2)
  example2_prims     reference example 2 (trim   >= 1.0  G seg/s (VERDICT #3)
                     prims, 26 surfaces)
  example2_doubled   example 2 + a second un-   >= 0.7  G seg/s (round-5:
                     lit copy (52 surfaces)      sublinear scaling)
  mesh_dish_1800     1800-tri dish, MC source    >= 0.1  G seg/s (round-4
                     (SMEM + per-ray chunk cull;  verdict #2; largest
                     compiler caps tables ~21k    in-kernel mesh class)
                     f32 scalars — 5k+ tris take
                     the measured XLA fallback)
  surf_wall          522-surface mirror wall     >= 0.1  G seg/s (round-4
                     (SMEM surf table + chunks)   verdict #5; 27x XLA)
  coupled_scatter    theta|phi-coupled lobe      >= 0.3  G seg/s (round-4
                     (low-rank separable)         verdict #4)
  mesh_fold          triangle-mesh fold mirror   >= 0.3  G seg/s (VERDICT #3)
  spectrometer       reflection grating          >= 0.3  G seg/s (4th BASELINE)
  mesh_dish_smem     200-tri SMEM mesh sweep     >= 0.1  G seg/s (round 3)
  mesh_dish_coherent same dish, narrow beam      >= 0.1  G seg/s (round 4:
                     Morton-chunk broad-phase cull engages on coherent tiles)
  torus_mirror       toroidal fold mirror        >= 0.3  G seg/s (round 4:
                     in-kernel Ferrari/Newton quartic)
  sweep_batched      examples/3 batched lens-    >= 10   M rays/s aggregate
                     radius sweep (5th BASELINE  AND cold wall < 120 s
                     config, evaluateBatched)    (VERDICT #9)
  raw_step           per-hit ring records        >= 20   M rays/s (VERDICT #5)

Every stage is individually guarded so one failing scene class cannot
mask the others' numbers.
'''

import argparse
import json
import os
import sys
import time

# Self-sufficient import path: the scene builders import the package lazily,
# so running `python tools/scene_throughput.py` from any cwd must work.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def _bestOfWindows(stepFn, syncFn, perCall, windows=3, minSeconds=1.5,
                   maxCalls=24):
  '''Peak sustained rate over `windows` timed windows. `stepFn(i)` queues
  one async call; `syncFn(result)` must force a device-to-host fetch
  (jax.block_until_ready is unreliable on the axon backend — CLAUDE.md).
  Returns (bestRatePerSec, callsPerWindow).'''
  best, calls = 0., 0
  for w in range(windows):
    results = []
    t0 = time.perf_counter()
    n = 0
    while True:
      results.append(stepFn(1000 * w + n))
      n += 1
      if n >= 4 and (time.perf_counter() - t0 >= minSeconds
                     or n >= maxCalls):
        break
    _ = syncFn(results[-1])                   # ONE D2H fetch = real sync
    dt = time.perf_counter() - t0
    # remaining fetches land OUTSIDE the timed window (each counter fetch
    # costs ~35-75 ms over the relay — summing inside the window once made
    # every scene look ~5x slower than it is)
    total = sum(syncFn(r) for r in results)
    best = max(best, total / dt)
    calls = n
  return best, calls


def _measureHistScene(scene, maxIntersections, bounds, bins=(128, 128),
                      raysPerStep=1 << 22, **stepKw):
  '''G segments/s through the fused Pallas histogram step.'''
  from optics_design_workbench_tpu.ops import pallas_trace
  from optics_design_workbench_tpu.tracing import fused

  device, info = scene.compile()
  device['powerTol'] = 1e-6
  if not pallas_trace.pallasEligible(device):
    raise RuntimeError('scene not pallasEligible: '
                       + pallas_trace.pallasIneligibleReason(device))
  src = scene.lightSources()[0]
  histSpec = fused.makeHistogramSpec(device, info, bounds=bounds, bins=bins)
  sampler = (src.pallasSamplerSpec()
             if hasattr(src, 'pallasSamplerSpec') else None)
  step = pallas_trace.makePallasTraceStep(
      device, histSpec, src.deviceColumnsGenerator(),
      raysPerStep=raysPerStep, maxIntersections=maxIntersections,
      maxRayLength=1e6, distTol=1e-4, sampler=sampler,
      emissionBound=(src.emissionBound()
                     if hasattr(src, 'emissionBound') else None), **stepKw)
  key = jax.random.PRNGKey(11)
  state = {'h': fused.initHistograms(histSpec)}

  t0 = time.perf_counter()
  state['h'], c = step(key, state['h'])
  _ = int(c['segments'])
  compileS = time.perf_counter() - t0

  def run(i):
    state['h'], c = step(jax.random.fold_in(key, i), state['h'])
    return c

  rate, calls = _bestOfWindows(run, lambda c: int(c['segments']),
                               raysPerStep)
  return rate, dict(compileS=round(compileS, 1), callsPerWindow=calls,
                    raysPerStep=raysPerStep)


def sceneHeadline():
  from optics_design_workbench_tpu import benchmarks
  return (benchmarks.buildLensMirrorScene(), 6, (-60., 60., -60., 60.))


def sceneSurfaceSource():
  from optics_design_workbench_tpu import benchmarks
  return (benchmarks.buildSurfaceSourceScene(), 4,
          (-120., 120., -120., 120.))


def _scatterScene(density, thetaDom, srcTheta):
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='scat_tp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Diffuser', Reflectivity=1.0,
      ReflectedProbabilityDensity=density,
      PowerThetaDomain=thetaDom, PowerPhiDomain='0, 2*pi',
      surfaces=[S.plane(np.eye(4), elem=0, radius=50., orient=-1)],
      placements=[T.translation(0, 0, 50)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(500., 500.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(Label='Src',
                              PowerDensity='exp(-theta^2/0.01)',
                              ThetaDomain=srcTheta,
                              ThetaResolutionNumericMode='2e3',
                              placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=4)
  return scene


def sceneDiffuseScatter():
  return (_scatterScene('exp(-theta^2/0.02)', '0, pi/3', '0, 0.05'), 4,
          (-100., 100., -100., 100.))


def sceneConditionedDirac():
  return (_scatterScene('DiracDelta(theta-theta_refl)'
                        ' + 5*exp(-(theta-theta_in)**2/0.02)',
                        '0, pi/2', '0, 0.3'), 4,
          (-100., 100., -100., 100.))


def sceneExample2():
  import os
  import shutil
  from optics_design_workbench_tpu.models.fcstd_ingest import loadFCStd
  ref2 = '/root/reference/examples/2-lens-and-mirror/main.FCStd'
  if not os.path.exists(ref2):
    raise RuntimeError('reference example 2 FCStd not available')
  shutil.copy(ref2, '/tmp/scene_throughput_m2.FCStd')
  return (loadFCStd('/tmp/scene_throughput_m2.FCStd'), 8,
          (-60., 60., -60., 60.))


def sceneExample2Doubled():
  '''Example 2 with a full second copy of its 26-surface assembly placed
  500 mm aside (52 surfaces, one source): the round-4 verdict #3 scaling
  probe — per-bounce beam culling must keep the sweep near the LIT
  assembly's cost, so the rate degrades sublinearly vs example2_prims
  instead of halving.'''
  import copy
  scene, maxI, bounds = sceneExample2()
  off = np.eye(4)
  off[0, 3] = 500.
  for g in list(scene.opticalObjects()):
    g2 = copy.deepcopy(g)
    g2.Label = g.Label + 'Copy'
    g2.placements = [off @ np.asarray(p, float) for p in g2.placements]
    scene.add(g2)
  # tile-stratified sampling: each tile draws from its own (theta, phi)
  # stratum, so tiles whose angular wedge only lights the near assembly go
  # all-dead early and skip the 52-surface sweep entirely (the grazing
  # wedge that can reach the copy is a small fraction of the quantile
  # space) — dynamic sublinearity where a SOUND static cull cannot prune
  # (grazing rays physically reach the copy)
  return scene, maxI, bounds, dict(tileStratified=True)


def sceneMeshFold():
  import math
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  c, s = math.cos(math.radians(45.)), math.sin(math.radians(45.))

  def pt(x, y):
    return (x, y * c, 60. + y * s)

  scene = Scene(label='mesh_tp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='FoldTri',
      surfaces=[S.triangle(pt(-25, -25), pt(25, -25), pt(25, 25), elem=0),
                S.triangle(pt(-25, -25), pt(25, 25), pt(-25, 25), elem=0)],
      placements=[np.eye(4)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.sphere(np.eye(4), elem=0, radius=300., orient=-1)],
      placements=[np.eye(4)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.05)',
      ThetaDomain='0, 0.3', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-300., 300., -300., 300.)


def sceneMeshDish():
  '''200-triangle dish mirror: the SMEM-looped mesh sweep (>128 tris).'''
  import math
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='dish_tp')
  tris = []
  nQ, R0, z0 = 10, 40., 60.

  def pt(ir, ip):
    r = R0 * ir / nQ
    ph = 2 * math.pi * ip / nQ
    return (r * math.cos(ph), r * math.sin(ph), z0 + 0.004 * r * r)

  for ir in range(nQ):
    for ip in range(nQ):
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
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-200., 200., -200., 200.)


def sceneMeshDishCollimated():
  '''Same 200-triangle dish, but lit by a NARROW beam (theta <= 0.03 rad)
  aimed off-center: the per-tile alive-ray reach AABB stays thin, so the
  Morton-chunk broad-phase cull skips most of the mesh each bounce —
  the coherent-tile counterpart of mesh_dish_smem (fan/render-mode and
  collimated-source workloads look like this).'''
  import math
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='dishcoh_tp')
  tris = []
  nQ, R0, z0 = 10, 40., 60.

  def pt(ir, ip):
    r = R0 * ir / nQ
    ph = 2 * math.pi * ip / nQ
    return (r * math.cos(ph), r * math.sin(ph), z0 + 0.004 * r * r)

  for ir in range(nQ):
    for ip in range(nQ):
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
  # beam aimed at the dish rim: tilt the source frame ~24 deg off-axis
  aim = T.rotation((0., 1., 0.), 24.) @ T.translation(0, 0, 1e-3)
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/2e-4)', ThetaDomain='0, 0.03',
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=aim))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-200., 200., -200., 200.)


def sceneTorusMirror():
  '''Toroidal fold mirror: the quartic (Ferrari + Newton) TORUS kind in
  the kernel immediates path.'''
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='torus_tp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Ring',
      surfaces=[S.torus(np.eye(4), elem=0, majorRadius=30.,
                        minorRadius=8.)],
      placements=[T.translation(0, 0, 80.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Det',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(200., 200.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-(theta-0.38)^2/0.01)',
      ThetaDomain='0.15, 0.55', Wavelength=532.,
      ThetaResolutionNumericMode='1e3'))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-200., 200., -200., 200.)


def _dishScene(nQ, thetaDom='0, 0.5', dens='exp(-theta^2/0.1)'):
  '''nQ*nQ*2-triangle paraboloid dish mirror + floor detector (the big-
  mesh scene family; nQ=10 is the round-3 mesh_dish_smem scene).'''
  import math
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label=f'dish{nQ}_tp')
  tris = []
  R0, z0 = 40., 60.

  def pt(ir, ip):
    r = R0 * ir / nQ
    ph = 2 * math.pi * ip / nQ
    return (r * math.cos(ph), r * math.sin(ph), z0 + 0.004 * r * r)

  for ir in range(nQ):
    for ip in range(nQ):
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
      Label='Src', PowerDensity=dens, ThetaDomain=thetaDom,
      Wavelength=532., ThetaResolutionNumericMode='1e3',
      placement=T.translation(0, 0, 1e-3)))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene


def sceneMeshDish5k():
  '''5000-triangle CAD-scale dish under a WIDE Monte-Carlo source (round-4
  verdict #2 class). Past the measured ~1.9k-row SMEM compiler ceiling —
  rides the chunked XLA fallback (measured as xla_mesh_dish_5k).'''
  return _dishScene(50), 3, (-200., 200., -200., 200.)


def sceneMeshDish1800():
  '''1800-triangle dish under the same wide Monte-Carlo source: the
  LARGEST in-kernel mesh class (the v5e remote compiler crashes once one
  SMEM table passes ~21k f32 scalars — 2048x11-row tables die at any
  chunk granularity, bisected round 5; SMEM_TRI_LIMIT pins 1890).'''
  return _dishScene(30), 3, (-200., 200., -200., 200.)


def sceneSurfWall():
  '''522 analytic surfaces (20x26 tilted mirror discs + a spherical cap +
  detector): past the 256-surface immediates budget — rides the SMEM
  analytic-surface table (round-4 verdict #5; done-criterion there is
  ">= 5x the XLA fallback" — measured 27x in round 5 with the Morton
  chunk cull + tile-stratified sampling; the 0.1 G bar matches the other
  SMEM-sweep classes).'''
  import math
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='surfwall_tp')
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
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-300., 300., -300., 300.)


def sceneCoupledScatter():
  '''theta|phi-coupled astigmatic diffuser (reference test/70
  2-test-astigmatic-beams analog): in-kernel via the low-rank separable
  expansion (round-4 verdict #4).'''
  return (_scatterScene(
      'exp(-(theta*cos(phi))**2/0.003 - (theta*sin(phi))**2/0.05)',
      '0, pi/3', '0, 0.05'), 4, (-100., 100., -100., 100.))


def _measureXlaScene(scene, maxIntersections, bounds, bins=(128, 128),
                     raysPerStep=1 << 20):
  '''G segments/s through the XLA fused step (the fallback path) —
  measured so every pallasIneligibleReason class has a NUMBER in
  docs/performance.md instead of an assumed "slow" (round-4 verdict #8).'''
  from optics_design_workbench_tpu.tracing import fused

  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  histSpec = fused.makeHistogramSpec(device, info, bounds=bounds, bins=bins)
  step = fused.makeFusedStep(
      device, src.deviceGenerator(), histSpec, raysPerStep=raysPerStep,
      maxIntersections=maxIntersections, maxRayLength=1e6, distTol=1e-4)
  key = jax.random.PRNGKey(11)
  state = {'h': fused.initHistograms(histSpec)}
  t0 = time.perf_counter()
  state['h'], c = step(key, state['h'])
  _ = int(c['segments'])
  compileS = time.perf_counter() - t0

  def run(i):
    state['h'], c = step(jax.random.fold_in(key, i), state['h'])
    return c

  rate, calls = _bestOfWindows(run, lambda c: int(c['segments']),
                               raysPerStep, windows=2, minSeconds=1.5,
                               maxCalls=8)
  return rate, dict(compileS=round(compileS, 1), callsPerWindow=calls,
                    raysPerStep=raysPerStep)


def sceneFallbackMesh12k():
  '''12800-triangle dish: past SMEM_TRI_LIMIT — the XLA chunked fallback
  class, measured (round-4 verdict weak #5).'''
  return _dishScene(80), 3, (-200., 200., -200., 200.)


def sceneFallbackSurf5k():
  '''5070 analytic surfaces: past SMEM_SURF_LIMIT — XLA fallback class.'''
  import math
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='surf5k_tp')
  mirrors = []
  nx, ny, pitch = 78, 65, 3.
  for iy in range(ny):
    for ix in range(nx):
      cx = (ix - (nx - 1) / 2.) * pitch
      cy = (iy - (ny - 1) / 2.) * pitch
      tilt = T.compose(
          T.translation(cx, cy, 80. + 2. * math.sin(ix * 0.7 + iy)),
          T.rotation((1, 0, 0), 3. * math.cos(ix + iy * 0.5)))
      mirrors.append(S.plane(tilt, elem=0, radius=0.6 * pitch, orient=-1))
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
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-300., 300., -300., 300.)


def sceneSpectrometer():
  '''examples/4: reflection-grating spectrometer (4th BASELINE config).'''
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  scene = Scene(label='spectro_tp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Grating', Label='Grating', GratingType='Reflection',
      GratingLinesPerMillimeter=500., GratingDiffractionOrder=1,
      GratingLinesOrientation=(1., 0., 0.),
      surfaces=[S.plane(np.eye(4), elem=0, radius=40., orient=-1)],
      placements=[T.translation(0, 0, 100.)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Detector',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(80., 80.))],
      placements=[T.translation(0, 0, 0)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/1e-4)', Wavelength=532.,
      ThetaDomain='0, 0.05', ThetaResolutionNumericMode='2e3'))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=3)
  return scene, 3, (-80., 80., -80., 80.)


def measureRawStep(raysPerStep=1 << 20):
  '''M rays/s through makePallasRawStep (device-side records only; the
  e2e stored-run path adds compaction+fetch, measured in the runner).'''
  from optics_design_workbench_tpu.models import (Scene, PointSource,
                                                  OpticalGroup)
  from optics_design_workbench_tpu.geometry import surfaces as S
  from optics_design_workbench_tpu.geometry import transforms as T
  from optics_design_workbench_tpu.ops import pallas_trace
  from optics_design_workbench_tpu.tracing import fused

  scene = Scene(label='raw_tp')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Vacuum', Label='Det', RecordHits=True,
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(50., 50.))],
      placements=[T.translation(0, 0, 40)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Back',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(50., 50.))],
      placements=[T.translation(0, 0, 90.)]))
  scene.addSource(PointSource(
      Label='Src', PowerDensity='exp(-theta^2/0.02)',
      ThetaDomain='0, 0.3', Wavelength=532.,
      ThetaResolutionNumericMode='1e4'))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=6)
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-50., 50., -50., 50.),
                                     bins=(32, 128))
  src = scene.lightSources()[0]
  step = pallas_trace.makePallasRawStep(
      device, histSpec, src.deviceColumnsGenerator(),
      raysPerStep=raysPerStep, maxIntersections=6, maxRayLength=1e6,
      distTol=1e-4)
  key = jax.random.PRNGKey(17)
  t0 = time.perf_counter()
  rec, c = step(key)
  _ = int(c['hits'])
  compileS = time.perf_counter() - t0

  def run(i):
    _rec, c = step(jax.random.fold_in(key, i))
    return c

  rate, calls = _bestOfWindows(run, lambda c: raysPerStep + 0 * int(c['hits']),
                               raysPerStep)
  return rate, dict(compileS=round(compileS, 1), callsPerWindow=calls,
                    raysPerStep=raysPerStep)


def measureSweepBatched(nVariants=11, raysPerScene=200_000):
  '''The 5th BASELINE config (examples/3-parameter-sweeps): the batched
  lens-radius sweep through ParameterSweeper.evaluateBatched. Two
  criteria: cold wall (compile included) must stay under 120 s — the
  round-2 judge observed ~15 min before the lax.map rewrite — and the
  steady-state aggregate sampling+trace+histogram rate across all
  variants.'''
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      'example3', os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), 'examples', '3_parameter_sweeps.py'))
  ex3 = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(ex3)
  from optics_design_workbench_tpu.jupyter_utils import (ParameterSweeper,
                                                         Parameter)

  holder = dict(scene=ex3.buildScene(), R=60.)

  def setRadius(r):
    holder['R'] = float(r)
    holder['scene'] = ex3.buildScene(float(r))
    sweeper.scene = holder['scene']

  sweeper = ParameterSweeper(
      lambda sc: dict(R=Parameter(getter=lambda: holder['R'],
                                  setter=setRadius, bounds=(40., 100.))),
      scene=holder['scene'])
  radii = np.linspace(45., 95., nVariants)

  def spotMetric(power, counts):
    H = counts[0]
    n = H.sum()
    if n == 0:
      return 1e9
    ys, xs = np.indices(H.shape)
    cy, cx = (H * ys).sum() / n, (H * xs).sum() / n
    return float((H * ((ys - cy) ** 2 + (xs - cx) ** 2)).sum() / n)

  def call(seed):
    # shift the radii per call: a real optimize() loop proposes NEW values
    # each probe, so the steady-state number must include the per-call
    # host recompiles + transfers (no value-level caching can hide them)
    return sweeper.evaluateBatched(
        [dict(R=r + 0.3 * seed) for r in radii], spotMetric,
        sceneFactory=lambda: holder['scene'],
        raysPerScene=raysPerScene, maxIntersections=6, bins=(64, 64),
        histBounds=(-40., 40., -40., 40.), seed=seed)

  t0 = time.perf_counter()
  metrics = call(0)
  coldS = time.perf_counter() - t0
  best = float(radii[int(np.argmin(metrics))])

  steady = float('inf')
  for seed in (1, 2):
    t1 = time.perf_counter()
    call(seed)
    steady = min(steady, time.perf_counter() - t1)
  rate = nVariants * raysPerScene / steady
  return rate, dict(coldS=round(coldS, 1), steadyS=round(steady, 2),
                    nVariants=nVariants, raysPerScene=raysPerScene,
                    bestRadius=best, coldOk=bool(coldS < 120.))


CRITERIA = [
    # (name, builder, target, unit-scale, unit-name)
    ('headline', sceneHeadline, 1.0e9, 1e9, 'G seg/s'),
    ('surface_source', sceneSurfaceSource, 0.5e9, 1e9, 'G seg/s'),
    ('diffuse_scatter', sceneDiffuseScatter, 0.3e9, 1e9, 'G seg/s'),
    ('conditioned_dirac', sceneConditionedDirac, 0.3e9, 1e9, 'G seg/s'),
    ('example2_prims', sceneExample2, 1.0e9, 1e9, 'G seg/s'),
    ('example2_doubled', sceneExample2Doubled, 0.7e9, 1e9, 'G seg/s'),
    ('mesh_fold', sceneMeshFold, 0.3e9, 1e9, 'G seg/s'),
    ('spectrometer', sceneSpectrometer, 0.3e9, 1e9, 'G seg/s'),
    ('mesh_dish_smem', sceneMeshDish, 0.1e9, 1e9, 'G seg/s'),
    ('mesh_dish_coherent', sceneMeshDishCollimated, 0.1e9, 1e9, 'G seg/s'),
    ('torus_mirror', sceneTorusMirror, 0.3e9, 1e9, 'G seg/s'),
    ('mesh_dish_1800', sceneMeshDish1800, 0.1e9, 1e9, 'G seg/s'),
    ('surf_wall', sceneSurfWall, 0.1e9, 1e9, 'G seg/s'),
    ('coupled_scatter', sceneCoupledScatter, 0.3e9, 1e9, 'G seg/s'),
]

# XLA-fallback classes: measured so every pallasIneligibleReason branch
# has a documented number (no pass/fail target — these ARE the slow path)
FALLBACKS = [
    ('xla_mesh_12k', sceneFallbackMesh12k),
    ('xla_surf_5k', sceneFallbackSurf5k),
    ('xla_surf_wall', sceneSurfWall),
    ('xla_coupled_scatter', sceneCoupledScatter),
    ('xla_mesh_dish_5k', sceneMeshDish5k),
]


def _warmUpRelay():
  '''The FIRST device->host fetch of a process pays the axon relay session
  warm-up (~2-4 min measured; CLAUDE.md) regardless of what is fetched.
  Pay it on a trivial matmul up front so each stage's cold number measures
  OUR compile/evaluate cost — a long-lived user process (the reference's
  workflow keeps one FreeCAD/Jupyter process alive) pays this once per
  session, not per sweep call. Full runs already amortized it through the
  first stage; this makes `--only <stage>` runs measure the same thing.'''
  import jax.numpy as jnp
  t0 = time.perf_counter()
  x = jnp.ones((128, 128), jnp.float32)
  _ = float((x @ x)[0, 0])
  print(f'relay warm-up {time.perf_counter() - t0:.0f}s', flush=True)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--json', default='/tmp/scene_throughput.json')
  ap.add_argument('--only', default=None,
                  help='comma-separated subset of scene names')
  args = ap.parse_args()
  only = set(args.only.split(',')) if args.only else None

  _warmUpRelay()
  results = {}
  for name, builder, target, scaleV, unit in CRITERIA:
    if only and name not in only:
      continue
    t0 = time.perf_counter()
    try:
      out = builder()
      scene, maxI, bounds = out[:3]
      stepKw = out[3] if len(out) > 3 else {}
      rate, meta = _measureHistScene(scene, maxI, bounds, **stepKw)
      ok = rate >= target
      results[name] = dict(rate=rate, target=target, ok=bool(ok), **meta)
      print(f'{name:18s} {rate/scaleV:8.3f} {unit}  target '
            f'{target/scaleV:.1f}  {"PASS" if ok else "MISS"}  '
            f'({time.perf_counter()-t0:.0f}s total)', flush=True)
    except Exception as e:
      results[name] = dict(error=str(e)[:300])
      print(f'{name:18s} FAILED: {str(e)[:160]}', flush=True)

  for name, builder in FALLBACKS:
    if only is None or name not in only:
      # fallback measurements run only when explicitly selected (they are
      # documentation numbers, not pass/fail criteria)
      continue
    t0 = time.perf_counter()
    try:
      scene, maxI, bounds = builder()
      rate, meta = _measureXlaScene(scene, maxI, bounds)
      results[name] = dict(rate=rate, target=None, ok=True, **meta)
      print(f'{name:18s} {rate/1e9:8.4f} G seg/s  (XLA fallback, '
            f'documented)  ({time.perf_counter()-t0:.0f}s total)',
            flush=True)
    except Exception as e:
      results[name] = dict(error=str(e)[:300])
      print(f'{name:18s} FAILED: {str(e)[:160]}', flush=True)

  if only is None or 'sweep_batched' in only:
    t0 = time.perf_counter()
    try:
      rate, meta = measureSweepBatched()
      ok = bool(meta['coldOk'] and rate >= 10e6)
      results['sweep_batched'] = dict(rate=rate, target=10e6, ok=ok, **meta)
      print(f'{"sweep_batched":18s} {rate/1e6:8.1f} M rays/s  target 10.0  '
            f'cold {meta["coldS"]:.0f}s (<120)  '
            f'{"PASS" if ok else "MISS"}  '
            f'({time.perf_counter()-t0:.0f}s total)', flush=True)
    except Exception as e:
      results['sweep_batched'] = dict(error=str(e)[:300])
      print(f'{"sweep_batched":18s} FAILED: {str(e)[:160]}', flush=True)

  if only is None or 'raw_step' in only:
    t0 = time.perf_counter()
    try:
      rate, meta = measureRawStep()
      ok = rate >= 20e6
      results['raw_step'] = dict(rate=rate, target=20e6, ok=bool(ok),
                                 **meta)
      print(f'{"raw_step":18s} {rate/1e6:8.1f} M rays/s  target 20.0  '
            f'{"PASS" if ok else "MISS"}  '
            f'({time.perf_counter()-t0:.0f}s total)', flush=True)
    except Exception as e:
      results['raw_step'] = dict(error=str(e)[:300])
      print(f'{"raw_step":18s} FAILED: {str(e)[:160]}', flush=True)

  with open(args.json, 'w') as f:
    json.dump(results, f, indent=1)
  print(f'wrote {args.json}', flush=True)


if __name__ == '__main__':
  main()
