'''
Benchmark scenes and step builders (BASELINE.md configs): the headline
scene mirrors examples/2-lens-and-mirror — Gaussian point source ->
plano-convex lens -> 45deg fold mirror -> absorbing detector — so every ray
traces ~4 segments with refraction, reflection and medium tracking on the
path, plus the simpler examples/1 source->detector scene.
'''

import numpy as np
import jax

from .models import Scene, PointSource, OpticalGroup
from .geometry import surfaces as S
from .geometry import transforms as T
from .tracing import fused


def buildSourceDetectorScene(tmpdir=None):
  '''examples/1-source-and-detector analog.'''
  scene = Scene(label='bench1', path=tmpdir and f'{tmpdir}/bench1')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Detector',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(60., 60.))],
      placements=[T.translation(0, 0, 100)]))
  scene.addSource(PointSource(
      Label='Source', PowerDensity='exp(-theta^2/0.01)',
      ThetaDomain='0, pi/4', Wavelength=532.,
      ThetaResolutionNumericMode='2e4'))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=2)
  return scene


def buildLensMirrorScene(tmpdir=None):
  '''examples/2-lens-and-mirror analog: lens at z=50 focuses the beam, a
  45 deg fold mirror at z=150 bends it to +x, detector plane at x=100.'''
  scene = Scene(label='bench2', path=tmpdir and f'{tmpdir}/bench2')
  R, aperture, thickness = 60., 25., 6.
  sagMax = R - np.sqrt(R ** 2 - aperture ** 2)
  lens = OpticalGroup(
      OpticalType='Lens', Label='Lens', RefractiveIndex=1.5,
      surfaces=[
          S.sphere(T.translation(0, 0, R), elem=0, radius=R,
                   zRange=(-R, -R + sagMax + 1e-6), orient=+1),
          S.plane(T.translation(0, 0, thickness), elem=0, radius=aperture,
                  orient=+1),
          S.cylinder(T.translation(0, 0, thickness / 2), elem=0,
                     radius=aperture, zRange=(-thickness / 2, thickness / 2),
                     orient=+1),
      ],
      placements=[T.translation(0, 0, 50)])
  scene.addOpticalGroup(lens)
  mirror = OpticalGroup(
      OpticalType='Mirror', Label='FoldMirror', Reflectivity=0.98,
      surfaces=[S.plane(np.eye(4), elem=0, radius=40.)],
      placements=[T.compose(T.translation(0, 0, 150),
                            T.rotation((0, 1, 0), 45))])
  scene.addOpticalGroup(mirror)
  detector = OpticalGroup(
      OpticalType='Absorber', Label='Detector',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(60., 60.))],
      placements=[T.compose(T.translation(-100, 0, 150),
                            T.rotation((0, 1, 0), 90))])
  scene.addOpticalGroup(detector)
  scene.addSource(PointSource(
      Label='Source', PowerDensity='exp(-theta^2/0.02)',
      ThetaDomain='0, 0.35', Wavelength=532.,
      ThetaResolutionNumericMode='2e4'))
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=6)
  return scene


def buildSurfaceSourceScene(tmpdir=None):
  '''Lambertian-emitter benchmark: a cos(theta)^2 disc emitter radiating
  onto a detector plane past a fold mirror — the reference's surface-source
  use case (surface_source.py:269-555) on the fused device path.'''
  scene = Scene(label='bench_ss', path=tmpdir and f'{tmpdir}/bench_ss')
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='Emitter',
      surfaces=[S.plane(np.eye(4), elem=0, radius=20.)],
      placements=[T.translation(0, 0, 0)]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Mirror', Label='FoldMirror', Reflectivity=0.98,
      surfaces=[S.plane(np.eye(4), elem=0, radius=80.)],
      placements=[T.compose(T.translation(0, 0, 120),
                            T.rotation((0, 1, 0), 45))]))
  scene.addOpticalGroup(OpticalGroup(
      OpticalType='Absorber', Label='Detector',
      surfaces=[S.plane(np.eye(4), elem=0, halfExtents=(120., 120.))],
      placements=[T.compose(T.translation(-100, 0, 120),
                            T.rotation((0, 1, 0), 90))]))
  from .models.surface_source import SurfaceSource
  src = SurfaceSource(Label='Source', ActiveSurfaces=['Emitter'],
                      PowerDensity='cos(theta)**2')
  scene.addSource(src)
  scene.addSimulationSettings(RaysPerIteration=1e6, MaxIntersections=4)
  return scene


def makeBenchStep(scene=None, raysPerStep=1 << 20, maxIntersections=6,
                  mesh=None, bins=(256, 256), stratified=False,
                  usePallas='auto', histPrecision='default'):
  '''Compile the fused sample+trace+histogram step for a benchmark scene.
  Returns (step, histograms, meta). step: (key, hist) -> (hist, counters).
  With usePallas='auto' the single-chip path uses the fused Pallas kernel
  whenever the scene is eligible (ops/pallas_trace.py), else the XLA batch
  tracer.'''
  if scene is None:
    scene = buildLensMirrorScene()
  device, info = scene.compile()
  device['powerTol'] = 1e-6
  src = scene.lightSources()[0]
  gen = src.deviceGenerator()
  histSpec = fused.makeHistogramSpec(device, info,
                                     bounds=(-60., 60., -60., 60.),
                                     bins=bins)
  hist = fused.initHistograms(histSpec)
  settings = scene.activeSimulationSettings()
  kwargs = dict(raysPerStep=raysPerStep,
                maxIntersections=maxIntersections,
                maxRayLength=settings.maxRayLength(),
                distTol=max(settings.distanceTolerance(), 1e-4),
                stratified=stratified)
  backend = 'xla'
  if mesh is None:
    from .ops import pallas_trace
    if usePallas in ('auto', True) and pallas_trace.pallasEligible(device) \
        and raysPerStep % pallas_trace.TILE == 0 \
        and jax.default_backend() == 'tpu':
      colGen = (src.deviceColumnsGenerator()
                if hasattr(src, 'deviceColumnsGenerator') else gen)
      samplerSpec = (src.pallasSamplerSpec()
                     if hasattr(src, 'pallasSamplerSpec') else None)
      bound = (src.emissionBound()
               if hasattr(src, 'emissionBound') else None)
      step = pallas_trace.makePallasTraceStep(device, histSpec, colGen,
                                              histPrecision=histPrecision,
                                              sampler=samplerSpec,
                                              emissionBound=bound,
                                              **kwargs)
      backend = 'pallas'
    else:
      step = fused.makeFusedStep(device, gen, histSpec, **kwargs)
  else:
    from .ops import pallas_trace
    from .parallel import makeShardedFusedStep, makeShardedPallasStep
    perShard = raysPerStep // mesh.size
    if usePallas in ('auto', True) and pallas_trace.pallasEligible(device) \
        and perShard % pallas_trace.TILE == 0 \
        and jax.default_backend() == 'tpu':
      colGen = (src.deviceColumnsGenerator()
                if hasattr(src, 'deviceColumnsGenerator') else gen)
      samplerSpec = (src.pallasSamplerSpec()
                     if hasattr(src, 'pallasSamplerSpec') else None)
      step = makeShardedPallasStep(mesh, device, histSpec, colGen,
                                   sampler=samplerSpec, **kwargs)
      backend = 'pallas-sharded'
    else:
      step = makeShardedFusedStep(mesh, device, gen, histSpec, **kwargs)
  return step, hist, dict(scene=scene, device=device, info=info,
                          histSpec=histSpec, backend=backend)
