'''
optics_design_workbench_tpu — a TPU-native optics ray-tracing framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the FreeCAD
"Optics Design Workbench" (reference: zaphB/freecad.optics_design_workbench):
physically accurate forward ray tracing of CAD-defined optical assemblies with

  * point / surface / replay light sources whose ray directions and positions
    are sampled from arbitrary user-supplied symbolic power-density
    expressions (reference: distributions/random_number_generator.py),
  * mirror / lens / grating / absorber / vacuum-detector optical elements with
    Snell refraction + total internal reflection, specular and stochastic
    scattering, Ludwig-1970 grating diffraction and Beer-Lambert absorption
    (reference: freecad_elements/ray.py, optical_group.py),
  * deterministic ray-fan and Monte-Carlo simulation modes with the same
    on-disk results contract (`<name>.OpticsDesign/raw/simulation-run-N/...`)
    and the same Jupyter analysis/optimization workflow
    (reference: simulation/results_store.py, jupyter_utils/).

Unlike the reference — a per-ray Python loop calling FreeCAD's OpenCASCADE
C++ kernel — this framework compiles the scene to device arrays of analytic
surfaces, traces batches of millions of rays with a `jax.lax.scan` bounce
loop over vmapped closed-form intersection kernels, samples sources with
`jax.random` through pre-tabulated inverse-CDF tables, records hits with
on-device scatter-adds, and shards the ray axis across chips with
`jax.sharding`/`shard_map`.
'''

__version__ = '0.1.0'


def kernelSourceDigest():
  '''Short digest of the sources that shape compiled kernels. The
  persistent compilation cache is keyed by (module hash, flags) on jax's
  side, but edits to pallas/scan INTERNALS that keep shapes identical
  can still collide with stale entries compiled from older sources (and
  entries AOT-compiled on a different host machine trigger
  cpu_aot_loader SIGILL warnings) — so the cache directory itself is
  keyed by this digest and rolls over whenever kernel code changes.'''
  import hashlib
  import os
  base = os.path.dirname(__file__)
  h = hashlib.sha1()
  for rel in ('ops/pallas_trace.py', 'ops/beam_cull.py', 'ops/histogram.py',
              'tracing/batch_tracer.py', 'tracing/fused.py',
              'geometry/surfaces.py', 'geometry/intersect.py',
              'geometry/transforms.py',
              'distributions/device_sampler.py'):
    try:
      with open(os.path.join(base, rel), 'rb') as f:
        h.update(f.read())
    except OSError:
      pass
  return h.hexdigest()[:10]


def _enableCompilationCache():
  '''Default jax's persistent compilation cache on (reference analog: the
  workbench reuses one long-lived FreeCAD process so OCC state persists;
  here the expensive state is XLA binaries). On a remote-compile TPU link
  every compile costs seconds of RTT — the cache cuts a cold-start
  `runSimulation` from ~54 s to ~33 s and repeat scene compiles to ~0.
  Opt out with OPTICS_TPU_NO_COMPILE_CACHE=1 or by setting
  JAX_COMPILATION_CACHE_DIR yourself.'''
  import os
  if os.environ.get('OPTICS_TPU_NO_COMPILE_CACHE'):
    return
  if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
    return
  try:
    import jax
    if jax.config.jax_compilation_cache_dir:
      return
    root = os.path.join(os.path.expanduser('~'), '.cache',
                        'optics_design_workbench_tpu')
    cacheDir = os.path.join(root, f'jax_cache-{kernelSourceDigest()}')
    os.makedirs(cacheDir, exist_ok=True)
    # best-effort cleanup of caches from older kernel sources — but only
    # STALE ones (>1 day idle): a concurrently running process compiled
    # from a different working-tree state must not lose its live cache
    # dir mid-run (its writes would warn FileNotFoundError)
    import shutil
    import time
    for d in os.listdir(root):
      p = os.path.join(root, d)
      try:
        idle = time.time() - os.path.getmtime(p)
      except OSError:
        continue
      if d.startswith('jax_cache') and p != cacheDir and idle > 86400:
        shutil.rmtree(p, ignore_errors=True)
    jax.config.update('jax_compilation_cache_dir', cacheDir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
  except Exception:    # cache is an optimization; never block import
    pass


_enableCompilationCache()


def versionInfo():
  '''Return a dict describing the framework version (reference:
  freecad/optics_design_workbench/__init__.py:58).'''
  import jax
  return dict(version=__version__,
              jax=jax.__version__,
              backend=jax.default_backend())
