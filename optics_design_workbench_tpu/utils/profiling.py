'''
Profiling and throughput observability.

The reference's observability is tracemalloc snapshots, ray-cache hit-rate
logs and rays/hour counters (SURVEY.md section 5; simulation_loop.py:43-60,
raytracing_cache.py:73-85, results_store.py:552-556). The device analog:
the JAX profiler for per-kernel timelines plus simple step-throughput
counters.
'''

import contextlib
import time

from . import io


@contextlib.contextmanager
def deviceTrace(logdir='/tmp/optics_tpu_profile'):
  '''Capture a JAX device profile (xplane) for everything inside the
  context; inspect with TensorBoard's profile plugin or the raw
  xplane.pb.'''
  import jax
  jax.profiler.start_trace(logdir)
  try:
    yield logdir
  finally:
    jax.profiler.stop_trace()
    io.info(f'device profile written to {logdir}')


class ThroughputMeter:
  '''Accumulates (rays, segments, hits) across steps and renders the
  reference-style performance description (results_store.py:552-556).'''

  def __init__(self):
    self.t0 = time.time()
    self.rays = 0
    self.segments = 0
    self.hits = 0

  def update(self, rays=0, segments=0, hits=0):
    self.rays += int(rays)
    self.segments += int(segments)
    self.hits += int(hits)

  def description(self):
    dt = max(time.time() - self.t0, 1e-9)
    return (f'{self.rays/dt*3600:.3g} rays/hour '
            f'({self.rays/dt/1e6:.2f} M rays/s), '
            f'{self.segments/dt/1e6:.2f} M segments/s, '
            f'{self.hits/dt*3600:.3g} recorded hits/hour')
