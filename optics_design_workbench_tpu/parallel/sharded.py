'''
Multi-chip fused Monte-Carlo step via `shard_map`: each chip samples its own
keyed stream, traces its shard of the ray batch against the replicated scene
and scatter-adds into a local histogram; histograms and counters ride a
single `psum` over ICI. This is the TPU-native replacement for the
reference's N worker processes + filesystem progress protocol
(simulation_loop.py:449-632; results_store.py:462-539).
'''

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..tracing.fused import traceHistogram


def makeShardedFusedStep(mesh, scene, generator, histSpec, raysPerStep,
                         maxIntersections, maxRayLength, distTol,
                         stratified=False, axisName='rays'):
  '''Build `(key, histograms) -> (histograms, counters)` where the ray axis
  is sharded over `mesh` and outputs are replicated (psum over ICI).
  `raysPerStep` is the GLOBAL batch size (must divide by mesh size).'''
  nShards = mesh.shape[axisName]
  if raysPerStep % nShards:
    raise ValueError(f'raysPerStep={raysPerStep} must be divisible by the '
                     f'mesh size {nShards}')
  perShard = raysPerStep // nShards

  def shardStep(key, histograms):
    # per-shard keyed stream (reference analog: per-worker random seeds,
    # simulation_loop.py:813-820)
    shardIdx = jax.lax.axis_index(axisName)
    key = jax.random.fold_in(key[0], shardIdx)
    batch = generator(key, perShard, stratified=stratified)
    # accumulate into a zero local histogram, psum the delta, then add to
    # the (replicated) running histograms — adding into the running copy on
    # every shard would multiply it by the shard count under psum
    local = jax.tree.map(jnp.zeros_like, histograms)
    delta, counters = traceHistogram(
        scene, histSpec, local,
        batch['origins'], batch['directions'], batch['powers'],
        batch['wavelengths'], maxIntersections=maxIntersections,
        maxRayLength=maxRayLength, distTol=distTol)
    delta = jax.tree.map(lambda h: jax.lax.psum(h, axisName), delta)
    counters = jax.tree.map(lambda c: jax.lax.psum(c, axisName), counters)
    hist = jax.tree.map(jnp.add, histograms, delta)
    return hist, counters

  sharded = shard_map(
      shardStep, mesh=mesh,
      in_specs=(P(axisName), P()),
      out_specs=(P(), P()),
      check_vma=False)

  @jax.jit
  def step(key, histograms):
    # distribute one key per shard
    keys = jax.random.split(key, nShards)
    return sharded(keys, histograms)

  return step


def makeShardedPallasStep(mesh, scene, histSpec, columnsGenerator,
                          raysPerStep, maxIntersections, maxRayLength,
                          distTol, sampler=None, stratified=False,
                          axisName='rays', interpret=False):
  '''Multi-chip variant of the fused PALLAS step: every chip runs the
  Mosaic kernel on its shard (with its own in-kernel PRNG stream via the
  shard-folded seed) and the histograms/counters ride one psum over ICI —
  per-chip throughput matches the single-chip kernel instead of the XLA
  fallback. TPU backend only in production; interpret=True runs the kernel
  through the Mosaic interpreter so the CPU test mesh can execute the full
  composition (tests/test_parallel.py exercises it bit-exactly).'''
  from ..ops import pallas_trace
  nShards = mesh.shape[axisName]
  if raysPerStep % nShards:
    raise ValueError(f'raysPerStep={raysPerStep} must be divisible by the '
                     f'mesh size {nShards}')
  perShard = raysPerStep // nShards
  inner = pallas_trace.makePallasTraceStep(
      scene, histSpec, columnsGenerator, raysPerStep=perShard,
      maxIntersections=maxIntersections, maxRayLength=maxRayLength,
      distTol=distTol, sampler=sampler, stratified=stratified,
      jitWrap=False, interpret=interpret)

  def shardStep(key, histograms):
    shardIdx = jax.lax.axis_index(axisName)
    key = jax.random.fold_in(key[0], shardIdx)
    local = jax.tree.map(jnp.zeros_like, histograms)
    delta, counters = inner(key, local)
    delta = jax.tree.map(lambda h: jax.lax.psum(h, axisName), delta)
    counters = jax.tree.map(lambda c: jax.lax.psum(c, axisName), counters)
    hist = jax.tree.map(jnp.add, histograms, delta)
    return hist, counters

  sharded = shard_map(
      shardStep, mesh=mesh,
      in_specs=(P(axisName), P()),
      out_specs=(P(), P()),
      check_vma=False)

  @jax.jit
  def step(key, histograms):
    keys = jax.random.split(key, nShards)
    return sharded(keys, histograms)

  return step


def makeShardedPallasRawStep(mesh, scene, histSpec, columnsGenerator,
                             raysPerStep, maxIntersections, maxRayLength,
                             distTol, sampler=None, axisName='rays',
                             interpret=False):
  '''Multi-chip variant of the RAW per-hit kernel step
  (ops/pallas_trace.makePallasRawStep): every chip traces its shard and
  keeps its hit-slot records device-resident and SHARDED on the ray axis
  (no gather over ICI — the host fetch at record-compaction time is the
  only consolidation, like the reference's per-worker result files,
  results_store.py:348-460); scalar counters psum over ICI.'''
  from ..ops import pallas_trace
  nShards = mesh.shape[axisName]
  if raysPerStep % nShards:
    raise ValueError(f'raysPerStep={raysPerStep} must be divisible by the '
                     f'mesh size {nShards}')
  inner = pallas_trace.makePallasRawStep(
      scene, histSpec, columnsGenerator, raysPerStep=raysPerStep // nShards,
      maxIntersections=maxIntersections, maxRayLength=maxRayLength,
      distTol=distTol, sampler=sampler, interpret=interpret)

  def shardStep(key):
    shardIdx = jax.lax.axis_index(axisName)
    records, counters = inner(jax.random.fold_in(key[0], shardIdx))
    counters = jax.tree.map(lambda c: jax.lax.psum(c, axisName), counters)
    return records, counters

  recSpecs = dict(
      recordHit=P(None, axisName), hitElem=P(None, axisName),
      power=P(None, axisName), isEntering=P(None, axisName),
      point=P(None, axisName, None), direction=P(None, axisName, None))
  sharded = shard_map(shardStep, mesh=mesh, in_specs=(P(axisName),),
                      out_specs=(recSpecs, P()), check_vma=False)

  @jax.jit
  def step(key):
    return sharded(jax.random.split(key, nShards))

  return step
