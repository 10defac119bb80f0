'''
Pallas fused trace kernel: the whole bounce loop for a tile of rays runs in
ONE kernel with ray state resident in VMEM — HBM sees each ray once on the
way in and a (binIndex, weight) pair on the way out, instead of ~60 (N,)
arrays per bounce crossing HBM between XLA fusions.

Scope (the common fast case; the XLA batch tracer remains the general
fallback): analytic surfaces plane/sphere/cylinder/asphere/cone, element
types Mirror/Lens/Grating/Absorber/Vacuum with constant or dispersive (n(lambda)
fitted as a per-element polynomial, evaluated once per ray) refractive
index, sequential mode / per-source masks as compile-time constants, and
stochastic scatter for theta-only lobes without discrete Dirac events
(collapsed to pwpoly constants + the on-core PRNG; ~100x the XLA
gather-based path on diffuser scenes: 1317 vs 9-18 M seg/s). Each ray
records its detector passes into a hit-slot ring (reference records every
pass, ray.py:276-277); the per-ray bin index + power are accumulated into the
histogram by the MXU one-hot matmul (ops/histogram.py) when the histogram
shape allows, else by one XLA scatter per step.

Scene data arrives as one packed f32 row per surface / element (see
geometry/surfaces.py PACKED_* and tracing/element_table.py EP_*), unrolled
as compile-time constants over the (static, small) surface count.
'''

from functools import partial
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import surfaces as GS
from ..tracing.tracer import MIRROR, LENS, GRATING, ABSORBER, VACUUM
from . import histogram

TILE = 8192
_BIG = 3.0e38

# bounce-loop early-exit mechanism: 'while' (default) | 'cond' | 'none'.
# 'while' rolls deep bounce budgets into a lax.while_loop that stops once
# every ray in the tile is dead — measured free when the tile tail is
# non-empty and a large win for budget >> real bounce depth (the
# reference's default MaxIntersections is 100); small python-unrolled
# scenes keep the plain unroll. 'cond' additionally guards each unrolled
# bounce with lax.cond — measured a ~30% LOSS on v5e (Mosaic keeps both
# branch results live: the carry copies cost more than the skipped
# bounces save, and the doubled VMEM stack halves the tile) — kept for
# experiments only. Overridable via ODW_TPU_EARLY_EXIT.
EARLY_EXIT = os.environ.get('ODW_TPU_EARLY_EXIT', 'while')

# SMEM mesh sweep: triangles per Morton-ordered chunk for the scalar-core
# broad-phase cull (see _bounceBody). Chunks only engage past one chunk's
# worth of triangles. 32 beats 64/128 on the 1800-tri dish (0.133 / 0.099
# / 0.064 G seg/s, reproducible to 3 digits across reps — finer chunks
# cull tighter and the ~30-op prepass per chunk stays cheap); overridable
# for A/B probes via ODW_TPU_TRI_CHUNK.
_TRI_CHUNK = int(os.environ.get('ODW_TPU_TRI_CHUNK', '32'))

# SMEM triangle-table capacity (rows of 11 f32 scalars). The v5e remote
# compiler CRASHES (tpu_compile_helper exit 1) once one SMEM table passes
# ~21k f32 scalars — measured round 5 by bisection: 1922x11 rows compile
# and trace, 2048x11 crash at ANY chunking (16/32/64-row chunks alike),
# 5000x11 likewise. 1890 rows = 20790 scalars keeps a safety margin;
# larger meshes take the chunked XLA fallback (slow but correct,
# documented in docs/performance.md). Overridable for capacity probes via
# ODW_TPU_SMEM_TRI_LIMIT.
SMEM_TRI_LIMIT = int(os.environ.get('ODW_TPU_SMEM_TRI_LIMIT', '1890'))

# SMEM analytic-surface-table capacity (rows of 21 f32 scalars; round-4
# verdict #5 — assemblies past the 256-surface immediates budget). Bounded
# by the same ~21k-scalar per-table compiler budget as the triangle table
# (940 x 21 = 19740, incl. chunk-padding headroom).
SMEM_SURF_LIMIT = int(os.environ.get('ODW_TPU_SMEM_SURF_LIMIT', '940'))

# SMEM analytic-surface sweep: rows per Morton chunk for the per-ray
# broad-phase cull (_chunkSurfRows — the triangle-chunk mechanism applied
# to the scalar surface table; chunked runs are padded to this stride).
# Smaller chunks cull tighter (the survivor sweep costs ~55 vector ops per
# ROW, the prepass ~30 per CHUNK); overridable for A/B probes.
_SURF_CHUNK = int(os.environ.get('ODW_TPU_SURF_CHUNK', '16'))

# Winner-attribute pass after the argmin sweep: 'accum' gathers the winning
# surface's transform/orient/normal-params as columns via one cheap select
# per constant per surface, then runs the local transform + per-KIND normal
# + transpose rotation ONCE per bounce; 'persurf' recomputes
# transform+normal+rotation for every surface and masks the result (the
# round-3 form, ~2-3x more VPU ops per surface on multi-surface scenes).
# Overridable for A/B runs via ODW_TPU_ATTR_PASS.
ATTR_PASS = os.environ.get('ODW_TPU_ATTR_PASS', 'accum')

# Transform-group hoisting in the bounce sweep: rotate the ray into each
# signed-permutation group frame once per bounce and derive member surfaces'
# local frames with free sign/axis picks (_assignXformGroups /
# geometry/transforms.snapSignedPermGroups). Bit-identical to the
# per-surface 9-FMA rotation; ~25 fewer VPU ops per grouped surface —
# example 2's 26 surfaces collapse to 7 group rotations. Overridable for
# A/B runs via ODW_TPU_XFORM_GROUPS=0.
XFORM_GROUPS = os.environ.get('ODW_TPU_XFORM_GROUPS', '1') != '0'

# Per-bounce candidate culling (ops/beam_cull): propagate the source's
# emission envelope through mirror/lens interactions as conservative
# (origin-sphere, direction-cone, medium) beams and sweep each unrolled
# bounce over its reachable surface set only; the rolled tail sweeps the
# union of the remaining bounces' sets (absorber-terminated propagation can
# make that union much smaller than the scene). Strictly conservative —
# interpret-mode CI pins culled kernels bin-identical to the uncalled XLA
# tracer. Overridable for A/B runs via ODW_TPU_BEAM_CULL=0.
BEAM_CULL = os.environ.get('ODW_TPU_BEAM_CULL', '1') != '0'

# Mosaic op budget for the python-unrolled bounce prefix, in units of
# (surfaces x unrolled bounces): compile time scales with the unrolled op
# count (CLAUDE.md), throughput gains ~1.5x per bounce moved off the rolled
# tail. 140 covers K = nElements+1 = 5 for example 2's 26 surfaces
# (interleaved A/B on v5e: 0.981 vs 0.966 G seg/s at 80, compile
# 12.8 vs 12.2 s; tiles 2048/auto tie, 8192 loses ~17%). Overridable for
# A/B runs via ODW_TPU_UNROLL_BUDGET.
UNROLL_BUDGET = int(os.environ.get('ODW_TPU_UNROLL_BUDGET', '140'))


def pallasEligible(scene):
  '''Static host-side check whether the fast kernel supports this scene.'''
  return pallasIneligibleReason(scene) is None


def pallasIneligibleReason(scene):
  '''None when the fast kernel supports this scene, else a short
  human-readable reason (surfaced by the runner so users know why a run
  took the slower XLA fused path and which knob would fix it).'''
  try:
    kinds = set(np.asarray(scene['surfaces']['kind']).tolist())
    opts = set(np.asarray(scene['elements']['optType']).tolist())
  except Exception:
    return 'scene arrays are not host-inspectable (traced/abstract)'
  if 'scatter' in scene:
    # in-kernel scatter covers phi-separable lobes — incidence-independent
    # or theta_in-conditioned — plus smooth DiracDelta event mixtures AND
    # theta|phi-coupled lobes via the low-rank separable expansion
    # (tracing/batch_tracer.scatterConstants,
    # device_sampler.fitLowRankTheta); fits that miss tolerance keep the
    # XLA gather path
    from ..tracing.batch_tracer import scatterConstants
    if scatterConstants(scene) is None:
      return ('scatter PDFs miss the in-kernel fit tolerance '
              '(phi-separable lobes and low-rank theta|phi couplings run '
              'in the kernel)')
  if 'nTable' in scene['elements'] and not dispersionFitsInKernel(scene):
    return ('dispersive n(wavelength) tables do not fit the in-kernel '
            'polynomial model')
  kindArr = np.asarray(scene['surfaces']['kind'])
  nTri = int((kindArr == GS.TRIANGLE).sum())
  if nTri > SMEM_TRI_LIMIT:
    return (f'{nTri} mesh triangles > the {SMEM_TRI_LIMIT} the kernel '
            f'holds in SMEM (bigger tessellations stay on the XLA path)')
  if nTri > 128:
    # the SMEM mesh sweep has no per-surface compile-time gates, so
    # sequential-mode stages and per-source surface masks keep such
    # scenes on the immediates (<=128 tris) or XLA paths
    if 'seqMask' in scene:
      return (f'{nTri} mesh triangles with sequential mode: stage gates '
              f'are per-surface immediates (<=128 tris)')
    if 'surfMask' in scene:
      triMask = np.asarray(scene['surfMask']).astype(bool)[
          kindArr == GS.TRIANGLE]
      if not triMask.all():
        return (f'{nTri} mesh triangles with a per-source ignore mask on '
                f'mesh surfaces (<=128 tris for masked meshes)')
  nOther = numSurfacesStatic(scene) - nTri
  if nOther > 256:
    # past the immediates budget, simple-kind window-trimmed surfaces ride
    # the SMEM surface table (round-4 verdict #5); complex rows (bitmap
    # trims, hole prims, aspheres, tori) must stay immediates
    trims0 = np.asarray(scene['surfaces']['trim'])[:, 0]
    simple = (np.isin(kindArr, _SMEM_SURF_KINDS)
              & np.isin(trims0, (0., 1.)))
    nSimple = int(simple.sum())
    nComplex = nOther - nSimple
    if nComplex > 256:
      return (f'{nComplex} analytic surfaces with bitmap/prim trims or '
              f'iterative kinds > the 256-surface immediates budget '
              f'(simple window-trimmed surfaces ride the SMEM table)')
    if nSimple > SMEM_SURF_LIMIT:
      return (f'{nSimple} SMEM-table surfaces > the {SMEM_SURF_LIMIT} '
              f'the kernel holds in scalar memory')
    if 'seqMask' in scene or 'surfMask' in scene:
      return (f'{nOther} analytic surfaces with sequential mode or a '
              f'per-source ignore mask: stage/mask gates are per-surface '
              f'immediates (<=256 surfaces for masked scenes)')
  return None


def numSurfacesStatic(scene):
  return int(scene['surfaces']['kind'].shape[0])


def _shouldUnroll(scene, maxIntersections, nElements=None):
  '''Bounce-loop build policy: how many leading bounces to PYTHON-UNROLL.
  Returns an int K: bounces [0, K) are unrolled (best static scheduling —
  the rolled loop costs ~1.5x per bounce on v5e), bounces [K, maxI) run in
  the early-exit tail loop (lax.while_loop in 'while' mode), which costs
  nothing once every ray in the tile is dead.

  K targets the scene's REAL interaction depth: a ray interacts with each
  element at most ~once on the productive path (lens entry+exit counts 2
  via its multiple surfaces but a single extra bounce covers it), so
  K = nElements + 1 unrolls the whole typical trace and leaves only the
  stragglers (TIR loops, multi-pass cavities, over-budget) to the rolled
  tail. Capped by the Mosaic op-count budget (rows x surfaces x unrolled
  bounces — a 26-surface 8-bounce unroll took >15 min to compile).

  'none'/'cond' modes keep the round-2 semantics: full unroll for small
  scenes, fully rolled otherwise.'''
  nSurf = numSurfacesStatic(scene)
  if EARLY_EXIT == 'while':
    if nElements is None:
      nElements = int(scene['elements']['optType'].shape[0])
    K = min(maxIntersections, nElements + 1)
    # clamp to the op budget instead of falling all the way to 0: even a
    # partial unroll covers the leading (densest) bounces at the cheap
    # static schedule and leaves the tail to the rolled loop (example 2:
    # K 0 -> 3 measured +3.4% on v5e for +7 s compile)
    return min(K, max(UNROLL_BUDGET // max(nSurf, 1), 0))
  return maxIntersections if nSurf * maxIntersections <= UNROLL_BUDGET else 0


def _boundingSphere(row):
  '''Conservative world-frame bounding sphere (center, radius) of one
  surfRows entry, or None when the surface is unbounded (infinite trims)
  or carries boolean-ADD prims that extend past the base window — such
  surfaces are never culled.'''
  for hole in row.get('holePrims', ()):
    flag = float(hole[0])
    if flag > 0.5 and 5.5 < (flag - 20. if flag > 15.5 else flag) < 15.5:
      return None                 # ADD prim: area beyond the base window
  kind = row['kind']
  if row.get('trim0') == 2.:
    # bitmap trim: trim[1:5] is the (u0, v0, 1/du, 1/dv) UV chart, not a
    # window — no cheap bound, never cull
    return None
  t1, t2 = row['_rawTrim']        # UNclamped (trim2 may be +inf)
  c = np.zeros(3)
  if kind == GS.PLANE:
    if row['trim0'] in (1., 4.):
      rho = float(np.hypot(t1, t2))
    else:
      rho = t2
  elif kind == GS.SPHERE:
    rho = row['p0']
  elif kind == GS.CYLINDER:
    if not (np.isfinite(t1) and np.isfinite(t2)):
      return None
    c[2] = (t1 + t2) / 2.
    rho = float(np.hypot(row['p0'], (t2 - t1) / 2.))
  elif kind == GS.CONE:
    if not (np.isfinite(t1) and np.isfinite(t2)):
      return None
    c[2] = (t1 + t2) / 2.
    rMax = max(abs(row['p0'] + t1 * row['p1']),
               abs(row['p0'] + t2 * row['p1']))
    rho = float(np.hypot(rMax, (t2 - t1) / 2.))
  elif kind == GS.ASPHERE:
    if not np.isfinite(t2):
      return None
    c0, kk = row['p0'], row['p1']
    r2 = t2 * t2
    root = np.sqrt(max(1. - (1. + kk) * c0 * c0 * r2, 1e-12))
    sag = c0 * r2 / (1. + root) + r2 * r2 * (
        row['p2'] + r2 * (row['p3'] + r2 * row['p4']))
    rho = float(t2 + abs(sag))
  elif kind == GS.QUADRIC:
    if not (np.isfinite(t1) and np.isfinite(t2)):
      return None
    qa, qb = row['p0'], row['p1']
    if qa <= 0 or qb <= 0:
      return None
    # w(z) = -(p2 z^2 + p3 z + p4) is quadratic: its max over [t1, t2] is
    # at an endpoint or the interior vertex — exact, unlike sampling
    zs = [t1, t2]
    if abs(row['p2']) > 0:
      zv = -row['p3'] / (2. * row['p2'])
      if t1 < zv < t2:
        zs.append(zv)
    w = [-(row['p2'] * z * z + row['p3'] * z + row['p4']) for z in zs]
    rMax = float(np.sqrt(max(max(w), 0.) / min(qa, qb)))
    c[2] = (t1 + t2) / 2.
    rho = float(np.hypot(rMax, (t2 - t1) / 2.))
  elif kind == GS.TORUS:
    rho = row['p0'] + row['p1']
  elif kind == GS.TRIANGLE:
    v0 = np.array([row['p0'], row['p1'], row['p2']])
    v1 = np.array([row['p3'], row['p4'], row['p5']])
    v2 = np.array([row['p6'], row['p7'], row['p8']])
    c = (v0 + v1 + v2) / 3.
    rho = float(max(np.linalg.norm(v0 - c), np.linalg.norm(v1 - c),
                    np.linalg.norm(v2 - c)))
  else:
    return None
  if not np.isfinite(rho):
    return None
  if row.get('ident'):
    cw = c
  else:
    R = np.array([[row['r00'], row['r01'], row['r02']],
                  [row['r10'], row['r11'], row['r12']],
                  [row['r20'], row['r21'], row['r22']]])
    tv = np.array([row['t0'], row['t1'], row['t2']])
    # w2l: local = R world + t  ->  world of local point c = R^T (c - t)
    cw = R.T @ (c - tv)
  return cw, rho


def _firstBounceSurfs(surfRows, bound):
  '''Indices (into surfRows) of surfaces REACHABLE at bounce 0 from the
  source's emission envelope (origin sphere + direction cone,
  models/point_source.emissionBound): a surface whose bounding sphere lies
  entirely outside the fattened cone cannot be the first hit of any ray,
  so the first unrolled bounce skips its intersection test. Strictly
  conservative — unbounded or ADD-prim surfaces always stay in.'''
  o, axis, cosA, rO = bound
  o = np.asarray(o, float)
  axis = np.asarray(axis, float)
  axis = axis / max(np.linalg.norm(axis), 1e-30)
  alpha = float(np.arccos(np.clip(cosA, -1., 1.)))
  keep = []
  for s, row in enumerate(surfRows):
    bs = _boundingSphere(row)
    if bs is None:
      keep.append(s)
      continue
    cw, rho = bs
    rho = rho + rO
    d = cw - o
    dist = float(np.linalg.norm(d))
    if dist <= rho:
      keep.append(s)
      continue
    beta = float(np.arccos(np.clip(float(d @ axis) / dist, -1., 1.)))
    if beta <= alpha + np.arcsin(min(rho / dist, 1.)) + 1e-6:
      keep.append(s)
  return keep


def _makeKernel(surfRows, elemRows, elemToDet, bounds, bins,
                maxIntersections, maxRayLength, distTol, powerTol,
                histRows=None, hitSlots=1, surfAllowed=None, seqSpec=None,
                sampler=None, scatterConsts=None, nUniformInputs=0,
                nMasks=0, rawRecords=False, unrollBounces=0, nTriSMEM=0,
                nTriChunks=0, nSurfSMEM=0, surfRuns=(), nSurfChunks=0,
                surfChunkRuns=(), firstSurfs=None,
                bounceSets=None, tailSurfs=None, sweepSpec=None):
  '''Build the kernel body with the scene baked in as python constants.
  surfRows: list of per-surface dicts of floats; elemRows likewise.
  histRows: if set (= D*H), the kernel accumulates the (histRows, 2*W)
  histogram in VMEM via in-kernel one-hot matmuls (power channel in columns
  [0, W), counts in [W, 2W)) and outputs (hist, segs) instead of per-ray
  (bin, w, c, segs) — the one-hots never touch HBM, which is what makes
  this ~1.5x faster end-to-end than the XLA-side matmul and ~5x faster
  than the scatter it replaced.
  hitSlots: per-ray ring of recorded hits so every pass over a recording
  element is kept (the reference records on EVERY pass, ray.py:276-277;
  one slot would keep only the last). hitSlots >= the max number of
  recording passes per ray makes the fast path physics-exact; an
  `ovf` output counts recording passes dropped past the last slot so
  under-recording is always detectable (counters['hitOverflow']).
  surfAllowed: optional list of surface indices the per-source mask admits
  (reference: find.py:79-104) — disallowed surfaces emit no code at all.
  seqSpec: optional (nStages, {surface: allowed-stage tuple}) sequential
  mode constants. The kernel then tracks the PER-RAY sequence index
  exactly like the XLA path (batch_tracer.bounceBatch seqInc: the index
  does NOT advance on lens / transmission-grating entry), so sequential
  scenes containing lenses stay bit-identical to the reference semantics
  instead of desyncing on a bounce-counted mask.
  sampler: optional point-source sampling spec (PointSource
  .pallasSamplerSpec()) baked as python constants. When set, the kernel
  takes ONLY a seed (SMEM) input and draws its rays with the on-core PRNG
  + an inverse-CDF tent interpolation — the 8 (N,) ray columns never
  exist in HBM and the XLA-side sampling slice (~0.9 ms/step at 1M rays)
  disappears.
  nUniformInputs: testing seam — when > 0, the kernel consumes that many
  uniform (rows, 128) VMEM inputs instead of the on-core PRNG (which the
  Mosaic interpreter stubs to zeros), making the stochastic paths exactly
  reproducible in interpret-mode CI tests.'''
  H, W = bins
  S = len(surfRows)
  # range test applied ONCE to the selected minimum instead of clamping
  # every candidate in the sweep (see _bounceBody); kept strictly below
  # the miss marker so `tBest <= mrlEff` is false for _BIG even with an
  # infinite maxRayLength
  mrlEff = min(float(maxRayLength), 0.5 * _BIG)

  hasGrating = any(er['optF'] == float(GRATING) for er in elemRows)

  def _marginal(spec, u):
    '''Inverse-CDF transform of uniform u with the marginal baked as python
    constants. affine -> one FMA. pwpoly -> piecewise Horner polynomials
    (few segments x deg<=9: ~35 VPU ops, ~0.1 ms per 1e6 rays, fitted to
    <5e-3 relative error — tighter than the XLA path's own 257-knot tent).
    table -> K-knot tent interpolation fallback (K FMA passes — accurate
    but ~6x the pwpoly cost).'''
    kind = spec[0]
    if kind == 'affine':
      _, lo, hi = spec
      return lo + u * (hi - lo)
    if kind == 'pwpoly':
      _, segs, clampLo, clampHi = spec
      out = None
      for a, _b, mid, half, coeffs in segs:   # ascending segments
        s = (u - float(mid)) * float(1.0 / half)
        acc = jnp.full_like(u, float(coeffs[-1]))
        for c in reversed(coeffs[:-1]):
          acc = acc * s + float(c)
        out = acc if out is None else jnp.where(u >= float(a), acc, out)
      return jnp.clip(out, float(clampLo), float(clampHi))
    _, table = spec
    K = len(table)
    pos = u * float(K - 1)
    acc = jnp.zeros_like(u)
    for qi, val in enumerate(table):
      acc = acc + jnp.maximum(0., 1. - jnp.abs(pos - float(qi))) \
          * float(val)
    return acc

  # uniform draws: on-core PRNG by default; with nUniformInputs > 0 each
  # draw instead reads the next uniform input ref (deterministic testing
  # seam — draw ORDER is part of the kernel contract: sampler first/phi,
  # then lobe u1,u2, then modify u3,u4)
  _uniformRefs = []
  _uniformCtr = [0]

  def _uniform(shape):
    '''f32 uniform in [0, 1); PRNG path: the 23-high-bit int32 convert is
    the Mosaic-supported path.'''
    if nUniformInputs:
      ref = _uniformRefs[_uniformCtr[0]]
      _uniformCtr[0] += 1
      return ref[:]
    bits = pltpu.prng_random_bits(shape)
    i = (pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(9)) \
        .astype(jnp.int32)
    return i.astype(jnp.float32) * (1.0 / (1 << 23))

  def _rotK(vx, vy, vz, ax, ay, az, ang):
    '''Rodrigues rotation of column vectors v about unit axes a (the
    kernel twin of batch_tracer._rot3).'''
    c, s = jnp.cos(ang), jnp.sin(ang)
    cx = ay * vz - az * vy
    cy = az * vx - ax * vz
    cz = ax * vy - ay * vx
    dot = ax * vx + ay * vy + az * vz
    return (vx * c + cx * s + ax * dot * (1 - c),
            vy * c + cy * s + ay * dot * (1 - c),
            vz * c + cz * s + az * dot * (1 - c))

  def _sampleRays(shape):
    '''Draw the tile's rays with the on-core PRNG (seeded by the caller,
    per-tile stream via program_id) through the baked inverse-CDF
    marginals, then apply the source placement as python-constant FMAs
    (the in-kernel analog of point_source.deviceColumnsGenerator /
    surface_source.deviceColumnsGenerator). The 'surface' type shares the
    exact column maths with the XLA device generator
    (models/surface_source._surfaceSampleColumns), so the two sampling
    paths cannot drift apart. Draw order (uniform-seam contract):
    point = (first, phi); surface = (face, u, v, theta, phi).

    tileStrata (G1, G2) in the sampler spec stratifies the two point-source
    quantiles BY TILE: tile (i1, i2) of the G1 x G2 grid draws its first
    variable from quantile stratum [i1/G1, (i1+1)/G1) and phi from
    [i2/G2, (i2+1)/G2). Unbiased (equal-probability strata, one tile each),
    variance-REDUCING (a per-step latin decomposition, the device analog of
    the reference's drawPseudo bin-evening, random_number_generator.py:
    562-682) — and it makes each tile's rays a narrow (theta, phi) wedge,
    which is what lets the per-ray chunk cull skip most of a big mesh for
    Monte-Carlo sources (round-4 verdict #2).'''
    if sampler.get('type') == 'surface':
      from ..models.surface_source import _surfaceSampleColumns
      uF = _uniform(shape)
      u = _uniform(shape)
      v = _uniform(shape)
      theta = _marginal(sampler['theta'], _uniform(shape))
      phi = _uniform(shape) * (2. * np.pi)
      cols = _surfaceSampleColumns(sampler['faces'], uF, u, v, theta, phi,
                                   sampler['wavelength'])
      return (cols['ox'], cols['oy'], cols['oz'],
              cols['dx'], cols['dy'], cols['dz'], cols['pw'], cols['wl'])
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    strata = sampler.get('tileStrata')
    if strata:
      G1, G2 = strata
      pid = _sweepCell['localPid'] if sweepSpec is not None \
          else pl.program_id(0)
      i1 = (pid // G2).astype(jnp.float32)
      i2 = (pid % G2).astype(jnp.float32)
      u1 = (i1 + u1) * float(1.0 / G1)
      u2 = (i2 + u2) * float(1.0 / G2)
    t = _marginal(sampler['first'], u1)
    p = _marginal(sampler['phi'], u2)
    sp, cp = jnp.sin(p), jnp.cos(p)
    if sampler['finite']:
      f = float(sampler['f'])
      st, ct = jnp.sin(t), jnp.cos(t)
      ldx, ldy, ldz = st * sp, -st * cp, ct
      lox, loy, loz = -f * ldx, -f * ldy, f * (1. - ldz)
    else:
      ldx = jnp.zeros(shape)
      ldy = jnp.zeros(shape)
      ldz = jnp.ones(shape)
      lox, loy, loz = t * cp, -t * sp, jnp.zeros(shape)
    if sweepSpec is not None and sweepSpec.get('geom'):
      # geom-mode sweep: placement + wavelength are per-VARIANT scalar
      # reads (same values the 'full' path would bake as constants)
      g, v = _sweepCell['geomRef'], _sweepCell['vI']
      R = [[g[v, 0], g[v, 1], g[v, 2]],
           [g[v, 3], g[v, 4], g[v, 5]],
           [g[v, 6], g[v, 7], g[v, 8]]]
      off = (g[v, 9], g[v, 10], g[v, 11])
      wl = jnp.zeros(shape) + g[v, 12]
    else:
      R, off = sampler['R'], sampler['off']
      wl = jnp.full(shape, float(sampler['wavelength']))
    ox = R[0][0] * lox + R[0][1] * loy + R[0][2] * loz + off[0]
    oy = R[1][0] * lox + R[1][1] * loy + R[1][2] * loz + off[1]
    oz = R[2][0] * lox + R[2][1] * loy + R[2][2] * loz + off[2]
    dx = R[0][0] * ldx + R[0][1] * ldy + R[0][2] * ldz
    dy = R[1][0] * ldx + R[1][1] * ldy + R[1][2] * ldz
    dz = R[2][0] * ldx + R[2][1] * ldy + R[2][2] * ldz
    pw = jnp.ones(shape)
    return ox, oy, oz, dx, dy, dz, pw, wl

  needSeed = (sampler is not None or scatterConsts) and not nUniformInputs

  # batched-sweep mode (makePallasSweepStep): the grid is VARIANT-MAJOR
  # (V * tilesPerVariant steps); each step derives its variant id and
  # within-variant tile id, offsets the SMEM surface-row reads and the
  # histogram rows by the variant, and seeds/stratifies by the LOCAL tile
  # id — so every variant traces the IDENTICAL ray set (common random
  # numbers: metric differences between variants are pure geometry).
  _sweepCell = {'vI': None, 'localPid': None, 'rowOff': None, 'vF': None}

  def kernel(*refs):
    _uniformCtr[0] = 0
    _uniformRefs.clear()
    if sweepSpec is not None:
      pid = pl.program_id(0)
      tPV = sweepSpec['tilesPerVariant']
      _sweepCell['vI'] = pid // tPV
      _sweepCell['localPid'] = pid % tPV
      _sweepCell['rowOff'] = _sweepCell['vI'] * sweepSpec['rowsPerVariant']
      _sweepCell['vF'] = _sweepCell['vI'].astype(jnp.float32)
    i0 = 0 if sampler is not None else 8
    if sampler is None:
      (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, pw_ref,
       wl_ref) = refs[:8]
    if nUniformInputs:
      _uniformRefs.extend(refs[i0:i0 + nUniformInputs])
      rest = refs[i0 + nUniformInputs:]
    elif needSeed:
      seed_ref, rest = refs[i0], refs[i0 + 1:]
    else:
      rest = refs[i0:]
    maskVals = tuple(rest[k][:] for k in range(nMasks))
    triRef = rest[nMasks] if nTriSMEM else None   # (nTri, 11) SMEM scalars
    chunkRef = rest[nMasks + 1] if nTriChunks > 1 else None
    nIn = nMasks + (1 if nTriSMEM else 0) + (1 if nTriChunks > 1 else 0)
    surfRef = rest[nIn] if nSurfSMEM else None    # (nRows, 21) SMEM scalars
    nIn += 1 if nSurfSMEM else 0
    surfChunkRef = rest[nIn] if nSurfChunks else None  # (nCh, 6) AABBs
    nIn += 1 if nSurfChunks else 0
    if sweepSpec is not None and sweepSpec.get('geom'):
      # per-variant source geometry rows [R(9), off(3), wl] (SMEM): the
      # sampler reads THIS variant's placement instead of python constants
      _sweepCell['geomRef'] = rest[nIn]
      nIn += 1
    out_refs = rest[nIn:]
    survRef = surfSurvRef = None
    # SMEM scratch written by the scalar broad-phase prepasses (surviving
    # chunk ids); LAST kernel arguments (pallas passes scratch after
    # outputs), in scratch_shapes order: triangles then surfaces
    nScratch = (1 if nTriChunks > 1 else 0) + (1 if nSurfChunks else 0)
    if nScratch:
      scratchRefs = out_refs[len(out_refs) - nScratch:]
      out_refs = out_refs[:len(out_refs) - nScratch]
      si = 0
      if nTriChunks > 1:
        survRef = scratchRefs[0]
        si = 1
      if nSurfChunks:
        surfSurvRef = scratchRefs[si]
    if rawRecords:
      # 9 ring outputs per slot: elem, power, world point, incoming
      # direction, isEntering (the kernel twin of batch_tracer's records)
      rawOut_refs = [out_refs[k * hitSlots:(k + 1) * hitSlots]
                     for k in range(9)]
      segOut_ref = out_refs[9 * hitSlots]
      ovfOut_ref = out_refs[9 * hitSlots + 1]
    elif histRows is None:
      binOut_refs = out_refs[0:hitSlots]
      wOut_refs = out_refs[hitSlots:2 * hitSlots]
      cOut_refs = out_refs[2 * hitSlots:3 * hitSlots]
      segOut_ref = out_refs[3 * hitSlots]
      ovfOut_ref = out_refs[3 * hitSlots + 1]
    else:
      hist_ref, segOut_ref, ovfOut_ref = out_refs
    if needSeed:
      pltpu.prng_seed(seed_ref[0],
                      _sweepCell['localPid'] if sweepSpec is not None
                      else pl.program_id(0))
    if sampler is not None:
      ox, oy, oz, dx, dy, dz, pw, wl = _sampleRays(segOut_ref.shape)
    else:
      ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
      dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
      pw = pw_ref[:]
      wl = wl_ref[:]
    shape = ox.shape
    # Constant-valued loop carries must NOT enter lax.fori_loop/while_loop
    # as broadcasted constants: Mosaic gives those a replicated vector
    # layout ("{*,*}") while the loop body produces the natural (8,128)
    # layout, and the carry relayout fails with "Invalid relayout:
    # Non-singleton logical dimension is replicated in destination but not
    # in source" (observed on v5e with the 26-surface rolled loop). Tying
    # each constant to an input vector (ox * 0) pins the concrete layout.
    zeroV = ox * 0.0
    medium = zeroV - 1.0   # element id as float, -1 = vacuum
    # NOTE: never materialize bool arrays directly (Mosaic lowers that as
    # an unsupported i8->i1 truncation); derive masks from comparisons.
    # The fori_loop carry keeps aliveness as float 0/1 for the same reason.
    segCount = zeroV
    hitBin = [zeroV - 1.0 for _ in range(hitSlots)]
    hitW = [zeroV for _ in range(hitSlots)]
    hitC = [zeroV for _ in range(hitSlots)]
    nRaw = 6 if rawRecords else 0   # px py pz dx dy dz (+ent rides hitC)
    hitRaw = [[zeroV for _ in range(hitSlots)]
              for _ in range(nRaw)]
    hitN = zeroV
    if seqSpec is not None:
      nStages, stageSets = seqSpec
    seqF = zeroV     # per-ray sequence index as float

    # dispersion: n(wavelength) per dispersive element, evaluated ONCE
    # (wavelength is constant along a ray) as a Horner polynomial in the
    # scaled wavelength (reference: ray.py wavelength-dependent n via
    # optical_group dispersion tables)
    nOfElem = {}
    for e, er in enumerate(elemRows):
      if er.get('nPoly') is not None:
        mid, half, coeffs = er['nPoly']
        sW = (wl - float(mid)) * float(1.0 / half)
        acc = jnp.full(shape, float(coeffs[-1]))
        for c in reversed(coeffs[:-1]):
          acc = acc * sW + float(c)
        nOfElem[e] = acc

    bounceSurfs = (list(range(S)) if surfAllowed is None
                   else sorted(surfAllowed))
    # static first-bounce reachability cull (see _firstBounceSurfs): only
    # meaningful when bounce 0 is python-unrolled
    first = (sorted(set(firstSurfs) & set(bounceSurfs))
             if firstSurfs is not None else None)
    if first is not None and len(first) == len(bounceSurfs):
      first = None               # nothing culled: share the one body

    # per-bounce candidate sets (ops/beam_cull, round-4 verdict #3): entry b
    # culls the b-th PYTHON-UNROLLED bounce; the rolled tail sweeps tailSet
    # (the caller's union of the un-unrolled bounces' sets). A None entry
    # means "no bound — full sweep". beam_cull guarantees that once an
    # entry is None every later one is too, so the tail default below can
    # never be narrower than an uncovered unrolled bounce.
    def _clipSet(ss):
      return None if ss is None else sorted(set(ss) & set(bounceSurfs))

    perBounceSets = ([_clipSet(ss) for ss in bounceSets]
                     if bounceSets is not None else None)
    tailSet = _clipSet(tailSurfs)
    if tailSet is not None and len(tailSet) == len(bounceSurfs):
      tailSet = None

    def _setForBounce(b):
      if perBounceSets is not None and b < len(perBounceSets) \
          and perBounceSets[b] is not None:
        return perBounceSets[b]
      return first if b == 0 else None

    # ---- one bounce as a carry->carry function: rolled into a
    # lax.fori_loop so the Mosaic program holds ONE bounce body instead of
    # maxIntersections copies (a 27-surface 8-bounce unroll costs >15 min
    # of compile); the deterministic-uniform test seam consumes a distinct
    # input ref per draw, so that path keeps the python unroll ----
    def _bounceBody(carry, surfSet=None):
      if surfSet is not None:
        mySurfs = surfSet
      elif tailSet is not None:
        mySurfs = tailSet
      else:
        mySurfs = bounceSurfs
      (ox, oy, oz, dx, dy, dz, pw, medium, aliveF, segCount, hitN,
       seqF, hitBin, hitW, hitC, hitRaw) = carry
      hitBin, hitW, hitC = list(hitBin), list(hitW), list(hitC)
      hitRaw = [list(r) for r in hitRaw]
      alive = aliveF > 0.5

      def _seqGate(s, t):
        '''Sequential-mode per-ray stage gate for surface s (compile-time
        stage sets; reference clamps the stage index to the last row,
        batch_tracer.bounceBatch q=clip(seq, 0, Q-1)).'''
        if seqSpec is None:
          return t
        stages = stageSets[s]
        if len(stages) >= nStages:
          return t
        ok = None
        for q in stages:
          term = (seqF >= float(q)) if q == nStages - 1 \
              else (seqF == float(q))
          ok = term if ok is None else (ok | term)
        return jnp.where(ok, t, _BIG)

      # ---- nearest intersection: ONE online-argmin pass tracking the
      # global minimum AND the other-medium minimum simultaneously. The
      # same-medium preference window (reference ray.py:388-401: prefer
      # the nearest face NOT belonging to currentMedium within 2*distTol)
      # is applied AFTER the sweep — equivalent to the three-pass form
      # because the windowed minimum IS the other-medium minimum whenever
      # that minimum lies inside the window. The old form kept all nSurf
      # per-surface distances live across two more selection passes,
      # which both cost ~2 extra vector ops per surface and counted nSurf
      # (rows, 128) arrays against the VMEM stack (capping many-surface
      # scenes at 4096-ray tiles). Argmin-with-strict-< keeps the FIRST
      # surface achieving the minimum, matching the old first-match
      # tie-break. ----
      # Static medium cull: `medium` only ever takes -1 or the element id
      # of a LENS / transmission-GRATING entry (see the newMedium update
      # below), so for surfaces of any other element the other-medium
      # test `medium != elemF` is compile-time TRUE (drop the mask), and
      # in scenes with no such element at all the other-medium minimum
      # IS the global minimum (drop the second tracker entirely).
      canBeMedium = tuple(er['optF'] in (float(LENS), float(GRATING))
                          for er in elemRows)
      anyMedium = any(canBeMedium)
      # ---- hoisted transform-group rotations (_assignXformGroups): rotate
      # the ray into each signed-permutation group frame ONCE per bounce;
      # member surfaces then derive their local frames with free sign/axis
      # picks inside _intersectConst — bit-identical to the per-surface
      # 9-FMA rotation, ~25 fewer VPU ops per extra member surface. ----
      grpCoords = {}
      if XFORM_GROUPS:
        for s in mySurfs:
          r = surfRows[s]
          g = r.get('grp', -1)
          if g < 0 or g in grpCoords or 'pick' not in r:
            continue
          (b0, b1, b2) = r['grpBase']
          grpCoords[g] = (
              b0[0] * ox + b0[1] * oy + b0[2] * oz,
              b1[0] * ox + b1[1] * oy + b1[2] * oz,
              b2[0] * ox + b2[1] * oy + b2[2] * oz,
              b0[0] * dx + b0[1] * dy + b0[2] * dz,
              b1[0] * dx + b1[1] * dy + b1[2] * dz,
              b2[0] * dx + b2[1] * dy + b2[2] * dz)
      # The per-surface `t <= maxRayLength` clamp is hoisted out of the
      # sweep: min() over unclamped candidates picks the same winner for
      # any candidate within range (out-of-range ones are never smaller
      # than an in-range minimum), so one range test on the selected
      # tBest/tOth below replaces S clamp ops per bounce. NaN candidates
      # still never win (NaN < x is false).
      tBest = jnp.full(shape, _BIG)
      sBest = jnp.full(shape, -1.0)
      tOth = jnp.full(shape, _BIG)
      sOth = jnp.full(shape, -1.0)
      for s in mySurfs:
        r = surfRows[s]
        t = _intersectConst(r, ox, oy, oz, dx, dy, dz, distTol, maskVals,
                            grpCoords=grpCoords if XFORM_GROUPS else None)
        t = _seqGate(s, t)
        b = t < tBest
        sBest = jnp.where(b, float(s), sBest)
        tBest = jnp.where(b, t, tBest)
        if anyMedium:
          tO = jnp.where(medium != r['elemF'], t, _BIG) \
              if canBeMedium[int(r['elemF'])] else t
          bO = tO < tOth
          sOth = jnp.where(bO, float(s), sOth)
          tOth = jnp.where(bO, tO, tOth)

      # ---- SMEM-resident triangle sweep: meshes past the immediates
      # budget ride as a (nTri, 11) scalar-memory table [p0, e1, e2,
      # elemF, orient] looped per bounce — the scalar core feeds each
      # triangle's constants to the same vectorized Moeller-Trumbore as
      # the immediates path; the running argmin tracks the winner's
      # (pre-oriented) normal and element so no per-ray gather is needed.
      # Sequential-mode stage gates and per-source surface masks are
      # compile-time per-SURFACE constants and cannot apply per SMEM row,
      # so eligibility keeps such scenes on the immediates/XLA paths.
      if nTriChunks > 1 or nSurfChunks:
        # shared broad-phase state for the SMEM chunk culls: sign-preserving
        # inverse direction (zero clamped — the slab test stays
        # conservative, the interval collapses to the origin's side) and
        # the alive mask
        aliveMask = aliveF > 0.5

        def _safeInv(d):
          mag = jnp.maximum(jnp.abs(d), 1e-30)
          return jnp.where(d < 0., -1.0, 1.0) / mag

        invDx, invDy, invDz = _safeInv(dx), _safeInv(dy), _safeInv(dz)

        def _slabSurvives(boxRef, c, tCapRay):
          '''Scalar-core prepass body: does ANY alive ray's segment (capped
          at its current-best hit) enter chunk c's AABB?'''
          tx1 = (boxRef[c, 0] - ox) * invDx
          tx2 = (boxRef[c, 3] - ox) * invDx
          ty1 = (boxRef[c, 1] - oy) * invDy
          ty2 = (boxRef[c, 4] - oy) * invDy
          tz1 = (boxRef[c, 2] - oz) * invDz
          tz2 = (boxRef[c, 5] - oz) * invDz
          tN = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                       jnp.minimum(ty1, ty2)),
                           jnp.maximum(jnp.minimum(tz1, tz2), 0.))
          tF = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                       jnp.maximum(ty1, ty2)),
                           jnp.minimum(jnp.maximum(tz1, tz2), tCapRay))
          return jnp.max(jnp.where((tN <= tF) & aliveMask, 1., 0.)) > 0.

      if nTriSMEM:
        def _triBody(i, c):
          tT, nxT, nyT, nzT, elT = c
          p0x, p0y, p0z = triRef[i, 0], triRef[i, 1], triRef[i, 2]
          e1x, e1y, e1z = triRef[i, 3], triRef[i, 4], triRef[i, 5]
          e2x, e2y, e2z = triRef[i, 6], triRef[i, 7], triRef[i, 8]
          el, orn = triRef[i, 9], triRef[i, 10]
          pvx = dy * e2z - dz * e2y
          pvy = dz * e2x - dx * e2z
          pvz = dx * e2y - dy * e2x
          det = e1x * pvx + e1y * pvy + e1z * pvz
          detS = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
          tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
          u = (tvx * pvx + tvy * pvy + tvz * pvz) / detS
          qvx = tvy * e1z - tvz * e1y
          qvy = tvz * e1x - tvx * e1z
          qvz = tvx * e1y - tvy * e1x
          v = (dx * qvx + dy * qvy + dz * qvz) / detS
          t = (e2x * qvx + e2y * qvy + e2z * qvz) / detS
          ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                & (u + v <= 1) & (t > distTol) & (t <= maxRayLength))
          t = jnp.where(ok, t, _BIG)
          better = t < tT
          # unnormalized cross suffices up to scale; normalize scalar-side
          cnx = e1y * e2z - e1z * e2y
          cny = e1z * e2x - e1x * e2z
          cnz = e1x * e2y - e1y * e2x
          inv = orn * jax.lax.rsqrt(cnx * cnx + cny * cny + cnz * cnz
                                    + 1e-30)
          tT = jnp.where(better, t, tT)
          nxT = jnp.where(better, cnx * inv, nxT)
          nyT = jnp.where(better, cny * inv, nyT)
          nzT = jnp.where(better, cnz * inv, nzT)
          elT = jnp.where(better, el, elT)
          return tT, nxT, nyT, nzT, elT
        triInit = (zeroV + _BIG, zeroV, zeroV, zeroV, zeroV - 1.0)
        if nTriChunks > 1:
          # ---- chunk-culled sweep: triangles are Morton-ordered into
          # chunks of _TRI_CHUNK with per-chunk world AABBs (SMEM). A
          # broad-phase prepass appends surviving chunk ids to SMEM
          # scratch; the VECTOR loop then sweeps only survivors. The
          # prepass slab-tests each chunk AABB against EVERY alive ray
          # individually (round-4 verdict #2: the old tile-reach interval
          # test inflated the reach to the AABB of all rays, so
          # INCOHERENT tiles — e.g. diffuse bounces — never culled
          # anything; a chunk now survives only if some actual ray's
          # segment enters it). The per-ray t cap uses the analytic
          # sweep's tBest plus the same-medium window, so closed scenes
          # (housings, detectors) cull chunks behind each ray's nearest
          # analytic hit. ~30 VPU ops per chunk per bounce; the savings
          # are ~40 ops per culled TRIANGLE (_TRI_CHUNK = 64 per chunk).
          tCapRay = jnp.minimum(tBest, mrlEff) + 2 * distTol

          def _pre(c, count):
            anyHit = _slabSurvives(chunkRef, c, tCapRay)

            def _keep(k):
              survRef[k] = c
              return k + 1

            return lax.cond(anyHit, _keep, lambda k: k, count)

          nSurv = lax.fori_loop(0, nTriChunks, _pre, jnp.int32(0))

          def _chunkBody(j, carry):
            base = survRef[j] * _TRI_CHUNK
            nIn = jnp.minimum(jnp.int32(_TRI_CHUNK),
                              jnp.int32(nTriSMEM) - base)
            return lax.fori_loop(
                0, nIn, lambda i, cc: _triBody(base + i, cc), carry)

          tT, nxT, nyT, nzT, elT = lax.fori_loop(
              0, nSurv, _chunkBody, triInit)
        else:
          tT, nxT, nyT, nzT, elT = lax.fori_loop(
              0, nTriSMEM, _triBody, triInit)
        b = tT < tBest
        sBest = jnp.where(b, -2.0, sBest)
        tBest = jnp.where(b, tT, tBest)
        if anyMedium:
          tO = jnp.where(medium != elT, tT, _BIG)
          bO = tO < tOth
          sOth = jnp.where(bO, -2.0, sOth)
          tOth = jnp.where(bO, tO, tOth)

      # ---- SMEM-resident analytic-surface sweep: assemblies past the
      # 256-surface immediates budget ride as a (nRows, 21) scalar table
      # [rot(9), off(3), orient, elemF, p0..p4, trim1, trim2], grouped
      # into contiguous (kind, trim0) runs so each fori_loop's
      # intersection formula stays STATIC while its coefficients are
      # scalar reads (round-4 verdict #5 — the same mechanism as the
      # triangle sweep; formulas shared with the immediates path via
      # _intersectConst(localCoords=...) / _normalConst so the paths
      # cannot drift). The running argmin tracks the winner's oriented
      # WORLD normal, element and local (x, y) hit chart — no per-ray

      # gather. Sequential stages / per-source masks are per-surface
      # compile-time gates and keep such scenes off this path
      # (eligibility).
      if nSurfSMEM:
        def _surfBody(i, c, kind, trim0):
          tS, nxS, nyS, nzS, elS, lxS, lyS = c
          r00, r01, r02 = surfRef[i, 0], surfRef[i, 1], surfRef[i, 2]
          r10, r11, r12 = surfRef[i, 3], surfRef[i, 4], surfRef[i, 5]
          r20, r21, r22 = surfRef[i, 6], surfRef[i, 7], surfRef[i, 8]
          t0, t1, t2 = surfRef[i, 9], surfRef[i, 10], surfRef[i, 11]
          orn, elF = surfRef[i, 12], surfRef[i, 13]
          r = dict(kind=kind, trim0=trim0,
                   p0=surfRef[i, 14], p1=surfRef[i, 15],
                   p2=surfRef[i, 16], p3=surfRef[i, 17],
                   p4=surfRef[i, 18],
                   trim1=surfRef[i, 19], trim2=surfRef[i, 20])
          lox = r00 * ox + r01 * oy + r02 * oz + t0
          loy = r10 * ox + r11 * oy + r12 * oz + t1
          loz = r20 * ox + r21 * oy + r22 * oz + t2
          ldx = r00 * dx + r01 * dy + r02 * dz
          ldy = r10 * dx + r11 * dy + r12 * dz
          ldz = r20 * dx + r21 * dy + r22 * dz
          t = _intersectConst(r, ox, oy, oz, dx, dy, dz, distTol,
                              localCoords=(lox, loy, loz, ldx, ldy, ldz))
          better = (t < tS) & (t <= mrlEff)
          lxH = lox + t * ldx
          lyH = loy + t * ldy
          lzH = loz + t * ldz
          nlx, nly, nlz = _normalConst(r, lxH, lyH, lzH)
          nwx = (r00 * nlx + r10 * nly + r20 * nlz) * orn
          nwy = (r01 * nlx + r11 * nly + r21 * nlz) * orn
          nwz = (r02 * nlx + r12 * nly + r22 * nlz) * orn
          return (jnp.where(better, t, tS),
                  jnp.where(better, nwx, nxS),
                  jnp.where(better, nwy, nyS),
                  jnp.where(better, nwz, nzS),
                  jnp.where(better, elF, elS),
                  jnp.where(better, lxH, lxS),
                  jnp.where(better, lyH, lyS))

        cS = (zeroV + _BIG, zeroV, zeroV, zeroV, zeroV - 1.0, zeroV,
              zeroV)
        # batched-sweep mode: the table stacks every variant's rows
        # (variant-major); offset this tile's reads to its variant block
        rowBase = _sweepCell['rowOff'] if sweepSpec is not None else 0
        for runKind, runTrim0, runStart, runStop in surfRuns:
          cS = lax.fori_loop(
              runStart, runStop,
              lambda i, cc, _k=runKind, _t=runTrim0:
                  _surfBody(rowBase + i, cc, _k, _t), cS)
        # ---- chunk-culled runs (_chunkSurfRows): per-run scalar prepass
        # slab-tests each Morton-chunk AABB against every alive ray
        # (capped at the ray's current best hit, INCLUDING the plain-run
        # sweep above via cS[0]); the vector loop then sweeps surviving
        # chunks only, at the run's fixed _SURF_CHUNK row stride (short
        # chunks are padded with never-hit dummy rows) ----
        if surfChunkRuns:
          tCapS = jnp.minimum(jnp.minimum(tBest, cS[0]), mrlEff) \
              + 2 * distTol

          def _sPre(c, count):
            anyHit = _slabSurvives(surfChunkRef, c, tCapS)

            def _keep(k):
              surfSurvRef[k] = c
              return k + 1

            return lax.cond(anyHit, _keep, lambda k: k, count)

          for runKind, runTrim0, c0, c1, rowStart in surfChunkRuns:
            nSurv = lax.fori_loop(c0, c1, _sPre, jnp.int32(0))

            def _sChunk(j, cc, _k=runKind, _t=runTrim0, _c0=c0,
                        _r0=rowStart):
              base = _r0 + (surfSurvRef[j] - _c0) * _SURF_CHUNK
              return lax.fori_loop(
                  0, _SURF_CHUNK,
                  lambda i, c2: _surfBody(base + i, c2, _k, _t), cc)

            cS = lax.fori_loop(0, nSurv, _sChunk, cS)
        tSm, nxSm, nySm, nzSm, elSm, lxSm, lySm = cS
        b = tSm < tBest
        sBest = jnp.where(b, -3.0, sBest)
        tBest = jnp.where(b, tSm, tBest)
        if anyMedium:
          tO = jnp.where(medium != elSm, tSm, _BIG)
          bO = tO < tOth
          sOth = jnp.where(bO, -3.0, sOth)
          tOth = jnp.where(bO, tO, tOth)

      # same-medium preference + winner (-2 = SMEM triangle,
      # -3 = SMEM analytic surface). NOTE plain
      # boolean algebra — jnp.where on i1 operands crashes the Mosaic
      # compiler.
      hasHit = tBest <= mrlEff
      if not anyMedium:
        tOth, sOth = tBest, sBest
      hasPref = (tOth <= mrlEff) & (tOth <= tBest + 2 * distTol)
      tSel = jnp.where(hasPref, tOth, tBest)
      sIdx = jnp.where(hasHit, jnp.where(hasPref, sOth, sBest), -1.0)

      tSeg = jnp.where(hasHit, tSel, maxRayLength)
      px, py, pz = ox + tSeg * dx, oy + tSeg * dy, oz + tSeg * dz

      # ---- winner attributes (ATTR_PASS) ----
      # (an EMPTY culled set falls to the zero-init branch below: no
      # immediates surface can win, the SMEM winners still overlay)
      if ATTR_PASS == 'accum' and mySurfs:
        # gather the winner's constants as columns (one select per
        # constant per surface), then do the local transform + per-KIND
        # normal + transpose rotation ONCE — ~2-3x fewer VPU ops per
        # surface than recomputing transform+normal for every surface
        rows = [(s, surfRows[s]) for s in mySurfs]
        allIdent = all(r.get('ident') for _s, r in rows)
        kindsHere = sorted({r['kind'] for _s, r in rows})
        nSlots = max([len(_NORMAL_SLOTS.get(k, ())) for k in kindsHere]
                     + [3 if GS.TRIANGLE in kindsHere else 0])
        aCols = [jnp.zeros(shape) for _ in range(nSlots)]
        kindF = jnp.full(shape, -1.0)
        orientA = jnp.ones(shape)
        elemF = jnp.zeros(shape)
        if not allIdent:
          R00 = jnp.ones(shape)
          R11 = jnp.ones(shape)
          R22 = jnp.ones(shape)
          R01 = R02 = R10 = R12 = R20 = R21 = jnp.zeros(shape)
          T0 = T1 = T2 = jnp.zeros(shape)
        for s, r in rows:
          m = sIdx == float(s)
          kindF = jnp.where(m, float(r['kind']), kindF)
          orientA = jnp.where(m, r['orient'], orientA)
          elemF = jnp.where(m, r['elemF'], elemF)
          vals = (r['triN'] if r['kind'] == GS.TRIANGLE
                  else [r[k] for k in _NORMAL_SLOTS.get(r['kind'], ())])
          for i, v in enumerate(vals):
            aCols[i] = jnp.where(m, float(v), aCols[i])
          if not allIdent and not r.get('ident'):
            R00 = jnp.where(m, r['r00'], R00)
            R01 = jnp.where(m, r['r01'], R01)
            R02 = jnp.where(m, r['r02'], R02)
            R10 = jnp.where(m, r['r10'], R10)
            R11 = jnp.where(m, r['r11'], R11)
            R12 = jnp.where(m, r['r12'], R12)
            R20 = jnp.where(m, r['r20'], R20)
            R21 = jnp.where(m, r['r21'], R21)
            R22 = jnp.where(m, r['r22'], R22)
            T0 = jnp.where(m, r['t0'], T0)
            T1 = jnp.where(m, r['t1'], T1)
            T2 = jnp.where(m, r['t2'], T2)
        if allIdent:
          lx, ly, lz = px, py, pz
        else:
          lx = R00 * px + R01 * py + R02 * pz + T0
          ly = R10 * px + R11 * py + R12 * pz + T1
          lz = R20 * px + R21 * py + R22 * pz + T2
        nlx, nly, nlz = _normalFromCols(kindsHere, kindF, aCols,
                                        lx, ly, lz)
        if allIdent:
          nxA, nyA, nzA = nlx * orientA, nly * orientA, nlz * orientA
        else:
          nxA = (R00 * nlx + R10 * nly + R20 * nlz) * orientA
          nyA = (R01 * nlx + R11 * nly + R21 * nlz) * orientA
          nzA = (R02 * nlx + R12 * nly + R22 * nlz) * orientA
        plxA, plyA = lx, ly
        # no-hit rays keep kindF=-1 / identity defaults; downstream use
        # is gated on hasHit exactly like the per-surface form
      else:
        nxA = jnp.zeros(shape)
        nyA = jnp.zeros(shape)
        nzA = jnp.zeros(shape)
        plxA = jnp.zeros(shape)
        plyA = jnp.zeros(shape)
        elemF = jnp.zeros(shape)
        for s in mySurfs:
          r = surfRows[s]
          m = sIdx == float(s)
          if r.get('ident'):
            lx, ly, lz = px, py, pz
            nlx, nly, nlz = _normalConst(r, lx, ly, lz)
            nwx, nwy, nwz = (nlx * r['orient'], nly * r['orient'],
                             nlz * r['orient'])
          else:
            lx = r['r00'] * px + r['r01'] * py + r['r02'] * pz + r['t0']
            ly = r['r10'] * px + r['r11'] * py + r['r12'] * pz + r['t1']
            lz = r['r20'] * px + r['r21'] * py + r['r22'] * pz + r['t2']
            nlx, nly, nlz = _normalConst(r, lx, ly, lz)
            # world normal via transpose, then outward orientation
            nwx = (r['r00'] * nlx + r['r10'] * nly
                   + r['r20'] * nlz) * r['orient']
            nwy = (r['r01'] * nlx + r['r11'] * nly
                   + r['r21'] * nlz) * r['orient']
            nwz = (r['r02'] * nlx + r['r12'] * nly
                   + r['r22'] * nlz) * r['orient']
          nxA = jnp.where(m, nwx, nxA)
          nyA = jnp.where(m, nwy, nyA)
          nzA = jnp.where(m, nwz, nzA)
          plxA = jnp.where(m, lx, plxA)
          plyA = jnp.where(m, ly, plyA)
          elemF = jnp.where(m, r['elemF'], elemF)
      if nTriSMEM:
        # SMEM-triangle winner: argmin-tracked oriented normal; triangles
        # are stored world-frame (identity transform), so the recording
        # chart is world (x, y) like the immediates TRIANGLE path
        mT = sIdx == -2.0
        nxA = jnp.where(mT, nxT, nxA)
        nyA = jnp.where(mT, nyT, nyA)
        nzA = jnp.where(mT, nzT, nzA)
        plxA = jnp.where(mT, px, plxA)
        plyA = jnp.where(mT, py, plyA)
        elemF = jnp.where(mT, elT, elemF)
      if nSurfSMEM:
        # SMEM-analytic winner: argmin-tracked oriented world normal,
        # element and LOCAL (x, y) — the recording chart of an analytic
        # face is its local frame, tracked during the sweep since the
        # winner's rotation lives in scalar memory
        mS = sIdx == -3.0
        nxA = jnp.where(mS, nxSm, nxA)
        nyA = jnp.where(mS, nySm, nyA)
        nzA = jnp.where(mS, nzSm, nzA)
        plxA = jnp.where(mS, lxSm, plxA)
        plyA = jnp.where(mS, lySm, plyA)
        elemF = jnp.where(mS, elSm, elemF)

      cosA = dx * nxA + dy * nyA + dz * nzA
      isEntering = cosA < 0
      sgn = jnp.where(isEntering, -1., 1.)
      nx, ny, nz = nxA * sgn, nyA * sgn, nzA * sgn

      # ---- per-element properties via masked accumulation ----
      optType = jnp.zeros(shape)
      nElem = jnp.ones(shape)
      refl = jnp.ones(shape)
      recFlag = optType < -1.0   # all-false bool via comparison
      detIdx = jnp.zeros(shape)
      bx0 = jnp.zeros(shape)
      bx1 = jnp.ones(shape)
      by0 = jnp.zeros(shape)
      by1 = jnp.ones(shape)
      nMed = jnp.ones(shape)
      absLenMed = jnp.full(shape, _BIG)
      if hasGrating:
        gTypeF = jnp.zeros(shape)
        gLpm = jnp.ones(shape)
        gDirX = jnp.ones(shape)
        gDirY = jnp.zeros(shape)
        gDirZ = jnp.zeros(shape)
        gOrder = jnp.zeros(shape)
      for e, er in enumerate(elemRows):
        m = elemF == float(e)
        nVal = nOfElem.get(e, er['n'])
        optType = jnp.where(m, er['optF'], optType)
        nElem = jnp.where(m, nVal, nElem)
        refl = jnp.where(m, er['refl'], refl)
        if er['rec'] > 0.5:
          recFlag = recFlag | m
        detIdx = jnp.where(m, er['detF'], detIdx)
        bx0 = jnp.where(m, er['bx0'], bx0)
        bx1 = jnp.where(m, er['bx1'], bx1)
        by0 = jnp.where(m, er['by0'], by0)
        by1 = jnp.where(m, er['by1'], by1)
        if hasGrating:
          gTypeF = jnp.where(m, er['gratType'], gTypeF)
          gLpm = jnp.where(m, er['gratLpm'], gLpm)
          gDirX = jnp.where(m, er['gratDirX'], gDirX)
          gDirY = jnp.where(m, er['gratDirY'], gDirY)
          gDirZ = jnp.where(m, er['gratDirZ'], gDirZ)
          gOrder = jnp.where(m, er['gratOrder'], gOrder)
        mm = medium == float(e)
        nMed = jnp.where(mm, nVal, nMed)
        absLenMed = jnp.where(mm, er['absLen'], absLenMed)

      # Beer-Lambert
      inMedium = medium >= 0
      factor = jnp.where(absLenMed <= 0, 0.,
                         jnp.where(absLenMed >= _BIG, 1.,
                                   jnp.exp(-tSeg / absLenMed)))
      pw = jnp.where(inMedium, pw * factor, pw)

      # ---- interactions ----
      dDotN = dx * nx + dy * ny + dz * nz
      mxD, myD, mzD = dx - 2 * nx * dDotN, dy - 2 * ny * dDotN, \
          dz - 2 * nz * dDotN
      n1 = jnp.where(inMedium, nMed, 1.)
      n2 = jnp.where(isEntering, nElem, 1.)
      mu = n1 / n2
      sin2 = jnp.maximum(1 - dDotN * dDotN, 0.)
      root = 1 - mu * mu * sin2
      tir = root < 0
      sq = jnp.sqrt(jnp.maximum(root, 0.))
      tx_, ty_, tz_ = dx - nx * dDotN, dy - ny * dDotN, dz - nz * dDotN
      snx = jnp.where(tir, mxD, mu * tx_ + nx * sq)
      sny = jnp.where(tir, myD, mu * ty_ + ny * sq)
      snz = jnp.where(tir, mzD, mu * tz_ + nz * sq)

      isMirror = optType == float(MIRROR)
      isLens = optType == float(LENS)
      isAbsorber = optType == float(ABSORBER)
      isGrating = optType == float(GRATING)

      if hasGrating:
        # Ludwig-1970 line grating with the incidence-side normal
        # (tracing/tracer.py gratingDirection; batched form in
        # batch_tracer.py) — all column math, scene constants baked
        isReflG = gTypeF == 0.0
        gn1 = jnp.where(isReflG, n1, 1.)    # n1 = medium index (1 in vacuum)
        gn2 = jnp.where(isReflG, n1, nElem)
        gmu = gn1 / gn2
        nix, niy, niz = -nx, -ny, -nz
        pgx = gDirY * niz - gDirZ * niy
        pgy = gDirZ * nix - gDirX * niz
        pgz = gDirX * niy - gDirY * nix
        pinv = lax.rsqrt(pgx * pgx + pgy * pgy + pgz * pgz + 1e-20)
        pgx, pgy, pgz = pgx * pinv, pgy * pinv, pgz * pinv
        dgx = niy * pgz - niz * pgy
        dgy = niz * pgx - nix * pgz
        dgz = nix * pgy - niy * pgx
        dinv = lax.rsqrt(dgx * dgx + dgy * dgy + dgz * dgz + 1e-20)
        dgx, dgy, dgz = dgx * dinv, dgy * dinv, dgz * dinv
        lamUm = wl / 1000.
        spacing = 1000. / gLpm
        Tt = gOrder * lamUm / (gn1 * spacing)
        Vg = gmu * (dx * nix + dy * niy + dz * niz)
        Wg = (gmu * gmu - 1 + Tt * Tt
              - 2 * gmu * Tt * (dx * dgx + dy * dgy + dz * dgz))
        discG = Vg * Vg - Wg
        evanescent = discG < 0
        gsq = jnp.sqrt(jnp.maximum(discG, 0.))
        qg = jnp.where(isReflG, -Vg + gsq, -Vg - gsq)
        ggx = gmu * dx - Tt * dgx + qg * nix
        ggy = gmu * dy - Tt * dgy + qg * niy
        ggz = gmu * dz - Tt * dgz + qg * niz
        ginv = lax.rsqrt(ggx * ggx + ggy * ggy + ggz * ggz + 1e-20)
        ggx, ggy, ggz = ggx * ginv, ggy * ginv, ggz * ginv
        # reflective grating passes non-entering rays through; a
        # transmissive one exiting the substrate refracts like a lens
        gratX = jnp.where(isEntering, ggx, jnp.where(isReflG, dx, snx))
        gratY = jnp.where(isEntering, ggy, jnp.where(isReflG, dy, sny))
        gratZ = jnp.where(isEntering, ggz, jnp.where(isReflG, dz, snz))
      else:
        gratX, gratY, gratZ = dx, dy, dz

      ndx = jnp.where(isMirror, mxD, jnp.where(isLens, snx,
                      jnp.where(isGrating, gratX, dx)))
      ndy = jnp.where(isMirror, myD, jnp.where(isLens, sny,
                      jnp.where(isGrating, gratY, dy)))
      ndz = jnp.where(isMirror, mzD, jnp.where(isLens, snz,
                      jnp.where(isGrating, gratZ, dz)))
      inv = lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz + 1e-20)
      ndx, ndy, ndz = ndx * inv, ndy * inv, ndz * inv

      # ---- in-kernel stochastic scatter (batch_tracer scatter section;
      # scatterConsts = phi-separable lobes as pwpoly / theta_in-conditioned
      # pwpoly2d constants + DiracDelta events as poly1d(theta_in) constants;
      # kind slots 0=REFLECT 1=REFRACT_ENTER 2=REFRACT_EXIT 3=MODIFY) ----
      if scatterConsts:
        from ..distributions.device_sampler import (
            evalPwpoly2d, evalDiscreteEvents, arccosApprox,
            evalLowRankTheta)
        lobe = [c for c in scatterConsts if c[1] in (0, 1, 2)]
        mods = [c for c in scatterConsts if c[1] == 3]
        needCond = any(c[2][0] in ('pwpoly2d', 'lowrank')
                       or c[3][0] in ('pwpoly2d', 'lowrank')
                       or c[4] or c[5] for c in scatterConsts)
        # continuous incidence angle through the shared sqrt*poly arccos
        # (Mosaic has no acos lowering); identical math to the XLA twin
        # batch_tracer._scatterDrawConst
        thetaInC = arccosApprox(jnp.clip(dDotN, 0., 1.)) if needCond \
            else None

        def drawSpec(spec, u, phi=None):
          if spec[0] == 'pwpoly2d':
            return evalPwpoly2d(spec, u, thetaInC)
          if spec[0] == 'lowrank':
            # theta|phi-coupled lobe: conditioned on the drawn phi too
            # (XLA twin: batch_tracer._scatterDrawConst)
            return evalLowRankTheta(spec, u, thetaInC, phi)
          return _marginal(spec, u)

        def kindMask(k):
          if k == 0:
            return isMirror
          if k == 1:
            return isLens & isEntering
          if k == 2:
            return isLens & ~isEntering
          return isMirror | isLens          # MODIFY applies to both

        def lobeAxis(bx, by, bz):
          # rotation axis = b x dIn, with an arbitrary perpendicular of b
          # at (near-)normal incidence
          axX = by * dz - bz * dy
          axY = bz * dx - bx * dz
          axZ = bx * dy - by * dx
          ax2 = axX * axX + axY * axY + axZ * axZ
          altX, altY, altZ = jnp.zeros(shape), bz, -by      # b x x_hat
          alt2X, alt2Y, alt2Z = -bz, jnp.zeros(shape), bx   # b x y_hat
          alt2 = altY * altY + altZ * altZ
          useAlt = ax2 < 1e-12
          axX = jnp.where(useAlt, jnp.where(alt2 > 1e-12, altX, alt2X), axX)
          axY = jnp.where(useAlt, jnp.where(alt2 > 1e-12, altY, alt2Y), axY)
          axZ = jnp.where(useAlt, jnp.where(alt2 > 1e-12, altZ, alt2Z), axZ)
          ainv = lax.rsqrt(axX * axX + axY * axY + axZ * axZ + 1e-20)
          return axX * ainv, axY * ainv, axZ * ainv

        if lobe:
          u1, u2 = _uniform(shape), _uniform(shape)
          if any(c[4] or c[5] for c in lobe):
            u3, u4 = _uniform(shape), _uniform(shape)
          thetaS = jnp.zeros(shape)
          phiS = jnp.zeros(shape)
          applies = optType < -1.0            # all-false
          for e, k, phiSpec, thetaSpec, phiDisc, thetaDisc in lobe:
            m = (elemF == float(e)) & kindMask(k) & hasHit
            ph = drawSpec(phiSpec, u1)
            if phiDisc:
              ph = evalDiscreteEvents(phiDisc, thetaInC, u3, ph)
            # theta conditions on the drawn phi AFTER its discrete
            # overwrite (matches _scatterDraw's phiIdx-from-phiOut)
            th = drawSpec(thetaSpec, u2, ph)
            if thetaDisc:
              th = evalDiscreteEvents(thetaDisc, thetaInC, u4, th)
            thetaS = jnp.where(m, th, thetaS)
            phiS = jnp.where(m, ph, phiS)
            applies = applies | m
          # lobe axis: incidence-side normal for mirrors, forward normal
          # for lenses; theta=0 is the face normal
          nSgn = jnp.where(isMirror, -1., 1.)
          lnx, lny, lnz = nx * nSgn, ny * nSgn, nz * nSgn
          axX, axY, axZ = lobeAxis(lnx, lny, lnz)
          sx1, sy1, sz1 = _rotK(lnx, lny, lnz, axX, axY, axZ, thetaS)
          sx1, sy1, sz1 = _rotK(sx1, sy1, sz1, lnx, lny, lnz, phiS)
          ndx = jnp.where(applies, sx1, ndx)
          ndy = jnp.where(applies, sy1, ndy)
          ndz = jnp.where(applies, sz1, ndz)
        if mods:
          m1, m2 = _uniform(shape), _uniform(shape)
          if any(c[4] or c[5] for c in mods):
            m3, m4 = _uniform(shape), _uniform(shape)
          thetaM = jnp.zeros(shape)
          phiM = jnp.zeros(shape)
          appliesM = optType < -1.0
          for e, _k, phiSpec, thetaSpec, phiDisc, thetaDisc in mods:
            m = (elemF == float(e)) & kindMask(3) & hasHit
            ph = drawSpec(phiSpec, m1)
            if phiDisc:
              ph = evalDiscreteEvents(phiDisc, thetaInC, m3, ph)
            th = drawSpec(thetaSpec, m2, ph)
            if thetaDisc:
              th = evalDiscreteEvents(thetaDisc, thetaInC, m4, th)
            thetaM = jnp.where(m, th, thetaM)
            phiM = jnp.where(m, ph, phiM)
            appliesM = appliesM | m
          mAxX, mAxY, mAxZ = lobeAxis(ndx, ndy, ndz)
          mx2, my2, mz2 = _rotK(ndx, ndy, ndz, mAxX, mAxY, mAxZ, thetaM)
          mx2, my2, mz2 = _rotK(mx2, my2, mz2, ndx, ndy, ndz, phiM)
          ndx = jnp.where(appliesM, mx2, ndx)
          ndy = jnp.where(appliesM, my2, ndy)
          ndz = jnp.where(appliesM, mz2, ndz)
        if lobe or mods:
          inv2 = lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz + 1e-20)
          ndx, ndy, ndz = ndx * inv2, ndy * inv2, ndz * inv2

      lensExitToVacuum = isLens & ~isEntering & ~tir & (medium == elemF)
      if hasGrating:
        gratTransEnter = isGrating & ~isReflG & isEntering
        gratTransExit = isGrating & ~isReflG & ~isEntering & ~tir
        newMedium = jnp.where((isLens & isEntering) | gratTransEnter, elemF,
                              jnp.where(lensExitToVacuum | gratTransExit,
                                        -1., medium))
      else:
        newMedium = jnp.where(isLens & isEntering, elemF,
                              jnp.where(lensExitToVacuum, -1., medium))
      newPw = jnp.where(isMirror, pw * refl,
                        jnp.where(isAbsorber, 0., pw))
      if hasGrating:
        newPw = jnp.where(isGrating & isEntering & evanescent, 0., newPw)

      if seqSpec is not None:
        # per-ray sequence advance, identical to batch_tracer.bounceBatch
        # seqInc: lens ENTRY and transmission-grating ENTRY do not advance
        isVac = optType == float(VACUUM)
        seqInc = isMirror | isAbsorber | isVac | lensExitToVacuum
        if hasGrating:
          seqInc = seqInc | (isGrating & isReflG & isEntering) \
              | gratTransExit
        seqF = seqF + jnp.where(alive & hasHit & seqInc, 1., 0.)

      # ---- record EVERY detector pass into the hit-slot ring (reference
      # records on each pass, ray.py:276-277; overflow beyond hitSlots
      # overwrites the last slot). Histogram mode gates on the in-bounds
      # bin; raw-records mode matches batch_tracer's recordHit (every
      # recording-element hit, no bounds) and keeps elem/point/incoming
      # direction/isEntering per slot ----
      if rawRecords:
        inside = recFlag & hasHit & alive
        vals = (elemF, pw, jnp.where(isEntering, 1., 0.),
                px, py, pz, dx, dy, dz)
        for slot in range(hitSlots):
          take = inside & (jnp.minimum(hitN, float(hitSlots - 1))
                           == float(slot))
          hitBin[slot] = jnp.where(take, vals[0], hitBin[slot])
          hitW[slot] = jnp.where(take, vals[1], hitW[slot])
          hitC[slot] = jnp.where(take, vals[2], hitC[slot])
          for k in range(6):
            hitRaw[k][slot] = jnp.where(take, vals[3 + k],
                                        hitRaw[k][slot])
      else:
        fx = (plxA - bx0) / (bx1 - bx0)
        fy = (plyA - by0) / (by1 - by0)
        inside = ((fx >= 0) & (fx < 1) & (fy >= 0) & (fy < 1)
                  & recFlag & hasHit & alive & (detIdx >= 0))
        ixF = jnp.floor(fx * W)
        iyF = jnp.floor(fy * H)
        binF = (detIdx * H + iyF) * W + ixF
        for slot in range(hitSlots):
          take = inside & (jnp.minimum(hitN, float(hitSlots - 1))
                           == float(slot))
          hitBin[slot] = jnp.where(take, binF, hitBin[slot])
          hitW[slot] = jnp.where(take, pw, hitW[slot])
          hitC[slot] = jnp.where(take, 1., hitC[slot])
      hitN = hitN + jnp.where(inside, 1., 0.)

      segCount = segCount + jnp.where(alive, 1., 0.)
      newAliveF = jnp.where(alive & hasHit & (newPw >= powerTol), 1., 0.)
      ox = jnp.where(alive, px, ox)
      oy = jnp.where(alive, py, oy)
      oz = jnp.where(alive, pz, oz)
      dx = jnp.where(alive & hasHit, ndx, dx)
      dy = jnp.where(alive & hasHit, ndy, dy)
      dz = jnp.where(alive & hasHit, ndz, dz)
      pw = jnp.where(alive & hasHit, newPw, pw)
      medium = jnp.where(alive & hasHit, newMedium, medium)
      return (ox, oy, oz, dx, dy, dz, pw, medium, newAliveF, segCount,
              hitN, seqF, tuple(hitBin), tuple(hitW), tuple(hitC),
              tuple(tuple(r) for r in hitRaw))

    carry = (ox, oy, oz, dx, dy, dz, pw, medium, zeroV + 1.0,
             segCount, hitN, seqF, tuple(hitBin), tuple(hitW),
             tuple(hitC), tuple(tuple(r) for r in hitRaw))

    # tile-level bounce early exit: every per-ray update in _bounceBody is
    # masked by `alive`, so once the whole tile is dead the body is exactly
    # the identity — skip it. Typical scenes absorb every ray well before
    # the maxIntersections budget (the bench scene finishes in 4 of 6
    # bounces; reference rays likewise stop at the absorber, ray.py:271-277)
    # so the scalar-core branch saves the full VPU cost of the dead tail.
    # EARLY_EXIT selects the mechanism (hardware Mosaic support for scalar
    # branching over large carries varies): 'cond' guards each unrolled
    # bounce with lax.cond, 'while' rolls into a lax.while_loop with an
    # any-alive condition, 'none' keeps the unconditional round-2 loops.
    def _anyAlive(c):
      return jnp.sum(c[8]) > 0.

    if nUniformInputs:
      # deterministic-uniform test seam: distinct input refs per draw —
      # keep the plain python unroll (the seam's reference computation
      # consumes the same refs unconditionally)
      for _b in range(maxIntersections):
        carry = _bounceBody(carry, _setForBounce(_b))
    else:
      # hybrid loop: unroll the first K = unrollBounces bounces plainly
      # (best static scheduling; the rolled loop costs ~1.5x per bounce),
      # then run the [K, maxIntersections) tail in the early-exit rolled
      # loop — on typical scenes every ray is dead by bounce K, so the
      # tail's while_loop exits immediately and deep budgets are free.
      # Bounce 0 sweeps only the source-reachable surface set when the
      # caller supplied an emission bound (_firstBounceSurfs).
      K = min(int(unrollBounces), maxIntersections)
      for _b in range(K):
        sset = _setForBounce(_b)
        if EARLY_EXIT == 'cond':
          carry = lax.cond(_anyAlive(carry),
                           lambda c, ss=sset: _bounceBody(c, ss),
                           lambda c: c, carry)
        else:
          carry = _bounceBody(carry, sset)
      if maxIntersections > K:
        if EARLY_EXIT == 'while':
          carry = lax.while_loop(
              lambda ic: (ic[0] < maxIntersections) & _anyAlive(ic[1]),
              lambda ic: (ic[0] + 1, _bounceBody(ic[1])),
              (jnp.int32(K), carry))[1]
        elif EARLY_EXIT == 'cond':
          carry = lax.fori_loop(
              K, maxIntersections,
              lambda _i, c: lax.cond(_anyAlive(c), _bounceBody,
                                     lambda x: x, c),
              carry)
        else:
          carry = lax.fori_loop(K, maxIntersections,
                                lambda _i, c: _bounceBody(c), carry)
    (_ox, _oy, _oz, _dx, _dy, _dz, pw, _medium, _aliveF, segCount,
     hitN, _seqF, hitBin, hitW, hitC, hitRaw) = carry
    hitBin, hitW, hitC = list(hitBin), list(hitW), list(hitC)
    hitRaw = [list(r) for r in hitRaw]

    overflow = jnp.maximum(hitN - float(hitSlots), 0.)
    if rawRecords:
      ringCols = [hitBin, hitW, hitC] + hitRaw
      for k in range(9):
        for slot in range(hitSlots):
          rawOut_refs[k][slot][:] = ringCols[k][slot]
      segOut_ref[:] = segCount
      ovfOut_ref[:] = overflow
      return
    if histRows is None:
      for slot in range(hitSlots):
        binOut_refs[slot][:] = hitBin[slot]
        wOut_refs[slot][:] = hitW[slot]
        cOut_refs[slot][:] = hitC[slot]
      segOut_ref[:] = segCount
      ovfOut_ref[:] = overflow
      return

    # ---- in-kernel histogram: factorized one-hot matmuls on the MXU ----
    # hitBin = row * W + col with row in [0, histRows); invalid rays carry
    # hitBin = -1 -> rowF = -1 matches no iota row, so their one-hot row is
    # all-zero and they contribute nothing (no masking needed).  The ray
    # weights ride INSIDE the row one-hot (bf16: exact 0/1 structure, ~0.5%
    # rounding on the power values — far below Monte-Carlo shot noise; the
    # counts one-hot is exact).
    nRows = hitBin[0].shape[0]
    iR = lax.broadcasted_iota(jnp.int32, (histRows, 128), 0) \
        .astype(jnp.float32)
    iC = lax.broadcasted_iota(jnp.int32, (W, 128), 0).astype(jnp.float32)
    accP = jnp.zeros((histRows, W), jnp.float32)
    accC = jnp.zeros((histRows, W), jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    for slot in range(hitSlots):
      rowF = jnp.floor(hitBin[slot] * (1.0 / W))
      colF = hitBin[slot] - rowF * W
      for r in range(nRows):
        mR = iR == rowF[r:r + 1, :]
        ohRw = jnp.where(mR, hitW[slot][r:r + 1, :], 0.0) \
            .astype(jnp.bfloat16)
        ohRc = jnp.where(mR, hitC[slot][r:r + 1, :], 0.0) \
            .astype(jnp.bfloat16)
        ohC = jnp.where(iC == colF[r:r + 1, :], 1.0, 0.0) \
            .astype(jnp.bfloat16)
        accP = accP + lax.dot_general(ohRw, ohC, dn,
                                      preferred_element_type=jnp.float32)
        accC = accC + lax.dot_general(ohRc, ohC, dn,
                                      preferred_element_type=jnp.float32)
    acc = jnp.concatenate([accP, accC], axis=1)
    # the hist block is revisited by every grid step (TPU grids run
    # sequentially): initialize on the first step, accumulate after
    if sweepSpec is not None:
      # batched sweep: this variant's (D*H, 2W) rows live at a dynamic
      # offset in the stacked (V*D*H, 2W) block; the one-hot binning above
      # stays LOCAL (histRows = D*H), so binning cost does not scale with
      # the variant count. The variant's FIRST tile initializes its block.
      blk = pl.ds(_sweepCell['vI'] * histRows, histRows)

      @pl.when(_sweepCell['localPid'] == 0)
      def _():
        hist_ref[blk, :] = acc

      @pl.when(_sweepCell['localPid'] > 0)
      def _():
        hist_ref[blk, :] = hist_ref[blk, :] + acc
    else:
      i = pl.program_id(0)

      @pl.when(i == 0)
      def _():
        hist_ref[:, :] = acc

      @pl.when(i > 0)
      def _():
        hist_ref[:, :] = hist_ref[:, :] + acc
    segOut_ref[:] = segCount
    ovfOut_ref[:] = overflow

  return kernel


def _bitmapOkConst(r, B, u, v):
  '''UV-bitmap trim test (trim0 == 2) inside the kernel: the face occupancy
  bitmap rides as a bit-packed (C, R) VMEM input (byte values, 8 bits per
  f32 — exact in bf16) and is sampled GATHERLESSLY per ray via the same
  per-sublane-row one-hot MXU matmul pattern as the in-kernel histogram:
  row one-hot x packed-mask matmul picks the pixel row's bytes, a column
  one-hot selects the byte, and the bit is peeled arithmetically. Pixel
  index math is bit-identical to the XLA path's _maskLookup
  (geometry/surfaces.py — both use chartAtan2 for azimuth charts).
  Cost: ~R*C MACs/ray per lookup (~4.6k at R=192) — ~7% of the in-kernel
  histogram matmul — paid only by bitmap-trimmed surfaces.'''
  R, C = r['maskRes'], B.shape[0]
  pu = (u - r['trim1']) * r['trim3']
  pv = (v - r['trim2']) * r['trim4']
  iu = jnp.floor(pu)
  iv = jnp.floor(pv)
  ju = jnp.floor(iu * 0.125)
  ub = iu - 8. * ju
  inWin = (pu >= 0) & (pu < float(R)) & (pv >= 0) & (pv < float(R))
  Bc = B.astype(jnp.bfloat16)
  iR = lax.broadcasted_iota(jnp.int32, (R, 128), 0).astype(jnp.float32)
  iC = lax.broadcasted_iota(jnp.int32, (C, 128), 0).astype(jnp.float32)
  dn = (((1,), (0,)), ((), ()))
  rowsOut = []
  for rI in range(u.shape[0]):
    ohV = jnp.where(iR == iv[rI:rI + 1, :], 1.0, 0.0).astype(jnp.bfloat16)
    M1 = lax.dot_general(Bc, ohV, dn, preferred_element_type=jnp.float32)
    ohU = jnp.where(iC == ju[rI:rI + 1, :], 1.0, 0.0)
    rowsOut.append(jnp.sum(M1 * ohU, axis=0, keepdims=True))
  byte = jnp.concatenate(rowsOut, axis=0)
  # bit ub of the byte; 2^-ub via exact-constant selects (no exp2 in
  # Mosaic, and float exp would not be exact)
  scale = jnp.full_like(ub, 1. / 128.)
  for k in range(6, -1, -1):
    scale = jnp.where(ub < k + 0.5, 1. / (1 << k), scale)
  b1 = jnp.floor(byte * scale)
  bit = b1 - 2. * jnp.floor(b1 * 0.5)
  return inWin & (bit > 0.5)


def _applyPrimsConst(r, x, y, z, baseOk):
  '''Kernel twin of geometry/surfaces._applyPrims: occupied =
  (base OR any add-prim) AND NOT any hole-prim, with every primitive a
  python-float immediate (flag = shape + 10*isAdd + 20*isInverted; shapes
  1 rect, 2 disc, 3 half-plane, 4 poly2, 5 ellipse — ~5 VPU ops per
  primitive, no VMEM traffic; shape 6 = 3D half-space on the full local
  point).'''
  addHit = None
  holeHit = None
  for flag, cx, cy, p0, p1, ca, sa in r['holePrims']:
    isInv = flag > 15.5
    rem = flag - 20. if isInv else flag
    isAdd = rem > 5.5
    shape = rem - 10. if isAdd else rem
    dxp, dyp = x - cx, y - cy
    if shape > 5.5:
      inP = x * cx + y * cy + z * p0 >= p1
    elif shape > 4.5:
      inP = (cx * x * x + cy * x * y + p0 * y * y
             + p1 * x + ca * y + sa) <= 0.
    elif shape > 3.5:
      xr = ca * dxp + sa * dyp
      yr = -sa * dxp + ca * dyp
      inP = yr <= p0 * xr * xr + p1 * xr
    elif shape > 2.5:
      inP = dxp * p0 + dyp * p1 >= 0
    elif shape > 1.5:
      inP = dxp * dxp + dyp * dyp <= p0
    else:
      xr = ca * dxp + sa * dyp
      yr = -sa * dxp + ca * dyp
      inP = (jnp.abs(xr) <= p0) & (jnp.abs(yr) <= p1)
    if isInv:
      inP = ~inP
    if isAdd:
      addHit = inP if addHit is None else (addHit | inP)
    else:
      holeHit = inP if holeHit is None else (holeHit | inP)
  out = baseOk if addHit is None else (baseOk | addHit)
  if holeHit is not None:
    out = out & ~holeHit
  return out


def _intersectConst(r, ox, oy, oz, dx, dy, dz, tMin, maskVals=(),
                    grpCoords=None, localCoords=None):
  '''Ray-surface distance with the surface's transform/params as python
  float constants (folds into immediates). Bitmap-trimmed surfaces
  (trim0 == 2) test candidate roots against their packed VMEM bitmap in
  maskVals via _bitmapOkConst; hole-primitive surfaces (trim0 == 3/4)
  subtract their holes via _holeFreeConst.
  grpCoords: optional {groupId: 6 group-frame ray coords} hoisted by the
  bounce sweep (_assignXformGroups) — rows carrying a `pick` then derive
  their local frame with free sign/axis picks instead of the 9-FMA
  rotation, bit-identically (signed row copies are exact).
  localCoords: optional (lox, loy, loz, ldx, ldy, ldz) — the caller
  already rotated the ray into the surface frame (the SMEM surface sweep
  does, from scalar-memory rows whose values are TRACED rather than
  python floats; every formula below works for either as long as `kind`
  and `trim0` stay static).'''
  kind = r['kind']
  if localCoords is not None:
    lox, loy, loz, ldx, ldy, ldz = localCoords
  elif r.get('ident'):
    lox, loy, loz, ldx, ldy, ldz = ox, oy, oz, dx, dy, dz
  elif grpCoords is not None and 'pick' in r:
    if r['grp'] < 0:
      go, gd = (ox, oy, oz), (dx, dy, dz)
    else:
      g = grpCoords[r['grp']]
      go, gd = g[:3], g[3:]
    (j0, s0), (j1, s1), (j2, s2) = r['pick']

    def _pk(v, j, s):
      return v[j] if s > 0 else -v[j]

    def _off(v, t):
      return v if t == 0. else v + t

    lox = _off(_pk(go, j0, s0), r['t0'])
    loy = _off(_pk(go, j1, s1), r['t1'])
    loz = _off(_pk(go, j2, s2), r['t2'])
    ldx = _pk(gd, j0, s0)
    ldy = _pk(gd, j1, s1)
    ldz = _pk(gd, j2, s2)
  else:
    lox = r['r00'] * ox + r['r01'] * oy + r['r02'] * oz + r['t0']
    loy = r['r10'] * ox + r['r11'] * oy + r['r12'] * oz + r['t1']
    loz = r['r20'] * ox + r['r21'] * oy + r['r22'] * oz + r['t2']
    ldx = r['r00'] * dx + r['r01'] * dy + r['r02'] * dz
    ldy = r['r10'] * dx + r['r11'] * dy + r['r12'] * dz
    ldz = r['r20'] * dx + r['r21'] * dy + r['r22'] * dz
  if kind == GS.TRIANGLE:
    # Moeller-Trumbore with the triangle's edges as immediates
    # (geometry/surfaces._intersectTriangle twin; triangles are stored in
    # world coords, transform = identity)
    e1x, e1y, e1z = r['triE1']
    e2x, e2y, e2z = r['triE2']
    pvx = ldy * e2z - ldz * e2y
    pvy = ldz * e2x - ldx * e2z
    pvz = ldx * e2y - ldy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    detS = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvx, tvy, tvz = lox - r['p0'], loy - r['p1'], loz - r['p2']
    u = (tvx * pvx + tvy * pvy + tvz * pvz) / detS
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (ldx * qvx + ldy * qvy + ldz * qvz) / detS
    t = (e2x * qvx + e2y * qvy + e2z * qvz) / detS
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > tMin))
    return jnp.where(ok, t, _BIG)
  if kind == GS.PLANE:
    dzS = jnp.where(jnp.abs(ldz) < 1e-12, 1e-12, ldz)
    t = -loz / dzS
    x, y = lox + t * ldx, loy + t * ldy
    if r['trim0'] == 2.:
      ok = _bitmapOkConst(r, maskVals[r['maskSlot']], x, y)
    elif r['trim0'] in (1., 4.):
      ok = (jnp.abs(x) <= r['trim1']) & (jnp.abs(y) <= r['trim2'])
    else:
      r2 = x * x + y * y
      ok = (r2 >= r['trim1'] ** 2) & (r2 <= r['trim2'] ** 2)
    if r['trim0'] in (3., 4.):
      ok = _applyPrimsConst(r, x, y, 0., ok)
    return jnp.where((t > tMin) & ok, t, _BIG)
  if kind in (GS.SPHERE, GS.CYLINDER):
    if kind == GS.SPHERE:
      a = ldx * ldx + ldy * ldy + ldz * ldz
      b = 2 * (lox * ldx + loy * ldy + loz * ldz)
      c = lox * lox + loy * loy + loz * loz - r['p0'] ** 2
    else:
      a = ldx * ldx + ldy * ldy
      b = 2 * (lox * ldx + loy * ldy)
      c = lox * lox + loy * loy - r['p0'] ** 2
    disc = b * b - 4 * a * c
    okD = disc >= 0
    sqD = jnp.sqrt(jnp.maximum(disc, 0.))
    q = -0.5 * (b + jnp.sign(b + 1e-30) * sqD)
    aS = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    qS = jnp.where(jnp.abs(q) < 1e-20, 1e-20, q)
    t1 = q / aS
    t2 = c / qS
    lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    def zOk(t):
      z = loz + t * ldz
      if r['trim0'] == 2.:
        xx, yy = lox + t * ldx, loy + t * ldy
        return _bitmapOkConst(r, maskVals[r['maskSlot']],
                              GS.chartAtan2(yy, xx), z)
      band = (z >= r['trim1']) & (z <= r['trim2'])
      if r['trim0'] == 3.:
        xx, yy = lox + t * ldx, loy + t * ldy
        band = _applyPrimsConst(r, xx, yy, z, band)
      return band
    loV = jnp.where(okD & (lo > tMin) & zOk(lo), lo, _BIG)
    hiV = jnp.where(okD & (hi > tMin) & zOk(hi), hi, _BIG)
    return jnp.minimum(loV, hiV)
  if kind == GS.CONE:
    # |(x, y)| = r0 + z*tanA (geometry/surfaces.py:23-24, mirrors
    # _intersectCone): quadratic with the linear radius term w(t); only
    # the nappe with w >= 0 is real surface, z band from the trim
    r0, tanA = r['p0'], r['p1']
    w0 = r0 + loz * tanA
    wd = ldz * tanA
    a = ldx * ldx + ldy * ldy - wd * wd
    b = 2 * (lox * ldx + loy * ldy - w0 * wd)
    c = lox * lox + loy * loy - w0 * w0
    disc = b * b - 4 * a * c
    okD = disc >= 0
    sqD = jnp.sqrt(jnp.maximum(disc, 0.))
    q = -0.5 * (b + jnp.sign(b + 1e-30) * sqD)
    aS = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    qS = jnp.where(jnp.abs(q) < 1e-20, 1e-20, q)
    t1 = q / aS
    t2 = c / qS
    lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    def coneOk(t):
      z = loz + t * ldz
      if r['trim0'] == 2.:
        xx, yy = lox + t * ldx, loy + t * ldy
        return ((w0 + t * wd >= 0)
                & _bitmapOkConst(r, maskVals[r['maskSlot']],
                                 GS.chartAtan2(yy, xx), z))
      band = ((w0 + t * wd >= 0)
              & (z >= r['trim1']) & (z <= r['trim2']))
      if r['trim0'] == 3.:
        xx, yy = lox + t * ldx, loy + t * ldy
        band = _applyPrimsConst(r, xx, yy, z, band)
      return band
    loV = jnp.where(okD & (lo > tMin) & coneOk(lo), lo, _BIG)
    hiV = jnp.where(okD & (hi > tMin) & coneOk(hi), hi, _BIG)
    return jnp.minimum(loV, hiV)
  if kind == GS.QUADRIC:
    # principal-axis quadric qa x^2 + qb y^2 + qc z^2 + qz z + q0 = 0
    # (geometry/surfaces.py _intersectQuadric): exact quadratic in t,
    # sphere-cost; covers the b-spline faces brep.py refits (ellipsoids
    # from Part::Scale etc.)
    qa, qb, qc, qz, q0 = r['p0'], r['p1'], r['p2'], r['p3'], r['p4']
    a = qa * ldx * ldx + qb * ldy * ldy + qc * ldz * ldz
    b = 2 * (qa * lox * ldx + qb * loy * ldy + qc * loz * ldz) + qz * ldz
    c = (qa * lox * lox + qb * loy * loy + qc * loz * loz
         + qz * loz + q0)
    disc = b * b - 4 * a * c
    okD = disc >= 0
    sqD = jnp.sqrt(jnp.maximum(disc, 0.))
    q = -0.5 * (b + jnp.sign(b + 1e-30) * sqD)
    aS = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    qS = jnp.where(jnp.abs(q) < 1e-20, 1e-20, q)
    t1 = q / aS
    t2 = c / qS
    linT = -c / jnp.where(jnp.abs(b) < 1e-20, 1e-20, b)
    isLin = (jnp.abs(a) < 1e-14 * (jnp.abs(b) + 1e-20)) \
        & (jnp.abs(b) > 1e-20)
    t1 = jnp.where(isLin, linT, t1)
    t2 = jnp.where(isLin, _BIG, t2)
    lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
    okAny = okD | isLin

    def zOkQ(t):
      z = loz + t * ldz
      if r['trim0'] == 2.:
        xx, yy = lox + t * ldx, loy + t * ldy
        return _bitmapOkConst(r, maskVals[r['maskSlot']],
                              GS.chartAtan2(yy, xx), z)
      band = (z >= r['trim1']) & (z <= r['trim2'])
      if r['trim0'] == 3.:
        xx, yy = lox + t * ldx, loy + t * ldy
        band = _applyPrimsConst(r, xx, yy, z, band)
      return band
    loV = jnp.where(okAny & (lo > tMin) & zOkQ(lo), lo, _BIG)
    hiV = jnp.where(okAny & (hi > tMin) & zOkQ(hi), hi, _BIG)
    return jnp.minimum(loV, hiV)
  if kind == GS.ASPHERE:
    c0, kk = r['p0'], r['p1']
    a4, a6, a8 = r['p2'], r['p3'], r['p4']
    dzS = jnp.where(jnp.abs(ldz) < 1e-9,
                    jnp.where(ldz >= 0, 1e-9, -1e-9), ldz)
    t = jnp.maximum(-loz / dzS, 0.)
    if abs(c0) > 1e-12:
      R = 1. / c0
      ocz = loz - R
      b = 2 * (lox * ldx + loy * ldy + ocz * ldz)
      cc = lox * lox + loy * loy + ocz * ocz - R * R
      disc = b * b - 4 * cc
      okD = disc >= 0
      sqD = jnp.sqrt(jnp.maximum(disc, 0.))
      q = -0.5 * (b + jnp.sign(b + 1e-30) * sqD)
      t1, t2 = q, cc / jnp.where(jnp.abs(q) < 1e-20, 1e-20, q)
      lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
      sph = jnp.where(okD & (lo > tMin), lo,
                      jnp.where(okD & (hi > tMin), hi, t))
      t = jnp.where(okD, sph, t)
    for _ in range(16):
      x, y, z = lox + t * ldx, loy + t * ldy, loz + t * ldz
      r2 = x * x + y * y
      rootA = jnp.sqrt(jnp.maximum(1 - (1 + kk) * c0 * c0 * r2, 1e-12))
      sag = c0 * r2 / (1 + rootA) + r2 * r2 * (a4 + r2 * (a6 + r2 * a8))
      g = (c0 * (2 / (1 + rootA)
                 + (1 + kk) * c0 * c0 * r2 / (rootA * (1 + rootA) ** 2))
           + 4 * a4 * r2 + 6 * a6 * r2 * r2 + 8 * a8 * r2 ** 3)
      f = z - sag
      slope = -g * x * ldx - g * y * ldy + ldz
      slope = jnp.where(jnp.abs(slope) < 1e-12,
                        jnp.where(slope >= 0, 1e-12, -1e-12), slope)
      t = t - f / slope
    x, y, z = lox + t * ldx, loy + t * ldy, loz + t * ldz
    r2 = x * x + y * y
    rootA = jnp.sqrt(jnp.maximum(1 - (1 + kk) * c0 * c0 * r2, 1e-12))
    sag = c0 * r2 / (1 + rootA) + r2 * r2 * (a4 + r2 * (a6 + r2 * a8))
    rr = jnp.sqrt(r2)
    if r['trim0'] == 2.:
      trimOk = _bitmapOkConst(r, maskVals[r['maskSlot']],
                              GS.chartAtan2(y, x), rr)
    else:
      trimOk = (rr >= r['trim1']) & (rr <= r['trim2'])
      if r['trim0'] == 3.:
        trimOk = _applyPrimsConst(r, x, y, z, trimOk)
    ok = (t > tMin) & (jnp.abs(z - sag) < 1e-4) & trimOk
    return jnp.where(ok, t, _BIG)
  if kind == GS.TORUS:
    # exact quartic, sharing geometry/surfaces._quarticSmallestRoot /
    # _cubicLargestRoot VERBATIM (branch-free Newton — no acos/cbrt, so
    # Mosaic compiles the same ops and both paths stay bit-identical).
    # R0/rT are python-float immediates; the ray is re-anchored at its
    # closest approach to the torus center and scaled by R0 so the f32
    # quartic coefficients stay conditioned (surfaces._intersectTorus).
    R0, rT = r['p0'], r['p1']
    dd = ldx * ldx + ldy * ldy + ldz * ldz
    ddS = jnp.where(dd < 1e-20, 1e-20, dd)
    tMid = -(lox * ldx + loy * ldy + loz * ldz) / ddS
    stretch = jnp.sqrt(ddS) / R0          # d(tau)/d(t)
    osx = (lox + tMid * ldx) / R0
    osy = (loy + tMid * ldy) / R0
    osz = (loz + tMid * ldz) / R0
    invL = lax.rsqrt(ddS)
    dsx, dsy, dsz = ldx * invL, ldy * invL, ldz * invL
    rr2 = (rT / R0) ** 2
    K = osx * osx + osy * osy + osz * osz + 1. - rr2
    bq = 2. * (osx * dsx + osy * dsy + osz * dsz)
    exy = dsx * dsx + dsy * dsy
    fxy = osx * dsx + osy * dsy
    gxy = osx * osx + osy * osy
    b = 2. * bq
    c = bq * bq + 2. * K - 4. * exy
    dL = 2. * bq * K - 8. * fxy
    e = K * K - 4. * gxy

    def torOk(tau):
      t = tMid + tau / stretch
      x, y, z = lox + t * ldx, loy + t * ldy, loz + t * ldz
      sxy = jnp.sqrt(x * x + y * y)
      g = (sxy - R0) ** 2 + z * z - rT * rT
      okRes = jnp.abs(g) < (2e-3 * rT * rT + 1e-6 * R0 * R0)
      v = GS.chartAtan2(z, sxy - R0)
      if r['trim0'] == 2.:
        trimOk = _bitmapOkConst(r, maskVals[r['maskSlot']],
                                GS.chartAtan2(y, x), v)
      else:
        trimOk = (v >= r['trim1']) & (v <= r['trim2'])
        if r['trim0'] == 3.:
          trimOk = _applyPrimsConst(r, x, y, z, trimOk)
      return okRes & trimOk

    tauMin = (tMin - tMid) * stretch
    tau = GS._quarticSmallestRoot(b, c, dL, e, tauMin, torOk)
    t = tMid + tau / stretch
    return jnp.where(tau < _BIG, t, _BIG)
  raise ValueError(f'unsupported kind {kind}')


# accumulator slots (per winner ray) holding the normal params of its
# surface: disjoint winner masks let every kind reuse the same slots
_NORMAL_SLOTS = {GS.QUADRIC: ('p0', 'p1', 'p2', 'p3'), GS.CONE: ('p1',),
                 GS.ASPHERE: ('p0', 'p1', 'p2', 'p3', 'p4'),
                 GS.TORUS: ('p0',)}


def _normalFromCols(kinds, kindF, a, lx, ly, lz):
  '''Winner-surface local normal from accumulated param COLUMNS: one
  masked pass per surface KIND present in the sweep (vs one pass per
  SURFACE in the round-3 form). Formulas mirror _normalConst exactly;
  every formula is guarded so evaluating it on another kind's local
  coords stays finite before the mask discards it. TRIANGLE rows
  accumulate their constant normal directly into a[0:3].'''
  nlx = jnp.zeros_like(lx)
  nly = jnp.zeros_like(ly)
  nlz = jnp.zeros_like(lz)
  for kind in kinds:
    m = kindF == float(kind)
    if kind == GS.PLANE:
      nx, ny, nz = (jnp.zeros_like(lx), jnp.zeros_like(ly),
                    jnp.ones_like(lz))
    elif kind == GS.TRIANGLE:
      nx, ny, nz = a[0], a[1], a[2]
    elif kind == GS.SPHERE:
      inv = lax.rsqrt(lx * lx + ly * ly + lz * lz + 1e-20)
      nx, ny, nz = lx * inv, ly * inv, lz * inv
    elif kind == GS.CYLINDER:
      inv = lax.rsqrt(lx * lx + ly * ly + 1e-20)
      nx, ny, nz = lx * inv, ly * inv, jnp.zeros_like(lz)
    elif kind == GS.QUADRIC:
      n0 = 2 * a[0] * lx
      n1 = 2 * a[1] * ly
      n2 = 2 * a[2] * lz + a[3]
      inv = lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-20)
      nx, ny, nz = n0 * inv, n1 * inv, n2 * inv
    elif kind == GS.CONE:
      rr = jnp.sqrt(lx * lx + ly * ly)
      rS = jnp.where(rr < 1e-12, 1e-12, rr)
      n0, n1, n2 = lx / rS, ly / rS, -a[0]
      inv = lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-20)
      nx, ny, nz = n0 * inv, n1 * inv, n2 * inv
    elif kind == GS.ASPHERE:
      c0, kk = a[0], a[1]
      a4, a6, a8 = a[2], a[3], a[4]
      r2 = lx * lx + ly * ly
      rootA = jnp.sqrt(jnp.maximum(1 - (1 + kk) * c0 * c0 * r2, 1e-12))
      g = (c0 * (2 / (1 + rootA)
                 + (1 + kk) * c0 * c0 * r2 / (rootA * (1 + rootA) ** 2))
           + 4 * a4 * r2 + 6 * a6 * r2 * r2 + 8 * a8 * r2 ** 3)
      inv = lax.rsqrt(g * g * r2 + 1. + 1e-20)
      nx, ny, nz = -g * lx * inv, -g * ly * inv, jnp.ones_like(lz) * inv
    elif kind == GS.TORUS:
      s = jnp.sqrt(lx * lx + ly * ly)
      sS = jnp.where(s < 1e-12, 1e-12, s)
      scale = a[0] / sS
      n0, n1 = lx * (1. - scale), ly * (1. - scale)
      inv = lax.rsqrt(n0 * n0 + n1 * n1 + lz * lz + 1e-20)
      nx, ny, nz = n0 * inv, n1 * inv, lz * inv
    else:
      raise ValueError(f'unsupported kind {kind}')
    nlx = jnp.where(m, nx, nlx)
    nly = jnp.where(m, ny, nly)
    nlz = jnp.where(m, nz, nlz)
  return nlx, nly, nlz


def _normalConst(r, lx, ly, lz):
  kind = r['kind']
  if kind == GS.PLANE:
    return (jnp.zeros_like(lx), jnp.zeros_like(ly), jnp.ones_like(lz))
  if kind == GS.TRIANGLE:
    nx, ny, nz = r['triN']
    return (jnp.full_like(lx, nx), jnp.full_like(ly, ny),
            jnp.full_like(lz, nz))
  if kind == GS.SPHERE:
    inv = lax.rsqrt(lx * lx + ly * ly + lz * lz + 1e-20)
    return lx * inv, ly * inv, lz * inv
  if kind == GS.CYLINDER:
    inv = lax.rsqrt(lx * lx + ly * ly + 1e-20)
    return lx * inv, ly * inv, jnp.zeros_like(lz)
  if kind == GS.QUADRIC:
    nx = 2 * r['p0'] * lx
    ny = 2 * r['p1'] * ly
    nz = 2 * r['p2'] * lz + r['p3']
    inv = lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    return nx * inv, ny * inv, nz * inv
  if kind == GS.CONE:
    # radial out, tipped by -tanA along z (batch_tracer.py:125-129)
    rr = jnp.sqrt(lx * lx + ly * ly)
    rS = jnp.where(rr < 1e-12, 1e-12, rr)
    nx, ny, nz = lx / rS, ly / rS, jnp.full_like(lz, -r['p1'])
    inv = lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    return nx * inv, ny * inv, nz * inv
  if kind == GS.ASPHERE:
    c0, kk = r['p0'], r['p1']
    a4, a6, a8 = r['p2'], r['p3'], r['p4']
    r2 = lx * lx + ly * ly
    rootA = jnp.sqrt(jnp.maximum(1 - (1 + kk) * c0 * c0 * r2, 1e-12))
    g = (c0 * (2 / (1 + rootA)
               + (1 + kk) * c0 * c0 * r2 / (rootA * (1 + rootA) ** 2))
         + 4 * a4 * r2 + 6 * a6 * r2 * r2 + 8 * a8 * r2 ** 3)
    inv = lax.rsqrt(g * g * r2 + 1. + 1e-20)
    return -g * lx * inv, -g * ly * inv, jnp.ones_like(lz) * inv
  if kind == GS.TORUS:
    # geometric: (p - tube-circle center) / r (surfaces.normalLocal)
    s = jnp.sqrt(lx * lx + ly * ly)
    sS = jnp.where(s < 1e-12, 1e-12, s)
    scale = r['p0'] / sS
    nx, ny = lx * (1. - scale), ly * (1. - scale)
    inv = lax.rsqrt(nx * nx + ny * ny + lz * lz + 1e-20)
    return nx * inv, ny * inv, lz * inv
  raise ValueError(f'unsupported kind {kind}')


def _assignXformGroups(surfRows):
  '''Attach signed-permutation transform-group metadata to surface rows.

  geometry/transforms.snapSignedPermGroups snapped the scene table so that
  rotations of one rigid part's faces are EXACT (bit-level) signed row
  copies of a shared base rotation. Each non-identity row whose rotation
  rows match a base's rows up to sign gets:

    grp     — group key: -1 = the world frame (entries all 0/+-1),
              else an id shared by every member of the group;
    grpBase — the base rotation as a 9-tuple (only on grp >= 0 rows);
    pick    — ((srcAxis, sign) x3): local axis i = sign*groupCoord[srcAxis].

  The kernel's bounce sweep rotates the ray into each group frame ONCE and
  derives member locals with free sign/axis picks — bit-identical to the
  per-surface 9-FMA rotation because (-a)*x + (-b)*y == -(a*x + b*y)
  exactly in IEEE arithmetic. Rows keep r00..r22/t0..t2 for the winner-
  attribute pass. Unmatched rows become their own group (same op count as
  the inline form), so this is never a pessimization.'''
  ident = ((1., 0., 0.), (0., 1., 0.), (0., 0., 1.))
  bases = []                                   # [(gid, 3x3 row tuples)]
  for row in surfRows:
    if row.get('ident'):
      continue
    rows3 = ((row['r00'], row['r01'], row['r02']),
             (row['r10'], row['r11'], row['r12']),
             (row['r20'], row['r21'], row['r22']))
    for g, base in [(-1, ident)] + bases:
      pick = []
      for i in range(3):
        hit = None
        for j in range(3):
          if rows3[i] == base[j]:
            hit = (j, 1.)
            break
          if rows3[i] == tuple(-x for x in base[j]):
            hit = (j, -1.)
            break
        if hit is None:
          break
        pick.append(hit)
      if len(pick) == 3:
        row['grp'] = g
        row['pick'] = tuple(pick)
        if g >= 0:
          row['grpBase'] = bases[g][1]
        break
    else:
      gid = len(bases)
      bases.append((gid, rows3))
      row['grp'] = gid
      row['grpBase'] = rows3
      row['pick'] = ((0, 1.), (1, 1.), (2, 1.))


_SMEM_SURF_KINDS = (GS.PLANE, GS.SPHERE, GS.CYLINDER, GS.CONE, GS.QUADRIC)


def _sceneRows(scene, histSpec, smemTris=False, smemSurfs=False):
  '''Extract python-float scene constants (host side; scene arrays must be
  concrete). Returns (surfRows, elemRows, maskConsts): bitmap-trimmed
  surfaces (trim0 == 2, geometry/brep.py UV occupancy bitmaps) carry their
  chart map in trim1..trim4 plus a `maskSlot` index into maskConsts — a
  list of bit-packed (R, ceil(R/8)) float32 byte matrices fed to the
  kernel as VMEM inputs and sampled by _bitmapOkConst.
  smemTris=True splits every TRIANGLE surface out of surfRows into a
  (nTri, 11) float32 table [v0(3), e1(3), e2(3), elemF, orient] in WORLD
  coordinates, for the kernel's SMEM-looped mesh sweep (meshes past the
  ~128-triangle immediates budget).
  smemSurfs=True additionally splits every closed-form ANALYTIC surface of
  a simple kind (plane/sphere/cylinder/cone/quadric) with a window trim
  into a (nRows, 21) float32 table [rot(9), off(3), orient, elemF,
  p0..p4, trim1, trim2] plus FOUR parts (_chunkSurfRows): plain runs
  [(kind, trim0, start, stop)], Morton-chunk AABBs, and chunked runs
  [(kind, trim0, chunkStart, chunkStop, rowStart)] for the kernel's
  broad-phase-culled SMEM surface sweep (assemblies past the 256-surface
  immediates budget, round-4 verdict #5; chunk cull round 5). Rows with
  bitmap trims, hole prims, aspheres and tori stay immediates.
  Each returned row carries `sceneIdx` (its index in the scene's surface
  table) so callers can remap per-scene-index masks onto row positions.'''
  surf = scene['surfaces']
  S = numSurfacesStatic(scene)
  packed = np.asarray(surf['packed'], dtype=float)
  trims = np.asarray(surf['trim'], dtype=float)
  kinds = np.asarray(surf['kind'])
  maskStack = (np.asarray(surf['trimMasks'])
               if 'trimMasks' in surf else None)
  maskIdx = (np.asarray(surf['trimMaskIdx'])
             if 'trimMaskIdx' in surf else None)
  maskConsts = []
  maskSlotOf = {}
  surfRows = []
  smemTriRows = []
  smemSurfRows = []                     # [(kind, trim0, 21-col row)]
  for s in range(S):
    p = packed[s]
    row = dict(
        sceneIdx=s,
        kind=int(kinds[s]),
        r00=float(p[0]), r01=float(p[1]), r02=float(p[2]),
        r10=float(p[3]), r11=float(p[4]), r12=float(p[5]),
        r20=float(p[6]), r21=float(p[7]), r22=float(p[8]),
        t0=float(p[9]), t1=float(p[10]), t2=float(p[11]),
        orient=float(p[12]), elemF=float(p[13]),
        p0=float(p[15]), p1=float(p[16]), p2=float(p[17]),
        p3=float(p[18]), p4=float(p[19]), p5=float(p[20]),
        p6=float(p[21]), p7=float(p[22]), p8=float(p[23]),
        trim0=float(trims[s, 0]), trim1=float(trims[s, 1]),
        trim2=float(min(trims[s, 2], _BIG)),
        # raw (unclamped) window for the host-side bounding-sphere cull
        _rawTrim=(float(trims[s, 1]), float(trims[s, 2])),
    )
    row['ident'] = bool(
        np.allclose(p[0:9], np.eye(3).reshape(-1), atol=1e-12)
        and np.allclose(p[9:12], 0., atol=1e-12))
    if row['kind'] == GS.TRIANGLE:
      v0 = np.array([row['p0'], row['p1'], row['p2']])
      v1 = np.array([row['p3'], row['p4'], row['p5']])
      v2 = np.array([row['p6'], row['p7'], row['p8']])
      if smemTris:
        if not row['ident']:
          # vertices live in the row's LOCAL frame; the SMEM sweep works
          # world-frame, so map them out through the inverse transform
          Rm = np.array([[row['r00'], row['r01'], row['r02']],
                         [row['r10'], row['r11'], row['r12']],
                         [row['r20'], row['r21'], row['r22']]])
          tv = np.array([row['t0'], row['t1'], row['t2']])
          v0 = Rm.T @ (v0 - tv)
          v1 = Rm.T @ (v1 - tv)
          v2 = Rm.T @ (v2 - tv)
        smemTriRows.append(np.concatenate([
            v0, v1 - v0, v2 - v0, [row['elemF'], row['orient']]]))
        continue
      e1 = v1 - v0
      e2 = v2 - v0
      nT = np.cross(e1, e2)
      nT = nT / max(np.linalg.norm(nT), 1e-30)
      row['triE1'] = tuple(float(x) for x in e1)
      row['triE2'] = tuple(float(x) for x in e2)
      row['triN'] = tuple(float(x) for x in nT)
    if row['trim0'] == 2.:
      if maskStack is None:
        raise ValueError('bitmap trim flag without trimMasks in the scene')
      row['trim3'] = float(trims[s, 3])
      row['trim4'] = float(trims[s, 4])
      mi = int(maskIdx[s])
      if mi not in maskSlotOf:
        maskSlotOf[mi] = len(maskConsts)
        maskConsts.append(_packMaskBits(maskStack[mi]))
      row['maskSlot'] = maskSlotOf[mi]
      row['maskRes'] = int(maskStack[mi].shape[0])
    elif row['trim0'] in (3., 4.):
      # hole primitives (geometry/surfaces.py trim codes 3/4) baked as
      # python-float immediates: ~5 VPU ops per hole in the kernel
      pr = np.asarray(scene['surfaces']['trimPrims'], dtype=float)[s]
      row['holePrims'] = tuple(tuple(float(x) for x in hole)
                               for hole in pr if hole[0] > 0.5)
    if smemSurfs and row['kind'] in _SMEM_SURF_KINDS \
        and row['trim0'] in (0., 1.):
      smemSurfRows.append((row['kind'], row['trim0'], np.array([
          row['r00'], row['r01'], row['r02'], row['r10'], row['r11'],
          row['r12'], row['r20'], row['r21'], row['r22'],
          row['t0'], row['t1'], row['t2'], row['orient'], row['elemF'],
          row['p0'], row['p1'], row['p2'], row['p3'], row['p4'],
          row['trim1'], row['trim2']], dtype=np.float32),
          _boundingSphere(row)))
      continue
    surfRows.append(row)
  _assignXformGroups(surfRows)
  ep = np.asarray(scene['elements']['packed'], dtype=float)
  elemToDet = np.asarray(histSpec['elemToDet'])
  boundsArr = np.asarray(histSpec['bounds'])
  # dispersion n(lambda) rows fitted as per-element Horner polynomials in a
  # scaled wavelength (Sellmeier-like curves fit to <1e-5 at deg<=10);
  # evaluated ONCE per kernel call (wavelength is constant per ray), so a
  # dispersive scene costs ~deg FMAs per dispersive element, not per bounce
  nPolys = _dispersionPolys(scene)
  elemRows = []
  for e in range(ep.shape[0]):
    det = int(elemToDet[e])
    b = boundsArr[det] if det >= 0 else np.array([0., 1., 0., 1.])
    absLen = float(ep[e, 3])
    elemRows.append(dict(
        optF=float(ep[e, 0]), n=float(ep[e, 1]), refl=float(ep[e, 2]),
        absLen=absLen if np.isfinite(absLen) else _BIG,
        rec=float(ep[e, 10]), detF=float(det),
        nPoly=nPolys.get(e),
        bx0=float(b[0]), bx1=float(b[1]), by0=float(b[2]), by1=float(b[3]),
        gratType=float(ep[e, 4]), gratLpm=float(max(ep[e, 5], 1e-9)),
        gratDirX=float(ep[e, 6]), gratDirY=float(ep[e, 7]),
        gratDirZ=float(ep[e, 8]), gratOrder=float(ep[e, 9])))
  out = [surfRows, elemRows, maskConsts]
  if smemTris:
    triTable = (np.asarray(smemTriRows, dtype=np.float32)
                if smemTriRows else np.zeros((0, 11), np.float32))
    triTable, chunkTable = _chunkTriangles(triTable)
    out += [triTable, chunkTable]
  if smemSurfs:
    out += list(_chunkSurfRows(smemSurfRows))
  return tuple(out)


def _dummySurfRow(kind, trim0):
  '''A 21-col SMEM surface row that can never be hit (empty trim window,
  well-conditioned params) — pads chunked runs to a fixed _SURF_CHUNK
  stride so the kernel's survivor loop uses a constant row stride.'''
  t1, t2 = (-1., -1.) if trim0 == 1. else (2., 1.)
  return np.array([1., 0., 0., 0., 1., 0., 0., 0., 1.,   # identity rot
                   0., 0., 0., 1., 0.,                    # off, orient, elem
                   1., 1., 0., 0., 0.,                    # p0..p4
                   t1, t2], dtype=np.float32)


def _chunkSurfRows(smemSurfRows):
  '''Pack sorted (kind, trim0, row, boundingSphere) entries into the SMEM
  surface table plus the kernel's sweep structure. Runs longer than
  _SURF_CHUNK whose members all have bounding spheres are Morton-ordered
  and chunked with per-chunk world AABBs (center +- radius), padded to a
  fixed _SURF_CHUNK stride with never-hit dummy rows; the kernel's scalar
  broad-phase then slab-tests each chunk against every alive ray and
  sweeps survivors only (the triangle-chunk mechanism, round-5: the
  surf_wall class measured 0.067 G seg/s with the flat 522-row sweep).
  Returns (surfTable, plainRuns, chunkBoxes, chunkRuns):
    plainRuns: ((kind, trim0, rowStart, rowStop), ...) swept fully
    chunkBoxes: (nChunks, 6) f32 AABBs
    chunkRuns: ((kind, trim0, chunkStart, chunkStop, rowStart), ...) —
      chunk c of a run covers rows [rowStart + (c - chunkStart) *
      _SURF_CHUNK, +_SURF_CHUNK).'''
  smemSurfRows = sorted(smemSurfRows, key=lambda e: (e[0], e[1]))
  grouped = []
  for ent in smemSurfRows:
    if grouped and grouped[-1][0] == ent[0] and grouped[-1][1] == ent[1]:
      grouped[-1][2].append(ent)
    else:
      grouped.append((ent[0], ent[1], [ent]))
  tableRows, plainRuns, chunkBoxes, chunkRuns = [], [], [], []
  for kind, trim0, entries in grouped:
    bss = [e[3] for e in entries]
    if len(entries) > _SURF_CHUNK and all(b is not None for b in bss):
      cen = np.array([b[0] for b in bss], np.float64)
      rho = np.array([b[1] for b in bss], np.float64)
      order = _mortonOrder(cen)
      entries = [entries[i] for i in order]
      cen, rho = cen[order], rho[order]
      rowStart, c0 = len(tableRows), len(chunkBoxes)
      nCh = -(-len(entries) // _SURF_CHUNK)
      for c in range(nCh):
        s = slice(c * _SURF_CHUNK, min((c + 1) * _SURF_CHUNK,
                                       len(entries)))
        lo = (cen[s] - rho[s, None]).min(0)
        hi = (cen[s] + rho[s, None]).max(0)
        pad = 1e-5 * max(1., float(np.abs(np.stack([lo, hi])).max()))
        chunkBoxes.append(np.concatenate([lo - pad, hi + pad]))
        rows = [e[2] for e in entries[s]]
        rows += [_dummySurfRow(kind, trim0)] * (_SURF_CHUNK - len(rows))
        tableRows += rows
      chunkRuns.append((kind, trim0, c0, c0 + nCh, rowStart))
    else:
      rowStart = len(tableRows)
      tableRows += [e[2] for e in entries]
      plainRuns.append((kind, trim0, rowStart, rowStart + len(entries)))
  surfTable = (np.stack(tableRows).astype(np.float32)
               if tableRows else np.zeros((0, 21), np.float32))
  boxes = (np.stack(chunkBoxes).astype(np.float32)
           if chunkBoxes else np.zeros((0, 6), np.float32))
  return surfTable, tuple(plainRuns), boxes, tuple(chunkRuns)


def _mortonOrder(cen):
  '''Stable Morton (Z-curve) ordering of (n, 3) points — spatially close
  rows land in the same chunk so per-chunk AABBs stay tight.'''
  cen = np.asarray(cen, np.float64)
  lo, hi = cen.min(0), cen.max(0)
  span = np.maximum(hi - lo, 1e-12)
  q = np.clip(((cen - lo) / span * 1023.).astype(np.int64), 0, 1023)

  def spread(x):
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x

  code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
  return np.argsort(code, kind='stable')


def _chunkTriangles(triTable):
  '''Morton-order the (nTri, 11) world-frame triangle table by centroid
  and build per-chunk (_TRI_CHUNK rows) world AABBs for the kernel's
  scalar broad-phase cull. Returns (reordered table, (nChunks, 6) f32
  [lox loy loz hix hiy hiz]); a single-chunk mesh returns an empty chunk
  table (the cull is pure overhead there).'''
  n = len(triTable)
  if n <= _TRI_CHUNK:
    return triTable, np.zeros((0, 6), np.float32)
  v0 = triTable[:, 0:3].astype(np.float64)
  v1 = v0 + triTable[:, 3:6]
  v2 = v0 + triTable[:, 6:9]
  cen = (v0 + v1 + v2) / 3.
  order = _mortonOrder(cen)
  triTable = triTable[order]
  v0, v1, v2 = v0[order], v1[order], v2[order]
  nChunks = -(-n // _TRI_CHUNK)
  chunks = np.zeros((nChunks, 6), np.float64)
  for c in range(nChunks):
    s = slice(c * _TRI_CHUNK, min((c + 1) * _TRI_CHUNK, n))
    pts = np.concatenate([v0[s], v1[s], v2[s]])
    pad = 1e-5 * max(1., float(np.abs(pts).max()))
    chunks[c, :3] = pts.min(0) - pad
    chunks[c, 3:] = pts.max(0) + pad
  return triTable, chunks.astype(np.float32)


def _packMaskBits(mask):
  '''(R, R) uint8 occupancy bitmap -> (C, R) float32 byte matrix with
  C = ceil(R/8): entry [c, k] holds bits [8c, 8c+8) of pixel row k,
  LSB-first. Transposed so the kernel's row-gather is a natural
  (C, R) @ (R, 128) MXU matmul. Byte values <= 255 are exact in bf16, so
  the one-hot matmul (_bitmapOkConst) loses no bits even at default MXU
  precision.'''
  R = mask.shape[0]
  C = -(-mask.shape[1] // 8)
  padded = np.zeros((R, C * 8), dtype=np.uint32)
  padded[:, :mask.shape[1]] = (mask > 0)
  weights = (1 << np.arange(8, dtype=np.uint32))
  return (padded.reshape(R, C, 8) * weights).sum(axis=2) \
      .astype(np.float32).T.copy()


def _dispersionPolys(scene, deg=12, tol=2e-5):
  '''{elemIdx: (mid, half, coeffsAscending)} for dispersive elements, or
  raise if a row cannot be fitted to `tol` (callers gate eligibility via
  dispersionFitsInKernel).'''
  elements = scene['elements']
  if 'nTable' not in elements:
    return {}
  lam = np.asarray(elements['nLambda'], dtype=float)
  nTab = np.asarray(elements['nTable'], dtype=float)
  hasDisp = np.asarray(elements['hasDispersion'])
  mid, half = (lam[0] + lam[-1]) / 2., max((lam[-1] - lam[0]) / 2., 1e-9)
  s = (lam - mid) / half
  out = {}
  for e in range(nTab.shape[0]):
    if not hasDisp[e]:
      continue
    for d in range(4, deg + 1, 2):
      c = np.polyfit(s, nTab[e], d)
      if np.abs(np.polyval(c, s) - nTab[e]).max() <= tol:
        out[e] = (float(mid), float(half),
                  tuple(float(x) for x in c[::-1]))
        break
    else:
      raise ValueError(f'dispersion row of element {e} cannot be fitted '
                       f'to {tol} by a degree-{deg} polynomial')
  return out


def dispersionFitsInKernel(scene):
  '''True when every dispersive n(lambda) row fits the in-kernel
  polynomial representation.'''
  try:
    _dispersionPolys(scene)
    return True
  except ValueError:
    return False


def _staticMasks(scene):
  '''(surfAllowed, seqSpec) compile-time constants from the scene's
  per-source surface mask and sequential-mode mask (reference:
  find.py:79-104). surfAllowed: sorted surface list or None (= all);
  disallowed surfaces never emit intersection code. seqSpec:
  (nStages, {surface: allowed-stage tuple}) driving the kernel's PER-RAY
  sequence index (the XLA twin: batch_tracer.bounceBatch seqMask/seqInc),
  or None when the scene has no seqMask.'''
  S = numSurfacesStatic(scene)
  surfMask = np.ones(S, dtype=bool)
  if 'surfMask' in scene:
    surfMask = np.asarray(scene['surfMask']).astype(bool)
  seqSpec = None
  if 'seqMask' in scene:
    seq = np.asarray(scene['seqMask']).astype(bool)
    Q = seq.shape[0]
    stages = {s: tuple(q for q in range(Q) if seq[q, s]) for s in range(S)}
    seqSpec = (Q, stages)
    # surfaces allowed at no stage at all can be dropped entirely
    surfMask &= np.array([len(stages[s]) > 0 for s in range(S)])
  allowed = None if surfMask.all() \
      else sorted(s for s in range(S) if surfMask[s])
  return allowed, seqSpec


def autoHitSlots(scene, histSpec, maxIntersections):
  '''Topology-derived hit-slot count: per recording element, the number of
  possible passes is 1 for an absorber (the ray dies there) and
  1 + (number of OTHER reflective elements) otherwise — a ray can only
  re-cross a pass-through detector after being turned around (reference
  records EVERY pass, ray.py:276-277). Capped at 6 slots (VMEM) and at
  maxIntersections; the kernel's `hitOverflow` counter reports any dropped
  passes beyond the cap.'''
  from ..tracing.element_table import EP_GRATTYPE
  opts = np.asarray(scene['elements']['optType'])
  ep = np.asarray(scene['elements']['packed'])
  elemToDet = np.asarray(histSpec['elemToDet'])
  reflective = (opts == MIRROR) | ((opts == GRATING)
                                   & (ep[:, EP_GRATTYPE] == 0))
  nReflect = int(reflective.sum())
  bound = 0
  for e in np.nonzero(elemToDet >= 0)[0]:
    if opts[e] == ABSORBER:
      bound += 1
    else:
      bound += 1 + nReflect - int(reflective[e])
  return max(1, min(maxIntersections, bound, 6))


def _beamCullSets(surfRows, elemRows, scatterConsts, emissionBound,
                  maxIntersections, surfAllowed, unrollK,
                  triTable=None, surfTable=None):
  '''Per-bounce candidate sets from conservative beam propagation
  (ops/beam_cull, round-4 verdict #3). Returns (bounceSets, tailSurfs,
  unrollK): sets for the python-unrolled bounce prefix, the union set for
  the rolled tail, and the unroll depth — EXTENDED past _shouldUnroll's
  scene-wide budget while the culled sets keep the cumulative op count
  (sum of per-bounce set sizes) inside the same UNROLL_BUDGET, so deeply
  culled scenes unroll further at no extra compile cost.

  SMEM-split geometry (triangle / scalar-table surfaces) is invisible to
  the propagation; if any of it can CHANGE ray directions
  (mirror/lens/grating/scatter elements), only bounce 0 keeps its set.
  Absorbing/vacuum SMEM geometry is safe (see beam_cull docstring).'''
  from . import beam_cull
  smemElems = set()
  if triTable is not None and len(triTable):
    smemElems |= {int(x) for x in np.unique(triTable[:, 9])}
  if surfTable is not None and len(surfTable):
    smemElems |= {int(x) for x in np.unique(surfTable[:, 13])}
  scatterElems = {int(c[0]) for c in (scatterConsts or ())}
  unsafe = any(float(elemRows[e]['optF']) not in (float(ABSORBER),
                                                  float(VACUUM))
               or e in scatterElems for e in smemElems)
  sets = beam_cull.propagateBounceSets(
      surfRows, elemRows, scatterConsts, emissionBound, maxIntersections,
      allowed=surfAllowed, unsafeAfterBounce0=unsafe,
      boundingSphere=_boundingSphere)
  nFull = len(surfRows) if surfAllowed is None else len(surfAllowed)
  sizeOf = lambda ss: nFull if ss is None else len(ss)
  spent = sum(sizeOf(ss) for ss in sets[:unrollK])
  while (unrollK < maxIntersections and sets[unrollK] is not None
         and len(sets[unrollK]) < nFull
         and spent + len(sets[unrollK]) <= UNROLL_BUDGET):
    spent += len(sets[unrollK])
    unrollK += 1
  tail = set()
  tailSurfs = []
  for ss in sets[unrollK:]:
    if ss is None:
      tailSurfs = None
      break
    tail |= set(ss)
  if tailSurfs is not None:
    tailSurfs = sorted(tail)
  return sets, tailSurfs, unrollK


def makePallasTraceStep(scene, histSpec, generator, raysPerStep,
                        maxIntersections, maxRayLength, distTol,
                        powerTol=1e-6, stratified=False, tile='auto',
                        histPrecision='default', hitSlots='auto',
                        sampler=None, innerSteps=1, jitWrap=True,
                        interpret=False, uniformProvider='prng',
                        emissionBound=None, tileStratified='auto'):
  '''Build the fused sample + pallas-trace + histogram step:
  (key, histograms) -> (histograms, counters). Requires pallasEligible.
  histPrecision: matmul precision of the MXU binning pass — 'default'
  (bf16, ~0.5% per-bin power error, fastest), 'high', or 'highest'
  (f32-exact); counts are exact at every setting.  With 'default' and a
  modest histogram (D*H rows <= 2048, W a lane multiple) the binning runs
  INSIDE the trace kernel (one-hots stay in VMEM, per-ray outputs never
  touch HBM); otherwise it runs XLA-side (ops/histogram.py matmul, or a
  scatter for very large histograms).

  The histograms argument is DONATED: rebind it each call
  (`hist, counters = step(key, hist)`). The old reference is deleted —
  reading it raises "Array has been deleted"; passing it back into a jit
  is undefined. Donation lets XLA update the carried histograms in place;
  without it each step pays device copies that serialize with the kernel
  (~1.9 ms/step at 256x256 bins).'''
  H, W = histSpec['bins']
  D = int(np.asarray(histSpec['bounds']).shape[0])
  inKernelHist = (histPrecision == 'default' and D * H <= 2048
                  and D * H % 8 == 0 and W % 128 == 0
                  and D * H * 2 * W * 4 <= (4 << 20))
  if hitSlots == 'auto':
    hitSlots = autoHitSlots(scene, histSpec, maxIntersections)
  from ..tracing.batch_tracer import scatterConstants
  scatterConsts = scatterConstants(scene)
  if tile == 'auto':
    # biggest power-of-2 tile dividing the step that keeps the live state
    # inside a ~16 MB VMEM budget: larger tiles amortize grid/PRNG/DMA
    # bookkeeping (8192 -> 1031 M seg/s vs 131072 -> 1181 M seg/s on the
    # bench scene, v5e). Live (rows, 128) f32 arrays: ray state +
    # per-surface distances + hit-slot rings (+ per-ray outputs off the
    # in-kernel-histogram path).
    nSurf = numSurfacesStatic(scene)
    # the single-pass argmin sweep keeps 4 selection arrays live instead
    # of one distance per surface (see _bounceBody)
    live = 26 + 3 * hitSlots + (0 if inKernelHist else 4) \
        + (14 if scatterConsts else 0)
    tailK = _shouldUnroll(scene, maxIntersections)
    hasLoopTail = tailK < maxIntersections
    if EARLY_EXIT == 'cond' or (EARLY_EXIT == 'while' and hasLoopTail):
      # the early-exit loops double-buffer the carry on the VMEM stack
      # (lax.while_loop keeps current+next carries live; lax.cond both
      # branch results; observed: 17.3M/20.2M scoped allocations vs the
      # 16M limit at the unguarded tile)
      live *= 2
    maxRows = max(64, (16 << 20) // (live * 128 * 4) // 64 * 64)
    tile = TILE
    trims0 = np.asarray(scene['surfaces']['trim'])[:, 0]
    if (trims0 == 2.).any():
      # bitmap trims: the VMEM gather (_bitmapOkConst) unrolls one MXU
      # matmul per sublane row per lookup per bounce — cap the tile so the
      # Mosaic op count (and compile time) stays bounded
      while tile > 2048 and raysPerStep % (tile // 2) == 0:
        tile //= 2
    # Mosaic compile time scales with the unrolled op count (rows x
    # surfaces x bounces: a 26-surface 8-bounce unroll at rows=512 took
    # >15 min). Small scenes keep the round-2 configuration (python
    # unroll + tiles up to the VMEM budget — big tiles are worth ~+15%);
    # larger scenes cap the tile at rows=128 and roll the bounce loop.
    smallScene = nSurf * maxIntersections <= 80 and not (trims0 == 2.).any()
    tileCap = maxRows * 128 if smallScene else 16384
    if EARLY_EXIT == 'while':
      # rolled while-loop tiles: 16384 measured fastest (2.44 G seg/s on
      # the bench scene vs 2.29 at 32768 and 1.99 at 65536 — the
      # double-buffered carry near the VMEM stack limit degrades big
      # tiles long before it OOMs)
      tileCap = min(tileCap, 16384)
    # many-surface scenes prefer SMALL tiles twice over: (a) VMEM — the
    # per-surface distance state blows the stack past ~100 surfaces at
    # 16384-ray tiles (measured OOM at 128 x 16384 and 192 x 8192); (b)
    # early exit — smaller tiles go all-dead sooner, and the per-bounce
    # sweep they skip costs ~nSurf (example 2, 26 surfaces: 0.45 G seg/s
    # at 4096 vs 0.39 at 16384; the 5-surface bench scene prefers 16384)
    if nSurf > 16:
      surfTileCap = 4096
    else:
      surfTileCap = tileCap
    tileCap = min(tileCap, surfTileCap)
    while tile > surfTileCap and tile > 128 \
        and raysPerStep % (tile // 2) == 0:
      tile //= 2
    while tile * 2 <= min(raysPerStep, tileCap) \
        and raysPerStep % (tile * 2) == 0 and not (trims0 == 2.).any():
      tile *= 2
    # small batches (e.g. a per-shard slice of a sharded step): shrink the
    # tile to divide raysPerStep instead of erroring
    while tile > 128 and raysPerStep % tile:
      tile //= 2
  if raysPerStep % tile:
    raise ValueError(f'raysPerStep must be a multiple of {tile}')
  # 2-D (rows, 128) tiles — Mosaic mishandles 1-D i1 vectors
  rows = tile // 128
  totalRows = raysPerStep // 128
  grid = (raysPerStep // tile,)
  if stratified:
    sampler = None    # latin-hypercube draws stay on the XLA side
  # deterministic-uniform testing seam: number of VMEM uniform inputs the
  # kernel consumes instead of the on-core PRNG (which the Mosaic
  # interpreter stubs to zeros; see _makeKernel). Draw order: sampler
  # (first, phi), scatter lobe (u1, u2), modify (u3, u4).
  if uniformProvider == 'input':
    lobeC = [c for c in (scatterConsts or ()) if c[1] in (0, 1, 2)]
    modsC = [c for c in (scatterConsts or ()) if c[1] == 3]
    # continuous lobes draw 2 per bounce; +2 when any entry carries
    # discrete Dirac events (the kernel's conditional u3/u4 draws)
    perBounce = lambda cs: (0 if not cs else
                            2 + (2 if any(c[4] or c[5] for c in cs) else 0))
    # sampler draws once; scatter draws fresh uniforms EVERY bounce
    samplerDraws = 0 if sampler is None \
        else (5 if sampler.get('type') == 'surface' else 2)
    nUniform = (samplerDraws
                + (perBounce(lobeC) + perBounce(modsC))
                * maxIntersections)
  else:
    nUniform = 0
  nTriScene = int((np.asarray(scene['surfaces']['kind'])
                   == GS.TRIANGLE).sum())
  useSmemTris = nTriScene > 128
  nAnalytic = numSurfacesStatic(scene) - nTriScene
  useSmemSurfs = nAnalytic > 256
  parts = _sceneRows(scene, histSpec, smemTris=useSmemTris,
                     smemSurfs=useSmemSurfs)
  surfRows, elemRows, maskConsts = parts[:3]
  triTable = chunkTable = None
  k = 3
  if useSmemTris:
    triTable, chunkTable = parts[3:5]
    k = 5
  surfTable, surfRuns, surfChunkTable, surfChunkRuns = \
      (parts[k:k + 4] if useSmemSurfs else (None, (), None, ()))
  nTriChunks = 0 if chunkTable is None else len(chunkTable)
  nSurfChunks = 0 if surfChunkTable is None else len(surfChunkTable)
  surfAllowed, seqSpec = _staticMasks(scene)
  # _staticMasks indexes the SCENE surface table; surfRows omit the
  # SMEM-split surfaces, so remap mask indices onto row POSITIONS
  posOf = {r['sceneIdx']: p for p, r in enumerate(surfRows)}
  if surfAllowed is not None:
    surfAllowed = sorted(posOf[s] for s in surfAllowed if s in posOf)
  if seqSpec is not None:
    nStages, stages = seqSpec
    seqSpec = (nStages, {posOf[s]: stages[s] for s in stages
                         if s in posOf})
  firstSurfs = None
  bounceSets = tailSurfs = None
  unrollK = _shouldUnroll(scene, maxIntersections)
  if emissionBound is not None:
    firstSurfs = _firstBounceSurfs(surfRows, emissionBound)
    if BEAM_CULL:
      bounceSets, tailSurfs, unrollK = _beamCullSets(
          surfRows, elemRows, scatterConsts, emissionBound,
          maxIntersections, surfAllowed, unrollK,
          triTable=triTable, surfTable=surfTable)
  # tile-stratified point-source sampling (see _sampleRays docstring):
  # each tile draws its (theta, phi) quantiles from its own stratum of a
  # G1 x G2 latin decomposition — unbiased, variance-reducing, and it
  # makes every tile a narrow angular wedge, so (a) chunk-culled SMEM
  # geometry skips most chunks per tile and (b) tiles die COHERENTLY by
  # angle, so the all-dead early exit fires bounces sooner (interleaved
  # v5e A/B, round 5: example 2 0.98 -> 1.30 G, headline 2.90 -> 2.96,
  # 200-tri dish neutral). 'auto' therefore enables it for every
  # point-source in-kernel sampler whose grid decomposes; opt out via
  # tileStratified=False.
  nGridTiles = raysPerStep // tile
  if (sampler is not None and sampler.get('type') != 'surface'
      and nGridTiles > 1 and tileStratified in (True, 'auto')):
    k2 = max(int(nGridTiles).bit_length() - 1, 0) // 2
    G2 = 1 << k2
    G1 = nGridTiles // G2
    if G1 * G2 == nGridTiles:
      sampler = dict(sampler, tileStrata=(int(G1), int(G2)))
  kernel = _makeKernel(surfRows, elemRows, histSpec['elemToDet'],
                       histSpec['bounds'], (H, W), maxIntersections,
                       float(maxRayLength), float(distTol), float(powerTol),
                       histRows=D * H if inKernelHist else None,
                       hitSlots=hitSlots,
                       surfAllowed=surfAllowed, seqSpec=seqSpec,
                       sampler=sampler, scatterConsts=scatterConsts,
                       nUniformInputs=nUniform, nMasks=len(maskConsts),
                       nTriSMEM=0 if triTable is None else len(triTable),
                       nTriChunks=nTriChunks,
                       nSurfSMEM=0 if surfTable is None else len(surfTable),
                       surfRuns=surfRuns, nSurfChunks=nSurfChunks,
                       surfChunkRuns=surfChunkRuns, firstSurfs=firstSurfs,
                       bounceSets=bounceSets, tailSurfs=tailSurfs,
                       unrollBounces=unrollK)
  spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
  seedSpec = pl.BlockSpec(memory_space=pltpu.SMEM)
  inSpecs = [] if sampler is not None else [spec] * 8
  if nUniform:
    inSpecs += [spec] * nUniform
  elif sampler is not None or scatterConsts:
    inSpecs = inSpecs + [seedSpec]
  # bit-packed trim bitmaps: whole-array VMEM inputs, same block every
  # grid step (scene constants; see _sceneRows/_bitmapOkConst)
  maskInputs = tuple(jnp.asarray(m) for m in maskConsts)
  inSpecs += [pl.BlockSpec(m.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for m in maskConsts]
  if triTable is not None:
    maskInputs = maskInputs + (jnp.asarray(triTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  if nTriChunks > 1:
    maskInputs = maskInputs + (jnp.asarray(chunkTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  if surfTable is not None and len(surfTable):
    maskInputs = maskInputs + (jnp.asarray(surfTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  if nSurfChunks:
    maskInputs = maskInputs + (jnp.asarray(surfChunkTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  scratch = ([pltpu.SMEM((nTriChunks,), jnp.int32)]
             if nTriChunks > 1 else []) \
      + ([pltpu.SMEM((nSurfChunks,), jnp.int32)] if nSurfChunks else [])
  if inKernelHist:
    histSpecBlock = pl.BlockSpec((D * H, 2 * W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    traceCall = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=inSpecs,
        out_specs=[histSpecBlock, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((D * H, 2 * W), jnp.float32),
                   jax.ShapeDtypeStruct((totalRows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((totalRows, 128), jnp.float32)],
        scratch_shapes=scratch,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )
  else:
    nOut = 3 * hitSlots + 2
    traceCall = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=inSpecs,
        out_specs=[spec] * nOut,
        out_shape=[jax.ShapeDtypeStruct((totalRows, 128),
                                        jnp.float32)] * nOut,
        scratch_shapes=scratch,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

  # donating the carried histograms lets XLA update them in place; without
  # it each step pays two f32[D,H,W] copies that serialize with the kernel
  def _oneStep(key, histograms):
    def tiled(x):
      return x.reshape(totalRows, 128)

    if sampler is not None:
      if nUniform:
        us = jax.random.uniform(jax.random.fold_in(key, 0x0177),
                                (nUniform, totalRows, 128))
        inputs = tuple(us[i] for i in range(nUniform))
      else:
        # one int32 seed per step; tiles decorrelate via program_id
        inputs = (jax.random.randint(key, (1,), 0, 2 ** 31 - 1,
                                     dtype=jnp.int32),)
    else:
      # the generator consumes the RAW key so the same key produces the
      # same rays as the XLA paths (the exact-equality cross-checks in
      # tests/test_pallas_tpu.py depend on it)
      batch = generator(key, raysPerStep, stratified=stratified)
      if 'ox' in batch:   # column-form generator
        wlCol = batch.get('wl')
        if wlCol is None:
          wlCol = jnp.zeros_like(batch['pw'])
        elif jnp.ndim(wlCol) == 0:
          wlCol = jnp.full_like(batch['pw'], wlCol)
        cols = (batch['ox'], batch['oy'], batch['oz'],
                batch['dx'], batch['dy'], batch['dz'], batch['pw'], wlCol)
      else:
        o, d = batch['origins'], batch['directions']
        cols = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                batch['powers'], batch['wavelengths'])
      inputs = tuple(tiled(x) for x in cols)
      if nUniform:
        us = jax.random.uniform(jax.random.fold_in(key, 0x0177),
                                (nUniform, totalRows, 128))
        inputs = inputs + tuple(us[i] for i in range(nUniform))
      elif scatterConsts:
        # fold_in decorrelates the in-kernel scatter stream from the
        # ray-generation draws on the same key
        inputs = inputs + (jax.random.randint(
            jax.random.fold_in(key, 0x5ca7), (1,), 0, 2 ** 31 - 1,
            dtype=jnp.int32),)
    inputs = inputs + maskInputs
    if inKernelHist:
      delta, segs, ovf = traceCall(*inputs)
      hist = dict(
          power=histograms['power'] + delta[:, :W].reshape(D, H, W),
          counts=histograms['counts'] + delta[:, W:].reshape(D, H, W))
      hits = jnp.sum(delta[:, W:]).astype(jnp.int32)
    else:
      outs = traceCall(*inputs)
      segs = outs[3 * hitSlots]
      ovf = outs[3 * hitSlots + 1]
      flat = jnp.stack([histograms['power'].reshape(-1),
                        histograms['counts'].reshape(-1)], axis=-1)
      hits = jnp.zeros((), jnp.int32)
      for slot in range(hitSlots):
        binF = outs[slot].reshape(-1)
        w = outs[hitSlots + slot].reshape(-1)
        c = outs[2 * hitSlots + slot].reshape(-1)
        flatIdx = jnp.where(binF >= 0, binF, 0.).astype(jnp.int32)
        valid = binF >= 0
        payload = jnp.stack([jnp.where(valid, w, 0.),
                             jnp.where(valid, c, 0.)], axis=-1)
        # binning: the XLA scatter costs a flat ~17 ns/update (~17 ms/step
        # at 1M rays, the step's former dominant cost); the factorized
        # one-hot matmul (ops/histogram.py) does the same accumulation on
        # the MXU in ~3.6 ms whenever the detector-row count is modest
        if histogram.matmulWorthwhile(D * H, W, raysPerStep):
          flat = flat + histogram.matmulAccumulate(
              flatIdx, payload, D * H, W, precision=histPrecision)
        else:
          flat = flat.at[flatIdx].add(payload)
        hits = hits + jnp.sum(valid.astype(jnp.int32))
      hist = dict(power=flat[:, 0].reshape(D, H, W),
                  counts=flat[:, 1].reshape(D, H, W))
    counters = dict(segments=jnp.sum(segs).astype(jnp.int32),
                    hits=hits,
                    hitOverflow=jnp.sum(ovf).astype(jnp.int32),
                    escaped=jnp.zeros((), jnp.int32))
    return hist, counters

  if not jitWrap:
    # raw traced function for embedding in an outer transform (shard_map in
    # parallel/sharded.py); the caller owns jit/donation
    return _oneStep
  if innerSteps <= 1:
    return jax.jit(_oneStep, donate_argnums=(1,))

  # amortize the per-dispatch host/relay overhead (~2 ms/call on the axon
  # relay — comparable to the 1M-ray kernel itself) by scanning innerSteps
  # kernel launches inside ONE jit; counters return summed
  @partial(jax.jit, donate_argnums=(1,))
  def stepScan(key, histograms):
    keys = jax.random.split(key, innerSteps)

    def body(hist, k):
      hist, counters = _oneStep(k, hist)
      return hist, counters

    hist, counters = lax.scan(body, histograms, keys)
    return hist, jax.tree.map(lambda x: jnp.sum(x, axis=0), counters)

  return stepScan


class PallasSweepUnavailable(Exception):
  '''The batched-variant sweep cannot ride the Pallas kernel for this
  parameter set (caller falls back to the jitted XLA lax.map path).'''


def makePallasSweepStep(hostScenes, histBounds, bins, samplerSpec,
                        raysPerVariant, maxIntersections, maxRayLength,
                        distTol, powerTol=1e-6, interpret=False,
                        tile='auto', geomMode=False):
  '''Batched parameter sweep THROUGH the Pallas kernel (round-4 verdict
  #1, option (a)): every variant's VARYING surfaces ride one stacked
  (V * rowsPerVariant, 21) SMEM table; the grid is variant-major
  (V * tilesPerVariant steps) and each tile offsets its SMEM row reads
  and histogram rows by its variant id, so ONE compiled kernel traces
  every variant at in-kernel speed (the jitted XLA lax.map fallback runs
  ~25 M seg/s; this kernel runs the scene's normal 0.5-3 G seg/s class).
  Tiles seed and stratify by the WITHIN-variant tile id — every variant
  traces the identical ray set (common random numbers), so metric
  differences between variants are pure geometry, the property a
  `ParameterSweeper.optimize` probe loop wants.

  hostScenes: [(hostSceneDict, info), ...] compiled with devicePut=False,
  structurally identical (the _evaluateBatchedFast contract). Surfaces
  numerically identical across variants stay python-float immediates;
  varying ones must be SMEM-able (plane/sphere/cylinder/cone/quadric,
  window trims) or PallasSweepUnavailable raises. Requires an in-kernel
  sampler spec (identical sources) and an in-kernel-histogram-sized
  binning (D*H % 8 == 0, W <= 128 or W % 128 == 0).

  Returns (step, packTables): `step(key, surfTable)` ->
  (power (V, D, H, W), counts (V, D, H, W), segments) jitted;
  `packTables(hostScenes)` -> the (V * rowsPerVariant, 21) f32 numpy
  table for the CURRENT variant values (the step is cached on structure,
  the table is data).'''
  from ..tracing import fused as _fused
  from ..tracing.batch_tracer import scatterConstants

  V = len(hostScenes)
  if V < 2:
    raise PallasSweepUnavailable('needs >= 2 variants')
  host0, info0 = hostScenes[0]
  if not pallasEligible(host0):
    raise PallasSweepUnavailable(pallasIneligibleReason(host0))
  histSpec = _fused.makeHistogramSpec(host0, info0, bounds=histBounds,
                                      bins=bins)
  H, W = bins
  D = int(np.asarray(histSpec['bounds']).shape[0])
  if (D * H) % 8 or D * H > 2048 // 1:
    raise PallasSweepUnavailable(f'histogram rows D*H={D * H} not '
                                 f'8-aligned or too large')
  if W <= 128 and 128 % W == 0:
    Wk = 128
  elif W % 128 == 0:
    Wk = W
  else:
    raise PallasSweepUnavailable(f'W={W} not a 128-divisor or '
                                 f'lane-aligned')
  if V * D * H > 2048 or V * D * H * 2 * Wk * 4 > (4 << 20):
    raise PallasSweepUnavailable('stacked histogram exceeds the VMEM '
                                 'budget')
  if samplerSpec is None or samplerSpec.get('type') == 'surface':
    raise PallasSweepUnavailable('needs an in-kernel point-source sampler')
  surfAllowed, seqSpec = _staticMasks(host0)
  if surfAllowed is not None or seqSpec is not None:
    raise PallasSweepUnavailable('per-source masks / sequential mode')

  partsV = [_sceneRows(h, histSpec) for h, _i in hostScenes]
  if any(len(p[2]) for p in partsV):
    raise PallasSweepUnavailable('bitmap trims')
  rows0, elemRows = partsV[0][0], partsV[0][1]
  nS = len(rows0)
  if any(len(p[0]) != nS for p in partsV):
    raise PallasSweepUnavailable('surface counts differ')
  for p in partsV[1:]:
    for e0, e1 in zip(elemRows, p[1]):
      if any(not np.array_equal(e0[k], e1[k]) for k in e0
             if k != 'nPoly') or e0['nPoly'] != e1['nPoly']:
        raise PallasSweepUnavailable('element rows differ across variants')

  _PACK = ('r00', 'r01', 'r02', 'r10', 'r11', 'r12', 'r20', 'r21', 'r22',
           't0', 't1', 't2', 'orient', 'elemF', 'p0', 'p1', 'p2', 'p3',
           'p4', 'trim1', 'trim2')

  def _rowVec(r):
    return np.array([r[k] for k in _PACK], dtype=np.float32)

  varyingIdx = []
  for s in range(nS):
    vecs = [_rowVec(p[0][s]) for p in partsV]
    kinds = {p[0][s]['kind'] for p in partsV}
    trims = {p[0][s]['trim0'] for p in partsV}
    if len(kinds) > 1 or len(trims) > 1:
      raise PallasSweepUnavailable('surface kinds/trims differ')
    if all(np.array_equal(vecs[0], v) for v in vecs[1:]):
      continue
    r = partsV[0][0][s]
    if r['kind'] not in _SMEM_SURF_KINDS or r['trim0'] not in (0., 1.) \
        or r.get('holePrims'):
      raise PallasSweepUnavailable(
          f'varying surface {s} (kind {r["kind"]}, trim {r["trim0"]}) '
          f'is not SMEM-able')
    varyingIdx.append(s)
  if not varyingIdx and not geomMode:
    raise PallasSweepUnavailable('no varying surfaces (nothing to sweep)')
  # stable (kind, trim0) ordering -> contiguous static-formula runs
  varyingIdx.sort(key=lambda s: (rows0[s]['kind'], rows0[s]['trim0'], s))
  rowsPerVariant = len(varyingIdx)
  if rowsPerVariant > SMEM_SURF_LIMIT or \
      V * rowsPerVariant * 21 > 20790:
    raise PallasSweepUnavailable('stacked SMEM table exceeds the '
                                 'compiler budget')
  surfRuns = []
  for j, s in enumerate(varyingIdx):
    k, t0 = rows0[s]['kind'], rows0[s]['trim0']
    if surfRuns and surfRuns[-1][0] == k and surfRuns[-1][1] == t0:
      surfRuns[-1] = (k, t0, surfRuns[-1][2], j + 1)
    else:
      surfRuns.append((k, t0, j, j + 1))
  sharedRows = [r for s, r in enumerate(rows0) if s not in set(varyingIdx)]

  def packTables(hostScenesNow):
    parts = [_sceneRows(h, histSpec) for h, _i in hostScenesNow]
    rows = [_rowVec(p[0][s]) for p in parts for s in varyingIdx]
    return (np.stack(rows) if rows else np.zeros((0, 21), np.float32))

  scatterConsts = scatterConstants(host0)
  if tile == 'auto':
    tile = 4096 if len(sharedRows) + rowsPerVariant > 16 else 8192
  # the in-kernel sampler draws per tile, so the variant's ray count
  # rounds UP to a whole number of tiles (callers get >= the rays asked)
  raysPerVariant = -(-int(raysPerVariant) // tile) * tile
  tilesPerVariant = raysPerVariant // tile
  rows = tile // 128
  sampler = dict(samplerSpec)
  if tilesPerVariant > 1:
    k2 = max(int(tilesPerVariant).bit_length() - 1, 0) // 2
    G2 = 1 << k2
    G1 = tilesPerVariant // G2
    if G1 * G2 == tilesPerVariant:
      sampler['tileStrata'] = (int(G1), int(G2))
  hitSlots = autoHitSlots(host0, histSpec, maxIntersections)
  kernel = _makeKernel(
      sharedRows, elemRows, histSpec['elemToDet'], histSpec['bounds'],
      (H, Wk), maxIntersections, float(maxRayLength), float(distTol),
      float(powerTol), histRows=D * H, hitSlots=hitSlots,
      sampler=sampler, scatterConsts=scatterConsts,
      nSurfSMEM=V * rowsPerVariant, surfRuns=tuple(surfRuns),
      unrollBounces=_shouldUnroll(host0, maxIntersections),
      sweepSpec=dict(V=V, tilesPerVariant=tilesPerVariant,
                     rowsPerVariant=rowsPerVariant, DH=D * H,
                     geom=bool(geomMode)))
  grid = (V * tilesPerVariant,)
  totalRows = V * raysPerVariant // 128
  spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
  histBlock = pl.BlockSpec((V * D * H, 2 * Wk), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
  smem = pl.BlockSpec(memory_space=pltpu.SMEM)
  inSpecs = [smem] + ([smem] if rowsPerVariant else []) \
      + ([smem] if geomMode else [])
  traceCall = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=inSpecs,
      out_specs=[histBlock, spec, spec],
      out_shape=[jax.ShapeDtypeStruct((V * D * H, 2 * Wk), jnp.float32),
                 jax.ShapeDtypeStruct((totalRows, 128), jnp.float32),
                 jax.ShapeDtypeStruct((totalRows, 128), jnp.float32)],
      interpret=(pltpu.InterpretParams() if interpret else False),
  )
  colFold = Wk // W

  @jax.jit
  def step(key, surfTable, geomTable=None):
    seed = jax.random.randint(key, (1,), 0, 2 ** 31 - 1, dtype=jnp.int32)
    args = (seed,)
    if rowsPerVariant:
      args += (surfTable.astype(jnp.float32),)
    if geomMode:
      args += (geomTable.astype(jnp.float32),)
    hist, segs, _ovf = traceCall(*args)
    power = hist[:, :Wk].reshape(V, D, H, W, colFold).sum(-1)
    counts = hist[:, Wk:].reshape(V, D, H, W, colFold).sum(-1)
    return power, counts, jnp.sum(segs)

  return step, packTables


def makePallasRawStep(scene, histSpec, generator, raysPerStep,
                      maxIntersections, maxRayLength, distTol,
                      hitSlots='auto', sampler=None, tile='auto',
                      interpret=False, uniformProvider='prng',
                      emissionBound=None):
  '''Build `(key) -> records`: RAW per-hit rows from the kernel's hit-slot
  ring in batch_tracer-records form — slot-major (hitSlots, N) arrays
  recordHit / hitElem / point / direction / power / isEntering plus the
  per-ray `segValid` proxy (segments) and `hitOverflow`. The output feeds
  simulation.runner.compactRecordsToHits -> ResultsStore.addHitBatch
  unchanged, lifting stored per-hit runs off the full XLA records path
  (per-bounce (B, N) HBM round-trips) onto the fused kernel (reference
  per-hit storage contract: results_store.py:348-460). Semantics match
  batch_tracer.bounceBatch records: EVERY recording-element hit is kept
  (no histogram-bounds gating), direction is the INCOMING direction and
  power the pre-interaction power at the hit.'''
  H = W = 1                                    # binning unused in raw mode
  if hitSlots == 'auto':
    hitSlots = autoHitSlots(scene, histSpec, maxIntersections)
  from ..tracing.batch_tracer import scatterConstants
  scatterConsts = scatterConstants(scene)
  trims0 = np.asarray(scene['surfaces']['trim'])[:, 0]
  if tile == 'auto':
    nSurf = numSurfacesStatic(scene)
    live = 22 + nSurf + 9 * hitSlots + (14 if scatterConsts else 0)
    if EARLY_EXIT in ('cond', 'while'):
      live *= 2              # double-buffered loop carry (see trace step)
    maxRows = max(64, (16 << 20) // (live * 128 * 4) // 64 * 64)
    # many-surface VMEM caps, as measured for the trace step
    surfTileCap = 4096 if nSurf > 16 else 16384
    tile = TILE
    while tile > 2048 and (raysPerStep % (tile // 2) == 0) \
        and ((trims0 == 2.).any() or tile > surfTileCap
             or tile * 128 > maxRows * 128):
      tile //= 2
    while tile * 2 <= min(raysPerStep, maxRows * 128, 16384, surfTileCap) \
        and raysPerStep % (tile * 2) == 0 and not (trims0 == 2.).any():
      tile *= 2
    while tile > 128 and raysPerStep % tile:
      tile //= 2
  if raysPerStep % tile:
    raise ValueError(f'raysPerStep must be a multiple of {tile}')
  rows = tile // 128
  totalRows = raysPerStep // 128
  grid = (raysPerStep // tile,)
  if uniformProvider == 'input':
    lobeC = [c for c in (scatterConsts or ()) if c[1] in (0, 1, 2)]
    modsC = [c for c in (scatterConsts or ()) if c[1] == 3]
    perBounce = lambda cs: (0 if not cs else
                            2 + (2 if any(c[4] or c[5] for c in cs) else 0))
    samplerDraws = 0 if sampler is None \
        else (5 if sampler.get('type') == 'surface' else 2)
    nUniform = (samplerDraws
                + (perBounce(lobeC) + perBounce(modsC)) * maxIntersections)
  else:
    nUniform = 0
  nTriScene = int((np.asarray(scene['surfaces']['kind'])
                   == GS.TRIANGLE).sum())
  useSmemTris = nTriScene > 128
  nAnalytic = numSurfacesStatic(scene) - nTriScene
  useSmemSurfs = nAnalytic > 256
  parts = _sceneRows(scene, histSpec, smemTris=useSmemTris,
                     smemSurfs=useSmemSurfs)
  surfRows, elemRows, maskConsts = parts[:3]
  triTable = chunkTable = None
  k = 3
  if useSmemTris:
    triTable, chunkTable = parts[3:5]
    k = 5
  surfTable, surfRuns, surfChunkTable, surfChunkRuns = \
      (parts[k:k + 4] if useSmemSurfs else (None, (), None, ()))
  nTriChunks = 0 if chunkTable is None else len(chunkTable)
  nSurfChunks = 0 if surfChunkTable is None else len(surfChunkTable)
  surfAllowed, seqSpec = _staticMasks(scene)
  posOf = {r['sceneIdx']: p for p, r in enumerate(surfRows)}
  if surfAllowed is not None:
    surfAllowed = sorted(posOf[s] for s in surfAllowed if s in posOf)
  if seqSpec is not None:
    nStages, stages = seqSpec
    seqSpec = (nStages, {posOf[s]: stages[s] for s in stages
                         if s in posOf})
  powerTol = float(scene.get('powerTol', 1e-6))
  firstSurfs = None
  bounceSets = tailSurfs = None
  unrollK = _shouldUnroll(scene, maxIntersections)
  if emissionBound is not None:
    firstSurfs = _firstBounceSurfs(surfRows, emissionBound)
    if BEAM_CULL:
      bounceSets, tailSurfs, unrollK = _beamCullSets(
          surfRows, elemRows, scatterConsts, emissionBound,
          maxIntersections, surfAllowed, unrollK,
          triTable=triTable, surfTable=surfTable)
  kernel = _makeKernel(surfRows, elemRows, histSpec['elemToDet'],
                       histSpec['bounds'], (H, W), maxIntersections,
                       float(maxRayLength), float(distTol), powerTol,
                       histRows=None, hitSlots=hitSlots,
                       surfAllowed=surfAllowed, seqSpec=seqSpec,
                       sampler=sampler, scatterConsts=scatterConsts,
                       nUniformInputs=nUniform, nMasks=len(maskConsts),
                       rawRecords=True,
                       nTriSMEM=0 if triTable is None else len(triTable),
                       nTriChunks=nTriChunks,
                       nSurfSMEM=0 if surfTable is None else len(surfTable),
                       surfRuns=surfRuns, nSurfChunks=nSurfChunks,
                       surfChunkRuns=surfChunkRuns, firstSurfs=firstSurfs,
                       bounceSets=bounceSets, tailSurfs=tailSurfs,
                       unrollBounces=unrollK)
  spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
  seedSpec = pl.BlockSpec(memory_space=pltpu.SMEM)
  inSpecs = [] if sampler is not None else [spec] * 8
  if nUniform:
    inSpecs += [spec] * nUniform
  elif sampler is not None or scatterConsts:
    inSpecs = inSpecs + [seedSpec]
  maskInputs = tuple(jnp.asarray(m) for m in maskConsts)
  inSpecs += [pl.BlockSpec(m.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for m in maskConsts]
  if triTable is not None:
    maskInputs = maskInputs + (jnp.asarray(triTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  if nTriChunks > 1:
    maskInputs = maskInputs + (jnp.asarray(chunkTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  if surfTable is not None and len(surfTable):
    maskInputs = maskInputs + (jnp.asarray(surfTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  if nSurfChunks:
    maskInputs = maskInputs + (jnp.asarray(surfChunkTable),)
    inSpecs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
  nOut = 9 * hitSlots + 2
  traceCall = pl.pallas_call(
      kernel, grid=grid, in_specs=inSpecs, out_specs=[spec] * nOut,
      out_shape=[jax.ShapeDtypeStruct((totalRows, 128),
                                      jnp.float32)] * nOut,
      scratch_shapes=(([pltpu.SMEM((nTriChunks,), jnp.int32)]
                       if nTriChunks > 1 else [])
                      + ([pltpu.SMEM((nSurfChunks,), jnp.int32)]
                         if nSurfChunks else [])),
      interpret=(pltpu.InterpretParams() if interpret else False),
  )
  needSeed = (sampler is not None or scatterConsts) and not nUniform

  @jax.jit
  def step(key):
    def tiled(x):
      return x.reshape(totalRows, 128)

    if sampler is not None:
      if nUniform:
        us = jax.random.uniform(jax.random.fold_in(key, 0x0177),
                                (nUniform, totalRows, 128))
        inputs = tuple(us[i] for i in range(nUniform))
      else:
        inputs = (jax.random.randint(key, (1,), 0, 2 ** 31 - 1,
                                     dtype=jnp.int32),)
    else:
      batch = generator(key, raysPerStep)
      if 'ox' in batch:
        wlCol = batch.get('wl')
        if wlCol is None:
          wlCol = jnp.zeros_like(batch['pw'])
        elif jnp.ndim(wlCol) == 0:
          wlCol = jnp.full_like(batch['pw'], wlCol)
        cols = (batch['ox'], batch['oy'], batch['oz'],
                batch['dx'], batch['dy'], batch['dz'], batch['pw'], wlCol)
      else:
        o, d = batch['origins'], batch['directions']
        cols = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                batch['powers'], batch['wavelengths'])
      inputs = tuple(tiled(x) for x in cols)
      if nUniform:
        us = jax.random.uniform(jax.random.fold_in(key, 0x0177),
                                (nUniform, totalRows, 128))
        inputs = inputs + tuple(us[i] for i in range(nUniform))
      elif scatterConsts:
        inputs = inputs + (jax.random.randint(
            jax.random.fold_in(key, 0x5ca7), (1,), 0, 2 ** 31 - 1,
            dtype=jnp.int32),)
    outs = traceCall(*(inputs + maskInputs))
    flatN = raysPerStep

    def ring(k):
      return jnp.stack([outs[k * hitSlots + s].reshape(flatN)
                        for s in range(hitSlots)])

    elemR = ring(0)
    records = dict(
        recordHit=elemR >= 0,
        hitElem=elemR.astype(jnp.int32),
        power=ring(1),
        isEntering=ring(2) > 0.5,
        point=jnp.stack([ring(3), ring(4), ring(5)], axis=-1),
        direction=jnp.stack([ring(6), ring(7), ring(8)], axis=-1),
    )
    counters = dict(
        segments=jnp.sum(outs[9 * hitSlots].reshape(flatN))
        .astype(jnp.int32),
        hits=jnp.sum(elemR >= 0).astype(jnp.int32),
        hitOverflow=jnp.sum(outs[9 * hitSlots + 1].reshape(flatN))
        .astype(jnp.int32))
    return records, counters

  return step
