'''
Placement / transform math.

Replaces the reference's reliance on FreeCAD `Placement.toMatrix` /
`Matrix.inverse` / `Rotation` arithmetic (reference:
freecad_elements/common.py:112-125, ray.py passim, point_source.py:426-428)
with plain 4x4 affine matrices (host, float64) and Rodrigues rotations
(device, jnp). Placements are rigid (rotation + translation); one object may
occur at several global transforms (App::Link semantics, common.py:36-47) —
the scene compiler simply emits one surface instance per placement.
'''

import numpy as np
import jax.numpy as jnp


def identity():
  return np.eye(4)


def translation(x, y, z):
  m = np.eye(4)
  m[:3, 3] = (x, y, z)
  return m


def rotation(axis, angleDeg):
  '''Right-handed rotation about `axis` by `angleDeg` degrees, as a 4x4
  matrix (FreeCAD `Rotation(axis, angle)` semantics).'''
  axis = np.asarray(axis, dtype=float)
  axis = axis / np.linalg.norm(axis)
  a = np.deg2rad(float(angleDeg))
  c, s = np.cos(a), np.sin(a)
  x, y, z = axis
  K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
  R = np.eye(3) + s * K + (1 - c) * (K @ K)
  m = np.eye(4)
  m[:3, :3] = R
  return m


def placement(position=(0, 0, 0), axis=(0, 0, 1), angleDeg=0.):
  '''FreeCAD-style placement: rotate about axis through the origin, then
  translate to position.'''
  m = rotation(axis, angleDeg)
  m[:3, 3] = position
  return m


def compose(*matrices):
  out = np.eye(4)
  for m in matrices:
    out = out @ np.asarray(m, dtype=float)
  return out


def invert(m):
  return np.linalg.inv(np.asarray(m, dtype=float))


def applyToPoints(m, points):
  '''Apply a 4x4 affine to an (..., 3) array of points (host numpy).'''
  m = np.asarray(m, dtype=float)
  points = np.asarray(points, dtype=float)
  return points @ m[:3, :3].T + m[:3, 3]


def applyToDirections(m, dirs):
  m = np.asarray(m, dtype=float)
  dirs = np.asarray(dirs, dtype=float)
  return dirs @ m[:3, :3].T


def rotRowsOffsets(matrices, dtype=np.float32):
  '''Split a stack of 4x4 matrices into (rot (N,3,3), offset (N,3)) device
  arrays.'''
  # NUMPY outputs on purpose: scene compilation assembles everything on
  # host and transfers once. Returning device arrays here made
  # buildSurfaceTable's np.asarray(..., dtype) round-trips each compile a
  # tiny convert program over the remote-compile link (~16 s EACH — a
  # 6-surface scene.compile took 380 s on the axon relay).
  m = np.asarray(matrices, dtype=float)
  return (m[..., :3, :3].astype(dtype), m[..., :3, 3].astype(dtype))


# ------------------------------------------------------------- device helpers

def rodrigues(v, axis, angle):
  '''Rotate vector(s) v about unit axis by angle (radians); jnp, broadcasts
  over leading axes. Replaces FreeCAD `Rotation(axis, deg) * vec`.'''
  axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
  c = jnp.cos(angle)[..., None] if jnp.ndim(angle) else jnp.cos(angle)
  s = jnp.sin(angle)[..., None] if jnp.ndim(angle) else jnp.sin(angle)
  cross = jnp.cross(axis, v)
  dot = jnp.sum(axis * v, axis=-1, keepdims=True)
  return v * c + cross * s + axis * dot * (1 - c)


def normalize(v, eps=1e-20):
  return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)
