'''
FCStd scene ingest — load the reference workbench's project files directly,
without FreeCAD.

An FCStd file is a zip containing Document.xml with every object's typed
properties. The workbench's own objects (OpticalPointSource /
Optical*Group / OpticalSimulationSettings, created by the reference's
GenericMakeFreecadElement, common.py:332-356) carry all their optics
properties right in the XML, and elementary Part geometry
(Part::Box/Sphere/Cylinder) carries its dimensions — enough to rebuild the
scene as analytic surfaces. Placements compose through App::Part containers
and App::Link instances (multi-placement semantics, common.py:36-109).

Geometry built from sketches/booleans (Part::Cut, Part::Revolution,
PartDesign bodies...) exists only as OpenCASCADE BRep blobs; rebuilding
the exact analytic surfaces would need an OCC kernel, but FreeCAD usually
embeds the display triangulation in the blob — those members load as
triangle meshes (geometry/mesh.py parseBRepTriangulations). Members with
neither a primitive type nor a stored triangulation raise (or are skipped
with `skipUnsupported=True`) with a pointer to the models/mesh APIs.
'''

import io as _io
import xml.etree.ElementTree as ET
import zipfile

import numpy as np

from ..geometry import surfaces as S
from ..utils import io
from .scene import Scene
from .settings import SimulationSettings
from .optical_group import OpticalGroup, OPTICAL_TYPES
from .point_source import PointSource
from .surface_source import SurfaceSource
from .replay_source import ReplaySource


def _quatToMatrix(px, py, pz, q0, q1, q2, q3):
  '''FreeCAD placement quaternion (x, y, z, w) + position -> 4x4.'''
  x, y, z, w = q0, q1, q2, q3
  n = x * x + y * y + z * z + w * w
  s = 0. if n == 0 else 2. / n
  R = np.array([
      [1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)],
      [s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)],
      [s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)],
  ])
  m = np.eye(4)
  m[:3, :3] = R
  m[:3, 3] = (px, py, pz)
  return m


def _parseProperty(prop):
  '''Parse one <Property> element into a python value.'''
  ptype = prop.get('type', '')
  children = list(prop)
  if not children:
    return None
  c = children[0]
  if ptype in ('App::PropertyString', 'App::PropertyEnumeration'):
    if ptype == 'App::PropertyEnumeration':
      # the CustomEnumList is a sibling of the value element
      enums = [e.get('value') for e in prop.iter('Enum')]
      try:
        idx = int(c.get('value'))
        if enums and 0 <= idx < len(enums):
          return enums[idx]
        return idx
      except (TypeError, ValueError):
        return c.get('value')
    return c.get('value')
  if ptype in ('App::PropertyFloat', 'App::PropertyLength',
               'App::PropertyAngle', 'App::PropertyDistance',
               'App::PropertyQuantity'):
    return float(c.get('value'))
  if ptype == 'App::PropertyInteger':
    return int(c.get('value'))
  if ptype == 'App::PropertyBool':
    return c.get('value') in ('true', 'True', '1')
  if ptype == 'App::PropertyVector':
    return (float(c.get('valueX', 0)), float(c.get('valueY', 0)),
            float(c.get('valueZ', 0)))
  if ptype == 'App::PropertyPlacement':
    return _quatToMatrix(*(float(c.get(k, 0)) for k in
                           ('Px', 'Py', 'Pz', 'Q0', 'Q1', 'Q2', 'Q3')))
  if ptype in ('App::PropertyLink',):
    return c.get('value') or None
  if ptype == 'Part::PropertyPartShape':
    # the BRep blob lives in a sibling zip entry; keep its name so the
    # loader can extract a stored triangulation from it
    return c.get('file') or None
  if ptype in ('App::PropertyLinkList', 'App::PropertyLinkListHidden'):
    return [e.get('value') for e in c if e.get('value')]
  if ptype == 'App::PropertyLinkSubList':
    out = []
    for e in c:
      obj = e.get('obj') or e.get('value')
      subs = [sub.get('value') for sub in e if sub.get('value')]
      out.append((obj, subs))
    return out
  return None


class _FcObject:
  def __init__(self, name, type_):
    self.name = name
    self.type = type_
    self.props = {}
    self.label = name

  def get(self, key, default=None):
    return self.props.get(key, default)


def parseDocumentXml(xmlBytes):
  '''Parse Document.xml into {name: _FcObject}.'''
  root = ET.parse(_io.BytesIO(xmlBytes)).getroot()
  objects = {}
  for obj in root.iter('Object'):
    name, type_ = obj.get('name'), obj.get('type')
    if name and type_ and name not in objects:
      objects[name] = _FcObject(name, type_)
  # ObjectData section repeats Object elements with Properties
  for obj in root.iter('Object'):
    name = obj.get('name')
    if name not in objects:
      continue
    for prop in obj.iter('Property'):
      val = _parseProperty(prop)
      if val is not None:
        objects[name].props[prop.get('name')] = val
  for o in objects.values():
    o.label = o.get('Label', o.name)
  return objects


# ------------------------------------------------------- geometry conversion

def _boxSurfaces(obj, elem):
  L = float(obj.get('Length', 10.))
  W = float(obj.get('Width', 10.))
  H = float(obj.get('Height', 10.))
  placement = obj.get('Placement', np.eye(4))
  cx, cy, cz = L / 2, W / 2, H / 2
  from ..geometry import transforms as T
  faces = [
      # (+z, -z) faces
      (T.compose(T.translation(cx, cy, H)), (cx, cy), +1),
      (T.compose(T.translation(cx, cy, 0), T.rotation((1, 0, 0), 180)),
       (cx, cy), +1),
      # (+x, -x)
      (T.compose(T.translation(L, cy, cz), T.rotation((0, 1, 0), 90)),
       (cz, cy), +1),
      (T.compose(T.translation(0, cy, cz), T.rotation((0, 1, 0), -90)),
       (cz, cy), +1),
      # (+y, -y)
      (T.compose(T.translation(cx, W, cz), T.rotation((1, 0, 0), -90)),
       (cx, cz), +1),
      (T.compose(T.translation(cx, 0, cz), T.rotation((1, 0, 0), 90)),
       (cx, cz), +1),
  ]
  return [S.plane(placement @ m, elem=elem, halfExtents=he, orient=orient)
          for m, he, orient in faces]


def _sphereSurfaces(obj, elem):
  R = float(obj.get('Radius', 5.))
  placement = obj.get('Placement', np.eye(4))
  return [S.sphere(placement, elem=elem, radius=R, orient=+1)]


def _cylinderSurfaces(obj, elem):
  R = float(obj.get('Radius', 2.))
  H = float(obj.get('Height', 10.))
  placement = obj.get('Placement', np.eye(4))
  from ..geometry import transforms as T
  return [
      S.cylinder(placement, elem=elem, radius=R, zRange=(0., H), orient=+1),
      S.plane(placement @ T.translation(0, 0, H), elem=elem, radius=R,
              orient=+1),
      S.plane(placement @ T.compose(T.translation(0, 0, 0),
                                    T.rotation((1, 0, 0), 180)),
              elem=elem, radius=R, orient=+1),
  ]


_GEOMETRY_BUILDERS = {
    'Part::Box': _boxSurfaces,
    'Part::Sphere': _sphereSurfaces,
    'Part::Cylinder': _cylinderSurfaces,
}

_SKIP_TYPES = ('App::Origin', 'App::Line', 'App::Plane',
               'App::Point', 'Sketcher::SketchObject')


def _brepSurfaces(member, elem, readBlob, label):
  '''Mesh surfaces from a Part::Feature-like object's stored BRep
  triangulation (geometry/mesh.py parseBRepTriangulations); returns None
  when the object carries no shape blob.'''
  shapeFile = member.get('Shape')
  if not isinstance(shapeFile, str) or readBlob is None:
    return None
  try:
    text = readBlob(shapeFile).decode('latin-1')
  except KeyError:
    return None
  from ..geometry import mesh as M
  placement = member.get('Placement', np.eye(4))
  return M.brepMeshSurfaces(text, elem=elem, transform=placement)


def _collectGeometry(objects, memberNames, elem, label, skipUnsupported,
                     readBlob=None):
  surfs = []
  for name in memberNames:
    member = objects.get(name)
    if member is None:
      continue
    if member.type in _SKIP_TYPES:
      continue
    if member.type == 'App::Link':
      target = objects.get(member.get('LinkedObject'))
      if target is not None:
        linkPlacement = member.get('Placement', np.eye(4))
        inner = _collectGeometry(objects, [target.name], elem, label,
                                 skipUnsupported, readBlob)
        for s in inner:
          s['transform'] = linkPlacement @ s['transform']
        surfs.extend(inner)
      continue
    builder = _GEOMETRY_BUILDERS.get(member.type)
    if builder is not None:
      surfs.extend(builder(member, elem))
      continue
    # anything else (booleans, pads, sketch solids, Part::Feature...):
    # try the stored BRep triangulation -> triangle mesh
    try:
      meshSurfs = _brepSurfaces(member, elem, readBlob, label)
    except ValueError as e:
      meshSurfs = None
      brepErr = str(e)
    else:
      brepErr = 'object has no Shape blob'
    if meshSurfs:
      io.info(f'{member.label!r} ({member.type}) ingested as a triangle '
              f'mesh ({len(meshSurfs)} triangles) from its stored BRep '
              f'triangulation')
      surfs.extend(meshSurfs)
      continue
    msg = (f'cannot rebuild geometry of {member.label!r} '
           f'({member.type}) in optical group {label!r}: not an elementary '
           f'Part primitive (Box/Sphere/Cylinder) and its BRep gave no '
           f'usable triangulation ({brepErr}). Build this element with the '
           f'models API (geometry.surfaces / geometry.mesh) instead.')
    if skipUnsupported:
      io.warn(msg)
      continue
    raise NotImplementedError(msg)
  return surfs


def loadFCStd(path, skipUnsupported=False):
  '''Load an FCStd project of the reference workbench into a Scene.

  Geometry sources, in order of fidelity: elementary Part primitives
  (Box/Sphere/Cylinder) rebuild as exact analytic surfaces; any other
  solid (booleans, pads, sketch-based shapes) loads as a triangle mesh
  from the BRep blob's stored triangulation when FreeCAD saved one
  (geometry/mesh.py); otherwise it raises (or is skipped with
  skipUnsupported=True) with a pointer to the models/mesh APIs.'''
  with zipfile.ZipFile(path) as z:
    xmlBytes = z.read('Document.xml')
    blobs = {n: z.read(n) for n in z.namelist()
             if n.endswith('.brp') or 'Shape' in n}

  def readBlob(name):
    return blobs[name]

  objects = parseDocumentXml(xmlBytes)
  import os
  scene = Scene(label=os.path.splitext(os.path.basename(path))[0],
                path=os.path.splitext(path)[0])

  def popProps(fc, instance):
    '''Copy matching FCStd properties onto a models object.'''
    for key in instance.propertyNames():
      if key in fc.props:
        setattr(instance, key, fc.props[key])
    instance.Label = fc.label

  for fc in objects.values():
    if fc.type != 'App::LinkGroupPython' and fc.type != 'Part::FeaturePython':
      continue
    name = fc.name
    if 'SimulationSettings' in name:
      settings = SimulationSettings()
      popProps(fc, settings)
      scene.addSimulationSettings(settings=settings)
    elif 'PointSource' in name:
      src = PointSource(placement=fc.get('Placement', np.eye(4)))
      popProps(fc, src)
      scene.addSource(src)
    elif 'SurfaceSource' in name:
      src = SurfaceSource(placement=fc.get('Placement', np.eye(4)))
      popProps(fc, src)
      active = fc.get('ActiveSurfaces', [])
      src.ActiveSurfaces = [objects[o].label if isinstance(o, str)
                            and o in objects else o
                            for (o, _subs) in active] if active else []
      scene.addSource(src)
    elif 'ReplaySource' in name:
      src = ReplaySource(placement=fc.get('Placement', np.eye(4)))
      popProps(fc, src)
      scene.addSource(src)
    elif any(f'Optical{t}Group' in name for t in OPTICAL_TYPES):
      optType = next(t for t in OPTICAL_TYPES if f'Optical{t}Group' in name)
      group = OpticalGroup(OpticalType=fc.get('OpticalType', optType))
      popProps(fc, group)
      group.OpticalType = fc.get('OpticalType', optType)
      members = fc.get('ElementList', [])
      group.surfaces = _collectGeometry(objects, members, 0, fc.label,
                                        skipUnsupported, readBlob)
      group.placements = [fc.get('Placement', np.eye(4))]
      scene.addOpticalGroup(group)
  if not scene.opticalObjects() and not skipUnsupported:
    raise ValueError(f'no optical groups could be ingested from {path}')
  return scene
