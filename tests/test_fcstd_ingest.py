'''
FCStd ingest tests against the reference's actual example project
(reference: examples/1-source-and-detector/main.FCStd) — the scene loads
without FreeCAD and reproduces the reference's configured simulation.
'''

import os
import shutil

import numpy as np
import pytest

REFERENCE_FCSTD = '/root/reference/examples/1-source-and-detector/main.FCStd'

from optics_design_workbench_tpu.models.fcstd_ingest import (loadFCStd,
                                                             parseDocumentXml)
from optics_design_workbench_tpu import simulation


needsReference = pytest.mark.skipif(not os.path.exists(REFERENCE_FCSTD),
                                    reason='reference FCStd not available')


@needsReference
def test_parse_objects(tmp_path):
  import zipfile
  with zipfile.ZipFile(REFERENCE_FCSTD) as z:
    objects = parseDocumentXml(z.read('Document.xml'))
  assert 'OpticalPointSource' in objects
  assert objects['OpticalAbsorberGroup'].get('OpticalType') == 'Absorber'
  assert objects['OpticalPointSource'].get('PowerDensity') \
      == 'exp(-theta^2/0.01)'
  box = objects['Box']
  assert box.get('Length') == 10. and box.get('Height') == 1.


@needsReference
def test_ingest_scene(tmp_path):
  src = tmp_path / 'main.FCStd'
  shutil.copy(REFERENCE_FCSTD, src)
  scene = loadFCStd(str(src))
  labels = [g.Label for g in scene.opticalObjects()]
  assert 'OpticalAbsorberGroup' in labels
  source = scene.lightSources()[0]
  assert source.PowerDensity == 'exp(-theta^2/0.01)'
  assert float(source.Wavelength) == 500.
  settings = scene.activeSimulationSettings()
  assert settings.endAfterRays() == 1e4
  group = scene.getObject('OpticalAbsorberGroup')
  assert group.OpticalType == 'Absorber' and group.RecordHits
  assert len(group.surfaces) == 6          # box -> six rectangle faces


@needsReference
def test_ingested_scene_simulates(tmp_path):
  src = tmp_path / 'main.FCStd'
  shutil.copy(REFERENCE_FCSTD, src)
  scene = loadFCStd(str(src))
  scene.getObject('OpticalSimulationSettings').EnableStoreSingleShotData = \
      True
  scene.getObject('OpticalSimulationSettings').RaysPerIteration = 3000
  runPath = simulation.runSimulation(scene, 'singletrue', seed=3)
  from optics_design_workbench_tpu.jupyter_utils import RawFolder
  hits = RawFolder(runPath).loadHits('OpticalAbsorberGroup')
  # box absorber 10x10 at z=50, gaussian theta sigma~0.07: most rays hit
  assert len(hits) > 1000
  pts = hits.points()
  # box top face is at z=50 (group placement) + box z in [0, 1]
  assert np.allclose(pts[:, 2], 50., atol=1.1)
  assert np.abs(pts[:, 0]).max() <= 5.01 and np.abs(pts[:, 1]).max() <= 5.01


def test_unsupported_geometry_message(tmp_path):
  ref2 = '/root/reference/examples/2-lens-and-mirror/main.FCStd'
  if not os.path.exists(ref2):
    pytest.skip('reference FCStd not available')
  src = tmp_path / 'main2.FCStd'
  shutil.copy(ref2, src)
  with pytest.raises(NotImplementedError):
    loadFCStd(str(src))
  # permissive mode loads what it can
  scene = loadFCStd(str(src), skipUnsupported=True)
  assert scene.lightSources()
