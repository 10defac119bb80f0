import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path via __graft_entry__.dryrun_multichip).
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
  from optics_design_workbench_tpu import distributions
  distributions.setGlobalSeed(12345)
  np.random.seed(12345)
  yield
