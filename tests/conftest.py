import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path via __graft_entry__.dryrun_multichip).
#
# NOTE the environment's sitecustomize pre-imports jax and forces
# JAX_PLATFORMS=axon (the real TPU); env vars set here come too late, so the
# backend must be switched through jax.config instead.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest

import jax
# OPTICS_TPU_TESTS_ON_TPU=1 keeps the real TPU backend so the
# tests/test_pallas_tpu.py suite (skipped on CPU) can run on hardware
if not os.environ.get('OPTICS_TPU_TESTS_ON_TPU'):
  jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: the trace/scan kernels are expensive to
# compile on the CPU test backend; cache them across test runs. The dir is
# keyed by a digest of the kernel-shaping sources so editing pallas/scan
# internals can never serve stale binaries (and caches AOT-compiled on a
# different host machine roll over instead of warning about SIGILL).
from optics_design_workbench_tpu import kernelSourceDigest
jax.config.update('jax_compilation_cache_dir',
                  f'/root/.cache/jax_test_cache-{kernelSourceDigest()}')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

if not os.environ.get('OPTICS_TPU_TESTS_ON_TPU'):
  assert jax.devices()[0].platform == 'cpu' and len(jax.devices()) == 8, \
      'tests must run on the virtual 8-device CPU mesh'


@pytest.fixture(autouse=True)
def _seed():
  from optics_design_workbench_tpu import distributions
  distributions.setGlobalSeed(12345)
  np.random.seed(12345)
  yield
