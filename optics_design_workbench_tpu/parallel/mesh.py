'''
Device-mesh helpers. The reference's parallelism is N independent OS worker
processes communicating via the filesystem (SURVEY.md section 2.2); the
TPU-native equivalent is a 1-D `rays` mesh across all chips: the ray batch
axis is sharded over ICI, hit histograms are psum-reduced, and the host only
ever sees aggregate results. Multi-host scale-out uses `jax.distributed`
with the same mesh spanning all processes.
'''

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def makeMesh(nDevices=None, axisName='rays', devices=None):
  '''1-D mesh over the local (or given) devices.'''
  if devices is None:
    devices = jax.devices()
  if nDevices is not None:
    devices = devices[:nDevices]
  return Mesh(np.array(devices), (axisName,))


def raysSharding(mesh, axisName='rays'):
  return NamedSharding(mesh, P(axisName))


def replicatedSharding(mesh):
  return NamedSharding(mesh, P())


def initDistributed(coordinatorAddress=None, numProcesses=None,
                    processId=None):
  '''Multi-host initialization (DCN across slices); no-op when single
  process.'''
  if numProcesses is None or numProcesses <= 1:
    return
  jax.distributed.initialize(coordinator_address=coordinatorAddress,
                             num_processes=numProcesses,
                             process_id=processId)
