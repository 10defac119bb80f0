from .mesh import makeMesh, raysSharding
from .sharded import makeShardedFusedStep, makeShardedPallasStep
from .multiprocess import runMultiprocess
