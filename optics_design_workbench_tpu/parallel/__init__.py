from .mesh import makeMesh, raysSharding
from .sharded import (makeShardedFusedStep, makeShardedPallasStep,
                      makeShardedPallasRawStep)
from .multiprocess import runMultiprocess
