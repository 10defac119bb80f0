from .random_variables import (VectorRandomVariable, ScalarRandomVariable,
                               SampledVectorRandomVariable, setGlobalSeed)
from .device_sampler import buildDeviceTables, deviceDraw
from . import points_by_density
