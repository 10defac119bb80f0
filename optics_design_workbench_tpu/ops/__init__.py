from . import pallas_trace
