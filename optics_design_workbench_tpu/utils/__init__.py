from . import io
from . import timing
from . import profiling
