from . import transforms
from . import surfaces
from . import intersect
from . import mesh
