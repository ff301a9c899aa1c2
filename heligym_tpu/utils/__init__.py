from . import constants
from .math import pi_bound, cross
