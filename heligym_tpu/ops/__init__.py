from . import aero, atmosphere, dryden, eom, gear, integrator, kinematics, lookup, rotor, terrain
from .state import HeliState, WindState, HELI_STATE_FIELDS
from .eom import heli_dynamics, control_inputs
from .dryden import WindParams, wind_dynamics, mean_wind
from .terrain import Terrain, load_terrain, flat_terrain, ground_height, ground_touching_altitude
from .integrator import rk4, rk4_k4only
