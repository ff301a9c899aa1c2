from .schema import (HeliParams, EnvPhysics, HeliBody, MainRotor, TailRotor,
                     Fuselage, HorizontalTail, VerticalTail, Wing, LandingGear,
                     precalculate)
from .registry import load_params, available_models, register_model_path
