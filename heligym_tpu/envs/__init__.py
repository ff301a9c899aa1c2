from .env import EnvState, HeliEnv, ResetSnapshot, StepOutput, OBS_DIM, ACT_DIM
from .tasks import (ForwardFlightTask, HoverTask, LandingTask, MixedTask,
                    Normalizers, ObliqueFlightTask, SlalomTask, Task,
                    TurningFlightTask)
from . import trim as trim_lib
from .trim import TrimResult, trim_batched
from .vector import VectorHeliEnv, auto_reset, broadcast_state, rollout
from .gym_api import (Heli, HeliHover, HeliForwardFlight, HeliLanding,
                      HeliObliqueFlight, HeliSlalom, HeliTurningFlight,
                      HeliVectorGymEnv)
