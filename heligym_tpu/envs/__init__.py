from .env import EnvState, HeliEnv, ResetSnapshot, StepOutput, OBS_DIM, ACT_DIM
from .tasks import (ForwardFlightTask, HoverTask, Normalizers, ObliqueFlightTask,
                    Task)
from . import trim as trim_lib
from .trim import TrimResult, trim_batched
from .vector import VectorHeliEnv, auto_reset, broadcast_state, rollout
from .gym_api import (Heli, HeliHover, HeliForwardFlight, HeliObliqueFlight,
                      HeliVectorGymEnv)
