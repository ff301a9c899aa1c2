"""heligym_tpu — TPU-native vectorized helicopter flight environments.

A from-scratch JAX/XLA rebuild of the capabilities of `heli-gym`
(6-DOF Heffley–Mnich minimum-complexity helicopter RL environments): the
dynamics are one pure jittable step function over a state pytree, batched with
`jax.vmap`, rolled out with `lax.scan`, sharded over TPU meshes with
`jax.sharding`, with on-device auto-reset, Dryden turbulence driven by
counter-based PRNG, host-side trim solving and a decoupled renderer.

Public layers (SURVEY.md §7):
  models/   parameter schema + registry (aw109)
  ops/      pure physics kernels (rotor, aero, gear, terrain, dryden, RK4)
  envs/     functional env core, tasks, trim, vectorization, gymnasium API
  parallel/ device meshes and sharded env farms
  learner/  PPO on sharded rollouts
  utils/    constants, profiling, checkpointing
"""
from gymnasium.envs.registration import register

from .envs import (Heli, HeliEnv, HeliForwardFlight, HeliHover, HeliLanding,
                   HeliObliqueFlight, HeliSlalom, HeliTurningFlight,
                   VectorHeliEnv)
from .models import load_params

__version__ = "0.1.0"

# Registration mirrors the reference (/root/reference/heligym/__init__.py:4-18),
# adds the tasks its README advertises but never registers (ForwardFlight) or
# implements (ObliqueFlight), and completes its TODO roadmap (turning flight,
# slalom, ground/landing — reference README.md:110-112).
for _id, _entry in [
    ("Heli-v0", "heligym_tpu.envs:Heli"),
    ("HeliHover-v0", "heligym_tpu.envs:HeliHover"),
    ("HeliForwardFlight-v0", "heligym_tpu.envs:HeliForwardFlight"),
    ("HeliObliqueFlight-v0", "heligym_tpu.envs:HeliObliqueFlight"),
    ("HeliTurningFlight-v0", "heligym_tpu.envs:HeliTurningFlight"),
    ("HeliSlalom-v0", "heligym_tpu.envs:HeliSlalom"),
    ("HeliLanding-v0", "heligym_tpu.envs:HeliLanding"),
]:
    register(id=_id, entry_point=_entry, max_episode_steps=5000,
             reward_threshold=0.95, nondeterministic=False)
