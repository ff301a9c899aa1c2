"""Sharded env farm: thousands of lockstep envs partitioned over a device mesh.

The reference runs exactly one env per process (SURVEY.md §2.4); the farm is
its to-be-created scale-out: a VectorHeliEnv whose EnvState lives sharded over
the `env` mesh axis. Stepping is elementwise over envs, so the jitted step
partitions with zero communication; reductions (metrics, learner losses) ride
ICI via `psum` inside `shard_map` or jit-inserted collectives.

Determinism guarantee: per-env keys are folded from the *global* env index at
reset, so trajectories are invariant to device count and sharding layout
(tested on a CPU-simulated 8-device mesh, SURVEY.md §4 item 6).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..envs.env import EnvState, HeliEnv, StepOutput
from ..envs.vector import VectorHeliEnv, auto_reset
from .mesh import ENV_AXIS, env_sharding, make_env_mesh, shard_env_state


@dataclasses.dataclass(frozen=True)
class EnvFarm:
    """A VectorHeliEnv sharded over a mesh's env axis."""
    venv: VectorHeliEnv
    mesh: Mesh

    @classmethod
    def build(cls, env: HeliEnv, num_envs: int, mesh: Optional[Mesh] = None,
              auto_reset: bool = True) -> "EnvFarm":
        mesh = mesh or make_env_mesh()
        n_dev = mesh.devices.size
        if num_envs % n_dev != 0:
            raise ValueError(f"num_envs={num_envs} not divisible by {n_dev} devices")
        return cls(venv=VectorHeliEnv(env, num_envs, auto_reset), mesh=mesh)

    @property
    def num_envs(self) -> int:
        return self.venv.num_envs

    def reset(self, key, trim_cond: Optional[dict] = None) -> Tuple[EnvState, jnp.ndarray]:
        es, obs = self.venv.reset(key, trim_cond)
        es = shard_env_state(es, self.mesh)
        return es, obs

    def step_fn(self):
        """Jitted sharded step: state in/out sharded over the env axis.
        The terrain table rides as a replicated runtime argument (closure
        capture would embed it as a slow jaxpr constant; ops/terrain.py)."""
        from ..ops import terrain as terrain_ops
        sh = env_sharding(self.mesh)
        venv = self.venv

        def _step(es, actions, hmap):
            new_es, out = jax.vmap(venv.env.step, in_axes=(0, 0, None))(
                es, actions, hmap)
            if venv.auto_reset:
                new_es, out = auto_reset(new_es, out)
            return new_es, out

        jitted = jax.jit(_step, in_shardings=(sh, sh, None),
                         out_shardings=(sh, sh), donate_argnums=(0,))
        hmap = terrain_ops.prep_hmap_arg(venv.env.terrain)
        return lambda es, actions: jitted(es, actions, hmap)

    def rollout_fn(self, policy: Callable, steps: int):
        """Jitted sharded rollout: lax.scan over time, envs sharded.

        policy(params, obs) -> actions. Returns f(es, policy_params) ->
        (final_es, StepOutput stacked over `steps`)."""
        from ..ops import terrain as terrain_ops
        sh = env_sharding(self.mesh)
        venv = self.venv

        def _rollout(es, policy_params, hmap):
            def scan_step(es, _):
                actions = policy(policy_params, es.obs)
                es, out = jax.vmap(venv.env.step, in_axes=(0, 0, None))(
                    es, actions, hmap)
                if venv.auto_reset:
                    es, out = auto_reset(es, out)
                return es, out
            return jax.lax.scan(scan_step, es, None, length=steps)

        jitted = jax.jit(_rollout, in_shardings=(sh, None, None),
                         donate_argnums=(0,))
        hmap = terrain_ops.prep_hmap_arg(venv.env.terrain)
        return lambda es, policy_params: jitted(es, policy_params, hmap)


def build_sharded_fused_rollout(env: HeliEnv, num_envs: int, steps: int,
                                mesh: Optional[Mesh] = None,
                                collect=("reward", "done"),
                                auto_reset: bool = True):
    """Multi-device fused rollout: the Pallas mega-kernel wrapped in
    `shard_map` over the mesh's env axis. Each device runs the fused kernel on
    its local env shard; there is no cross-device communication in the step
    (the physics is elementwise over envs), so scaling is linear by
    construction. Per-env RNG keys live in the sharded state, so trajectories
    match the single-device fused path (exactly in math; up to compiler FMA
    contraction in float — see test_sharding.py).

    Returns a jittable f(es, actions) -> (es', outputs) like
    `build_fused_rollout`."""
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas import build_fused_rollout
    from .mesh import ENV_AXIS

    mesh = mesh or make_env_mesh()
    n_dev = mesh.devices.size
    if num_envs % n_dev != 0:
        raise ValueError(f"num_envs={num_envs} not divisible by {n_dev} devices")
    local = num_envs // n_dev
    inner = build_fused_rollout(env, local, steps, collect=collect,
                                auto_reset=auto_reset)

    shard = P(ENV_AXIS)
    out_specs = (shard, {k: P(None, ENV_AXIS) for k in
                         (set(collect) | ({"truncated"} if "done" in collect else set()))})
    if "obs" in collect:
        out_specs[1]["obs"] = P(None, ENV_AXIS, None)

    from ..ops import terrain as terrain_ops

    def sharded(es: EnvState, actions, hmap):
        # The env axis of `actions` differs by form: (num_envs, 4) constant
        # actions shard on axis 0, (steps, num_envs, 4) sequences on axis 1.
        # A single P('env') spec would shard a 3-D sequence's TIME axis and
        # silently mis-read trajectories inside the shard.
        act_spec = P(ENV_AXIS) if actions.ndim == 2 else P(None, ENV_AXIS)
        run = lambda es, a, hm: inner(es, a, hmap=hm)
        return jax.shard_map(run, mesh=mesh, in_specs=(shard, act_spec, P()),
                             out_specs=out_specs, check_vma=False)(es, actions,
                                                                   hmap)

    jitted = jax.jit(sharded)
    hmap = terrain_ops.prep_hmap_arg(env.terrain)
    return lambda es, actions: jitted(es, actions, hmap)


def farm_metrics(out: StepOutput) -> dict:
    """Cross-env aggregate metrics; under a sharded jit these reductions
    become ICI collectives automatically."""
    return {
        "reward_mean": jnp.mean(out.reward),
        "reward_min": jnp.min(out.reward),
        "done_frac": jnp.mean(out.done.astype(jnp.float32)),
        "truncated_frac": jnp.mean(out.truncated.astype(jnp.float32)),
        "failed_frac": jnp.mean(out.failed.astype(jnp.float32)),
    }
