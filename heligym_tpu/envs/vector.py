"""Vectorized env: vmapped lockstep stepping with on-device auto-reset.

The reference has no batching at all (one env per process, SURVEY.md §2.4);
this layer is the core of the TPU build: thousands of envs step in lockstep as
one jitted program, episodes auto-reset on device from the ResetSnapshot
carried inside EnvState, and whole rollouts run under `lax.scan` with zero
host round-trips.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .env import EnvState, HeliEnv, StepOutput
from .trim import TrimResult


def broadcast_state(es: EnvState, n: int) -> EnvState:
    """Tile a single-env EnvState across a leading batch axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), es)


@functools.partial(jax.jit, static_argnums=3)
def _assemble_batched(tr, wind_mean, key, n: int) -> EnvState:
    """EnvState from a batched TrimResult (per-env initial conditions)."""
    from .env import ResetSnapshot
    from ..ops.state import WindState

    wind0 = WindState.zeros((n,))
    wm = jnp.broadcast_to(wind_mean, (n, 3))
    snap = ResetSnapshot(heli=tr.state, wind=wind0, dots=tr.dots, obs=tr.obs,
                         wind_ned=wm)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    return EnvState(heli=tr.state, wind=wind0, dots=tr.dots, obs=tr.obs,
                    wind_ned=wm, steps=jnp.zeros((n,), jnp.int32),
                    successed_steps=jnp.zeros((n,), jnp.int32), key=keys,
                    init=snap, task_id=jnp.zeros((n,), jnp.int32))


@functools.partial(jax.jit, static_argnums=2)
def _broadcast_and_fold(es_single: EnvState, key, n: int) -> EnvState:
    """Jitted reset assembly: broadcast the trim state and fold per-env keys
    by global env index (one compiled program instead of dozens of eager ops —
    eager dispatch is ~0.4 s/op on tunneled TPU backends)."""
    es = broadcast_state(es_single, n)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    return es.replace(key=keys)


def auto_reset(new_es: EnvState, out: StepOutput) -> Tuple[EnvState, StepOutput]:
    """Where an episode ended, replace the sim state with its ResetSnapshot
    (gymnasium autoreset convention: the returned obs is the fresh episode's
    first obs; reward/flags describe the terminating step). Batched or not."""
    ended = out.done | out.truncated

    def pick(init_leaf, new_leaf):
        mask = ended.reshape(ended.shape + (1,) * (new_leaf.ndim - ended.ndim))
        return jnp.where(mask, init_leaf, new_leaf)

    snap = new_es.init
    zeros_i = jnp.zeros_like(new_es.steps)
    es = new_es.replace(
        heli=jax.tree_util.tree_map(pick, snap.heli, new_es.heli),
        wind=jax.tree_util.tree_map(pick, snap.wind, new_es.wind),
        dots=jax.tree_util.tree_map(pick, snap.dots, new_es.dots),
        obs=pick(snap.obs, new_es.obs),
        wind_ned=pick(snap.wind_ned, new_es.wind_ned),
        steps=jnp.where(ended, zeros_i, new_es.steps),
        successed_steps=jnp.where(ended, zeros_i, new_es.successed_steps),
    )
    out = out.replace(obs=pick(snap.obs, out.obs))
    return es, out


@dataclasses.dataclass(frozen=True)
class VectorHeliEnv:
    """Batch of envs stepping in lockstep under one jitted program."""
    env: HeliEnv
    num_envs: int
    auto_reset: bool = True

    def reset(self, key, trim_cond: Optional[dict] = None) -> Tuple[EnvState, jnp.ndarray]:
        """Solve trim once on host, broadcast on device, fold per-env keys
        by *global* env index (sharding-layout invariant, SURVEY.md §7)."""
        tr = self.env.trim_result(trim_cond)
        return self.reset_from_trim(tr, key)

    def reset_from_trim(self, tr: TrimResult, key) -> Tuple[EnvState, jnp.ndarray]:
        es_single, obs = self.env.reset_from_trim(tr, key)
        es = _broadcast_and_fold(es_single, key, self.num_envs)
        return es, es.obs

    def assign_tasks(self, es: EnvState, task_ids) -> EnvState:
        """Per-env task assignment for MixedTask batches (task-conditioned
        reward, BASELINE config #3). `task_ids`: (num_envs,) int indices into
        the MixedTask's sub-task tuple. Assignments persist across
        auto-resets."""
        return es.replace(task_id=jnp.asarray(task_ids, jnp.int32))

    def reset_randomized(self, key, cond_sampler) -> Tuple[EnvState, jnp.ndarray]:
        """Per-env randomized initial conditions via the on-device batched
        Newton trim (SURVEY.md §7 hard part 5): `cond_sampler(key, n) ->
        dict of batched trim-condition arrays` (see trim.trim_batched)."""
        from .trim import trim_batched
        from ..ops import dryden
        k_cond, k_env = jax.random.split(key)
        conds = cond_sampler(k_cond, self.num_envs)
        tr = trim_batched(self.env.params, self.env.terrain,
                          dryden.mean_wind(self.env.wind_params), conds)
        es = _assemble_batched(tr, dryden.mean_wind(self.env.wind_params),
                               k_env, self.num_envs)
        return es, es.obs

    @functools.partial(jax.jit, static_argnums=0)
    def step(self, es: EnvState, actions) -> Tuple[EnvState, StepOutput]:
        """Lockstep batched transition; `actions` is (num_envs, 4)."""
        new_es, out = jax.vmap(self.env.step)(es, actions)
        if self.auto_reset:
            new_es, out = auto_reset(new_es, out)
        return new_es, out


def rollout(venv: VectorHeliEnv, es: EnvState, policy: Callable, steps: int,
            policy_params=None):
    """On-device rollout: `lax.scan` over time, vmapped envs inside.

    `policy(policy_params, obs) -> actions` must be jittable. Returns
    (final_state, StepOutput stacked over time with leading axis `steps`).
    """
    def scan_step(es, _):
        actions = policy(policy_params, es.obs)
        es, out = jax.vmap(venv.env.step)(es, actions)
        if venv.auto_reset:
            es, out = auto_reset(es, out)
        return es, out

    return jax.lax.scan(scan_step, es, None, length=steps)
