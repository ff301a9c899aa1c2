"""Gymnasium-compatible single-env wrappers (drop-in for the reference API).

Parity target: /root/reference/heligym/envs/helicopter.py (class Heli) and
helicopter_with_tasks.py (HeliHover / HeliForwardFlight), plus the
HeliObliqueFlight the reference README promises but never ships.

Differences by design:
  * the renderer is created lazily on the first `render()` call instead of in
    `__init__` (the reference opens a GL window even for headless training,
    SURVEY.md §3.1 — an init-time coupling deliberately not copied);
  * `reset(seed=...)` follows the gymnasium seeding API; the reference had no
    seeding hook at all (its Dryden noise came from the global numpy RNG).
"""
from __future__ import annotations

import copy
from typing import Optional

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces
from gymnasium.utils import EzPickle

from ..utils.constants import DT, FPS
from .env import ACT_DIM, OBS_DIM, HeliEnv
from .tasks import (ForwardFlightTask, HoverTask, LandingTask,
                    ObliqueFlightTask, SlalomTask, Task, TurningFlightTask)


class Heli(gym.Env, EzPickle):
    """Single-env gymnasium interface over the jitted functional core."""

    metadata = {
        "render_modes": ["human", "rgb_array"],
        # Legacy keys kept for reference compatibility (helicopter.py:29-32).
        "render.modes": ["human", "rgb_array"],
        "video.frames_per_second": FPS,
        "render_fps": FPS,
    }

    default_max_time = 40.0
    default_trim_cond = {
        "yaw": 0.0, "yaw_rate": 0.0, "ned_vel": [0.0, 0.0, 0.0],
        "gr_alt": 100.0, "xy": [0.0, 0.0], "psi_mr": 0.0, "psi_tr": 0.0,
    }

    _task_cls = Task

    def __init__(self, heli_name: str = "aw109", render_mode: Optional[str] = None,
                 device: Optional[str] = "cpu"):
        """`device`: backend for this single-env instance ("cpu" default).
        One env's step is microseconds of math; on accelerator backends the
        per-step host<->device round trip dominates by orders of magnitude
        (hundreds of ms through remote TPU tunnels), so the interactive
        wrapper runs on the host CPU. Use VectorHeliEnv / the fused rollout
        for accelerator-scale batches. Pass device=None to follow JAX's
        default backend."""
        EzPickle.__init__(self, heli_name=heli_name, render_mode=render_mode)
        self.heli_name = heli_name
        self.render_mode = render_mode
        try:
            self._device = (jax.local_devices(backend=device)[0]
                            if device else None)
        except RuntimeError:
            self._device = None
        self._core = HeliEnv.build(heli_name, task=self._task_cls())
        if self._device is not None and device is not None:
            self._core = self._core.to_backend(device)

        self.observation_space = spaces.Box(-np.inf, np.inf, shape=(OBS_DIM,),
                                            dtype=np.float32)
        self.action_space = spaces.Box(-1.0, +1.0, (ACT_DIM,), dtype=np.float32)

        self.set_max_time()
        self.set_target()
        self.set_trim_cond()
        self.set_reward_weights()
        n = self._core.normalizers
        self.normalizers = {"t": n.t, "x": n.x, "v": n.v, "a": n.a}

        self._step_jit = jax.jit(lambda es, a: self._core.step(es, a))
        self._state = None
        self._trim_cache = {}
        self._renderer = None
        self._np_seed = 0

    # ------------------------------------------------------------------ API
    def set_max_time(self, max_time: Optional[float] = None):
        """Episode duration and derived success/task windows (helicopter.py:89-92)."""
        self.max_time = self.default_max_time if max_time is None else max_time
        self.success_duration = self.max_time / 4.0
        self.task_duration = self.max_time / 4.0
        self._core = self._core.replace(max_time=self.max_time)
        self._step_jit = jax.jit(lambda es, a: self._core.step(es, a))

    def set_target(self, target: Optional[dict] = None):
        task = self._core.task
        if target:
            task = task.with_target(**{self._target_field(k): v for k, v in target.items()})
        self.task_target = task.target_dict()
        self._core = self._core.replace(task=task)
        self._step_jit = jax.jit(lambda es, a: self._core.step(es, a))

    @staticmethod
    def _target_field(key: str) -> str:
        return key

    def get_target(self):
        return copy.deepcopy(self.task_target)

    def set_trim_cond(self, trim_cond: Optional[dict] = None):
        self.trim_cond = copy.deepcopy(self.default_trim_cond)
        self.trim_cond.update(trim_cond or {})

    def get_trim_cond(self):
        return copy.deepcopy(self.trim_cond)

    def set_reward_weights(self, base_reward_weight=None, terminal_reward_weight=None):
        """Stored for API parity; the reference defines these weights but its
        task rewards never consume them (helicopter.py:108-111)."""
        zero = np.zeros((OBS_DIM, OBS_DIM))
        self.base_reward_weight = zero if base_reward_weight is None else base_reward_weight
        self.terminal_reward_weight = zero if terminal_reward_weight is None else terminal_reward_weight

    # ---------------------------------------------------------------- core
    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        super().reset(seed=seed)
        if seed is not None:
            self._np_seed = seed
        key = jax.random.PRNGKey(self._np_seed)
        self._np_seed += 1
        if options and "trim_cond" in options:
            self.set_trim_cond(options["trim_cond"])
        cond_key = tuple(sorted((k, str(v)) for k, v in self.trim_cond.items()))
        if cond_key not in self._trim_cache:
            self._trim_cache[cond_key] = self._core.trim_result(self.trim_cond)
        es, obs = self._core.reset_from_trim(self._trim_cache[cond_key], key)
        if self._device is not None:
            es = jax.device_put(es, self._device)
        self._state = es
        return np.asarray(es.obs), self._get_info_host(es)

    def step(self, actions):
        actions = np.asarray(actions, np.float32)
        if actions.shape != (ACT_DIM,):
            # JAX clamps out-of-bounds indexing, so a short action vector
            # would silently reuse its last channel — reject it loudly.
            raise ValueError(
                f"action must have shape ({ACT_DIM},), got {actions.shape}")
        # straight host->target-device transfer: `jnp.asarray` first would
        # materialize on the default backend (a remote TPU costs ~50 ms/hop)
        actions = jax.device_put(actions, self._device)
        self._state, out = self._step_jit(self._state, actions)
        info = {"failed": bool(out.failed), "successed": bool(out.successed),
                "time_up": bool(out.time_up)}
        return (np.asarray(out.obs), float(out.reward), bool(out.done),
                bool(out.truncated), info)

    def _get_info_host(self, es):
        return {"failed": False, "successed": False, "time_up": False}

    @property
    def time_counter(self) -> float:
        return float(self._state.steps) * DT if self._state is not None else 0.0

    @property
    def successed_time(self) -> float:
        return float(self._state.successed_steps) * DT if self._state is not None else 0.0

    # -------------------------------------------------------------- render
    def render(self):
        from ..render import get_renderer   # lazy: never in the step path
        if self._renderer is None:
            self._renderer = get_renderer(self._core)
        return self._renderer.render(self._state, mode=self.render_mode or "rgb_array")

    def close(self):
        if self._renderer is not None:
            self._renderer.close()
            self._renderer = None


class HeliVectorGymEnv(gym.vector.VectorEnv):
    """Gymnasium VectorEnv facade over the on-device vectorized env: familiar
    `reset()/step()` numpy interface, all simulation (incl. auto-reset) on
    device. For maximum throughput use VectorHeliEnv / the fused rollout
    directly and keep data on device.

    Autoreset follows gymnasium's SAME_STEP convention: a terminating step
    returns the FRESH episode's first obs, and the terminal (pre-reset)
    observation is surfaced in `info["final_obs"]` (gymnasium >=1.0 key) and
    `info["final_observation"]` (0.29-compat alias) with the matching
    `_final_*` masks + per-env `final_info` dicts — so an external GAE
    implementation bootstraps V(terminal_obs), not V(reset_obs)."""

    metadata = {"autoreset_mode": gym.vector.AutoresetMode.SAME_STEP}

    def __init__(self, num_envs: int, heli_name: str = "aw109",
                 task: Optional[Task] = None):
        from .vector import VectorHeliEnv, auto_reset
        self._core = HeliEnv.build(heli_name, task=task or HoverTask())
        self._venv = VectorHeliEnv(self._core, num_envs)
        core = self._core

        def _step(es, actions):
            new_es, out = jax.vmap(core.step)(es, actions)
            final_obs = out.obs                     # pre-reset terminal obs
            new_es, out = auto_reset(new_es, out)
            return new_es, out, final_obs

        self._step_jit = jax.jit(_step)
        self.num_envs = num_envs
        self.single_observation_space = spaces.Box(
            -np.inf, np.inf, shape=(OBS_DIM,), dtype=np.float32)
        self.single_action_space = spaces.Box(-1.0, 1.0, (ACT_DIM,),
                                              dtype=np.float32)
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, num_envs)
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs)
        self._state = None
        self._trim = None

    def reset(self, seed: Optional[int] = None, options: Optional[dict] = None):
        # Gymnasium semantics: an unseeded reset draws fresh entropy (two
        # unseeded resets differ), while any explicit seed — including 0 —
        # is reproducible.  `seed or 0` would alias seed=0 with seed=None.
        if seed is None:
            seed = int(np.random.SeedSequence().entropy & 0x7FFFFFFFFFFFFFFF)
        key = jax.random.PRNGKey(seed)
        if self._trim is None:
            self._trim = self._core.trim_result(
                (options or {}).get("trim_cond"))
        self._state, obs = self._venv.reset_from_trim(self._trim, key)
        return np.asarray(obs), {}

    def step(self, actions):
        self._state, out, final_obs = self._step_jit(
            self._state, jnp.asarray(actions, jnp.float32))
        done = np.asarray(out.done)
        trunc = np.asarray(out.truncated)
        failed = np.asarray(out.failed)
        succ = np.asarray(out.successed)
        info = {"failed": failed, "successed": succ}
        ended = done | trunc
        if ended.any():
            fo = np.asarray(final_obs)
            obs_arr = np.full(self.num_envs, None, dtype=object)
            info_arr = np.full(self.num_envs, None, dtype=object)
            for i in np.nonzero(ended)[0]:
                obs_arr[i] = fo[i]
                info_arr[i] = {"failed": bool(failed[i]),
                               "successed": bool(succ[i])}
            info["final_obs"] = obs_arr
            info["_final_obs"] = ended
            info["final_observation"] = obs_arr        # gymnasium<1.0 alias
            info["_final_observation"] = ended
            info["final_info"] = info_arr
            info["_final_info"] = ended
        return (np.asarray(out.obs), np.asarray(out.reward),
                done, trunc, info)

    def close(self):
        pass


class HeliHover(Heli):
    """Hover task (helicopter_with_tasks.py:5-52)."""
    _task_cls = HoverTask


class HeliForwardFlight(Heli):
    """Forward-flight task (helicopter_with_tasks.py:54-115)."""
    _task_cls = ForwardFlightTask


class HeliObliqueFlight(Heli):
    """Oblique-flight task (README.md:54; completed here, see tasks.py)."""
    _task_cls = ObliqueFlightTask


class HeliTurningFlight(Heli):
    """Turning-flight task (reference roadmap item, implemented here)."""
    _task_cls = TurningFlightTask


class HeliSlalom(Heli):
    """Slalom maneuver task (reference roadmap item, implemented here)."""
    _task_cls = SlalomTask


class HeliLanding(Heli):
    """Landing / ground task (reference roadmap item, implemented here)."""
    _task_cls = LandingTask
