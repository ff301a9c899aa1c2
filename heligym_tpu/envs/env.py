"""Functional env core: pure `step` over an EnvState pytree.

This is the TPU-native re-design of the reference Env layer
(/root/reference/heligym/envs/helicopter.py:192-243): all per-step logic —
Dryden wind, helicopter RK4, reward, termination, success accounting — is one
pure jittable function of (EnvState, action). Batching is `jax.vmap`, rollouts
are `lax.scan`, sharding is a NamedSharding over the batch axis; rendering is
fully decoupled (a host-side consumer of streamed state).

Step ordering preserved from the reference:
  1. wind RK4 driven by the *previous* observation's NED velocity/ground
     altitude (helicopter.py:195-197);
  2. helicopter RK4 under the freshly produced turbulent wind;
  3. reward from post-step state + k4 derivatives;
  4. failed/success accounting with `successed` evaluated BEFORE adding this
     step's success time (helicopter.py:201-205).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..models import HeliParams, load_params
from ..ops import dryden, eom, terrain as terrain_ops
from ..ops.integrator import rk4, rk4_k4only
from ..ops.state import HeliState, WindState
from ..utils.constants import D2R, DT
from ..utils.math import pi_bound
from .tasks import Normalizers, Task
from .trim import TrimResult, trim

OBS_DIM = 17
ACT_DIM = 4


@struct.dataclass
class ResetSnapshot:
    """The episode's initial conditions, carried in EnvState so on-device
    auto-reset needs no host sync and supports per-env randomized trims."""
    heli: HeliState
    wind: WindState
    dots: HeliState
    obs: jnp.ndarray
    wind_ned: jnp.ndarray


@struct.dataclass
class EnvState:
    """Complete per-env simulation state — one pytree, trivially checkpointable."""
    heli: HeliState          # helicopter dynamic state
    wind: WindState          # Dryden filter state
    dots: HeliState          # k4 state derivatives of the last step
    obs: jnp.ndarray         # (17,) last observation
    wind_ned: jnp.ndarray    # (3,) wind applied at the last step
    steps: jnp.ndarray       # i32 () step count this episode
    successed_steps: jnp.ndarray  # i32 () accumulated success steps
    key: jax.Array           # per-env PRNG key
    init: ResetSnapshot      # auto-reset target
    # per-env task selector for MixedTask batches (BASELINE config #3);
    # ignored by single-task envs, persists across auto-resets
    task_id: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


@struct.dataclass
class StepOutput:
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    truncated: jnp.ndarray
    failed: jnp.ndarray
    successed: jnp.ndarray
    time_up: jnp.ndarray


def _trim_cache_path(model_name, wind_params, cond) -> str:
    import hashlib
    import os
    blob = repr((model_name, wind_params.mean_ned,
                 sorted((k, repr(v)) for k, v in cond.items()))).encode()
    digest = hashlib.sha1(blob).hexdigest()[:16]
    root = os.environ.get("HELIGYM_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "heligym_tpu"))
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"trim_{model_name}_{digest}.npz")


def _trim_cache_load(model_name, wind_params, cond) -> Optional[TrimResult]:
    import numpy as np
    import os
    path = _trim_cache_path(model_name, wind_params, cond)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            from ..ops.state import HeliState
            return TrimResult(
                state=HeliState.unflatten(jnp.asarray(z["state"])),
                action=jnp.asarray(z["action"]),
                obs=jnp.asarray(z["obs"]),
                dots=HeliState.unflatten(jnp.asarray(z["dots"])))
    except Exception:
        return None


def _trim_cache_store(model_name, wind_params, cond, tr: TrimResult) -> None:
    import numpy as np
    path = _trim_cache_path(model_name, wind_params, cond)
    try:
        np.savez(path, state=np.asarray(tr.state.flatten()),
                 action=np.asarray(tr.action), obs=np.asarray(tr.obs),
                 dots=np.asarray(tr.dots.flatten()))
    except Exception:
        pass


def _non_finite(x):
    """NaN-or-inf test via primitives available in Mosaic kernels."""
    return (x != x) | (jnp.abs(x) > jnp.float32(1e30))


def _accum_steps_until(threshold: float, dt: float, strict: bool) -> int:
    """Smallest n such that the reference's float64 running sum of n*dt crosses
    `threshold` (strictly if `strict`). The reference accumulates python-float
    time (helicopter.py:193,205); we count integer steps and precompute the
    crossing point exactly, so device comparisons are integer."""
    acc, n = 0.0, 0
    limit = int(threshold / dt) + 3
    while n <= limit:
        if (acc > threshold) if strict else (acc >= threshold):
            return n
        acc += dt
        n += 1
    return n


@dataclasses.dataclass(frozen=True)
class HeliEnv:
    """Static env definition. Instances are cheap, hashable, and close over
    all parameters so jitted step functions constant-fold everything."""
    params: HeliParams
    task: Task
    terrain: terrain_ops.Terrain
    wind_params: dryden.WindParams
    max_time: float = 40.0           # [s] episode wall (helicopter.py:34)
    dt: float = DT
    trim_cond: Tuple[Tuple[str, object], ...] = ()

    # -- construction -----------------------------------------------------
    @classmethod
    def build(cls, heli_name: str = "aw109", task: Optional[Task] = None,
              max_time: float = 40.0, flat_ground: bool = False,
              trim_cond: Optional[dict] = None) -> "HeliEnv":
        params = load_params(heli_name)
        terr = (terrain_ops.flat_terrain(params.ENV) if flat_ground
                else terrain_ops.load_terrain(params.ENV))
        return cls(params=params, task=task or Task(), terrain=terr,
                   wind_params=dryden.WindParams.from_env(params.ENV),
                   max_time=max_time,
                   trim_cond=tuple(sorted((trim_cond or {}).items(),
                                          key=lambda kv: kv[0])))

    def replace(self, **kw) -> "HeliEnv":
        return dataclasses.replace(self, **kw)

    def to_backend(self, backend: str) -> "HeliEnv":
        """Copy of this env with its device-resident data (terrain arrays)
        committed to `backend`, so jitted steps compile there. Used by the
        single-env gym wrapper to run on the host CPU, where one env's
        microseconds of math beat any accelerator round trip."""
        dev = jax.local_devices(backend=backend)[0]
        terr = dataclasses.replace(
            self.terrain,
            hmap=jax.device_put(self.terrain.hmap, dev),
            normal=jax.device_put(self.terrain.normal, dev))
        return self.replace(terrain=terr)

    # -- derived static quantities ---------------------------------------
    @property
    def normalizers(self) -> Normalizers:
        return Normalizers.from_params(self.params)

    @property
    def success_duration(self) -> float:
        return self.max_time / 4.0   # helicopter.py:91

    @property
    def time_up_steps(self) -> int:
        return _accum_steps_until(self.max_time, self.dt, strict=True)

    @property
    def success_steps_required(self) -> int:
        return _accum_steps_until(self.success_duration, self.dt, strict=False)

    def default_trim_cond(self) -> dict:
        cond = {"yaw": 0.0, "yaw_rate": 0.0, "ned_vel": [0.0, 0.0, 0.0],
                "gr_alt": 100.0, "xy": [0.0, 0.0], "psi_mr": 0.0, "psi_tr": 0.0}
        cond.update(dict(self.trim_cond))
        return cond

    # -- physics sub-steps -------------------------------------------------
    # All sub-steps are batch-polymorphic: state fields may be () or (B,);
    # no vmap is involved (see ops/state.py design note).

    def heli_step(self, heli: HeliState, action4, wind_ned3, hmap=None):
        """One helicopter RK4 step + post-step angle wrap
        (dynamics.py:158-171, helicopter_dynamics.py:73-77)."""
        h_ground = terrain_ops.ground_height(self.terrain, heli.x, heli.y,
                                             hmap=hmap)
        return self.heli_step_with_h(heli, action4, wind_ned3, h_ground)

    def heli_step_with_h(self, heli: HeliState, action4, wind_ned3, h_ground):
        """heli_step with the committed-state terrain height precomputed —
        the seam the fused Pallas path uses (terrain gathers stay in XLA).
        `action4`/`wind_ned3` are tuples of (batched) scalars."""
        def f(s):
            dots, obs, _ = eom.heli_dynamics(self.params, s, action4, wind_ned3,
                                             h_ground)
            return dots, obs

        new, k4, obs = rk4(f, heli, self.dt)
        new = new.replace(psi_mr=pi_bound(new.psi_mr), psi_tr=pi_bound(new.psi_tr),
                          b0=pi_bound(new.b0), b1=pi_bound(new.b1),
                          phi=pi_bound(new.phi), theta=pi_bound(new.theta),
                          psi=pi_bound(new.psi))
        return new, k4, obs

    def wind_step(self, wind: WindState, wind_action4, eta3):
        """One Dryden step with the reference's aliased-k4 integrator."""
        def f(s):
            dots, obs = dryden.wind_dynamics(self.wind_params, s, wind_action4, eta3)
            return dots, obs

        new, _, wind_ned = rk4_k4only(f, wind, self.dt)
        return new, wind_ned

    def step_physics(self, heli: HeliState, wind: WindState, wind_action4,
                     eta3, action4, h_ground, task_id=None):
        """Wind + helicopter + reward, no RNG/terrain/termination: the exact
        code the fused Pallas kernel runs on lane-batched rows."""
        wind_new, wind_ned = self.wind_step(wind, wind_action4, eta3)
        heli_new, dots, obs = self.heli_step_with_h(heli, action4, wind_ned,
                                                    h_ground)
        reward, success_step = self.task.reward(self.normalizers, heli_new,
                                                dots, task_id=task_id)
        return wind_new, wind_ned, heli_new, dots, obs, reward, success_step

    # -- the env step ------------------------------------------------------
    def step(self, es: EnvState, action, hmap=None) -> Tuple[EnvState, StepOutput]:
        """Pure env transition (single env; vmap for batches).

        `hmap`: the terrain heightmap as an argument-plumbed device array.
        Hot loops MUST pass it (vmap in_axes=None); closing over the default
        `terrain.hmap` constant costs ~100 us per scan iteration on TPU (see
        ops/terrain.py docstring)."""
        key, eta_key = jax.random.split(es.key)
        eta = jax.random.normal(eta_key, (3,), dtype=jnp.float32) * (1.0 / self.dt) ** 0.5
        return self.step_with_eta(es.replace(key=key), action, eta, hmap=hmap)

    def step_with_eta(self, es: EnvState, action, eta, hmap=None) -> Tuple[EnvState, StepOutput]:
        """Env transition with the Dryden white noise injected explicitly —
        the seam that lets golden tests replay the reference's recorded noise
        (SURVEY.md §5 RNG). `eta` must already be scaled by 1/sqrt(dt)."""
        key = es.key
        wind_action = (es.obs[..., 4], es.obs[..., 5], es.obs[..., 6],
                       es.obs[..., 16])
        action4 = tuple(action[..., i] for i in range(4))
        eta3 = tuple(eta[..., i] for i in range(3))
        h_ground = terrain_ops.ground_height(self.terrain, es.heli.x, es.heli.y,
                                             hmap=hmap)
        wind_new, wind_ned, heli_new, dots, obs_t, reward, success_step = (
            self.step_physics(es.heli, es.wind, wind_action, eta3, action4,
                              h_ground, task_id=es.task_id))
        obs = jnp.stack(obs_t, axis=-1)
        steps = es.steps + 1

        failed = self._is_failed(heli_new, dots, hmap=hmap)
        successed = es.successed_steps >= self.success_steps_required
        time_up = steps >= self.time_up_steps
        # The reference writes `done = ... or reward == np.nan` intending a NaN
        # guard that never fires (helicopter.py:203). Implemented correctly
        # here, plus a non-finite state failsafe: tumbling through gimbal lock
        # (|theta| -> 90 deg) produces inf Euler rates without tripping the
        # signed crash tests, and an un-terminated NaN env would poison a
        # whole training batch.
        bad = _non_finite(reward) | _non_finite(heli_new.z) | _non_finite(heli_new.u)
        done = failed | successed | bad
        failed = failed | bad
        successed_steps = es.successed_steps + success_step.astype(jnp.int32)

        new_es = EnvState(heli=heli_new, wind=wind_new, dots=dots, obs=obs,
                          wind_ned=jnp.stack(wind_ned, axis=-1), steps=steps,
                          successed_steps=successed_steps, key=key, init=es.init,
                          task_id=es.task_id)
        out = StepOutput(obs=obs, reward=reward, done=done, truncated=time_up,
                         failed=failed, successed=successed, time_up=time_up)
        return new_es, out

    def _is_failed(self, heli: HeliState, dots: HeliState, hmap=None):
        """Crash / out-of-bounds detection (helicopter.py:226-234). The roll
        and pitch comparisons are signed, as in the reference."""
        p = self.params
        touch_alt = terrain_ops.ground_touching_altitude(p, self.terrain,
                                                         heli.x, heli.y,
                                                         hmap=hmap)
        cond1 = (-heli.z) - touch_alt < 0.0
        cond2 = dots.z > p.MR.V_TIP * 0.05
        cond3 = heli.phi > 60.0 * D2R
        cond4 = heli.theta > 60.0 * D2R
        cond5 = ((jnp.abs(heli.x) > p.ENV.NS_MAX / 2.0)
                 | (jnp.abs(heli.y) > p.ENV.EW_MAX / 2.0)
                 | ((-heli.z) > touch_alt + 10000.0))
        return (cond1 & (cond2 | cond3 | cond4)) | cond5

    # -- reset -------------------------------------------------------------
    def trim_result(self, trim_cond: Optional[dict] = None,
                    use_cache: bool = True) -> TrimResult:
        """Newton trim for the given condition, with a small persistent disk
        cache: trim is deterministic in (model, condition, mean wind), and the
        host solve costs seconds — repeated runs and tests reuse it."""
        cond = self.default_trim_cond()
        cond.update(trim_cond or {})
        if not use_cache:
            return trim(self.params, self.terrain,
                        dryden.mean_wind(self.wind_params), cond)
        cached = _trim_cache_load(self.params.name, self.wind_params, cond)
        if cached is not None:
            return cached
        tr = trim(self.params, self.terrain,
                  dryden.mean_wind(self.wind_params), cond)
        _trim_cache_store(self.params.name, self.wind_params, cond, tr)
        return tr

    def reset_from_trim(self, tr: TrimResult, key) -> Tuple[EnvState, jnp.ndarray]:
        """EnvState at a solved trim point (reference reset, helicopter.py:208-217).
        Like the very first reference reset, the trim was computed under the
        mean wind; Dryden filter states start at zero."""
        # Trim solves on the host CPU; move the result to the default backend
        # so subsequent jitted steps compile for the accelerator. Assembly is
        # jitted: per-op eager dispatch is prohibitively slow on tunneled TPUs.
        tr = jax.device_put(tr, jax.devices()[0])
        es = _assemble_env_state(tr.state, tr.dots, tr.obs,
                                 dryden.mean_wind(self.wind_params), key)
        return es, tr.obs

    def reset(self, key, trim_cond: Optional[dict] = None) -> Tuple[EnvState, jnp.ndarray]:
        """Host-side trim solve + state assembly."""
        return self.reset_from_trim(self.trim_result(trim_cond), key)


@jax.jit
def _assemble_env_state(trim_state: HeliState, trim_dots: HeliState,
                        trim_obs, wind_mean, key) -> EnvState:
    snap = ResetSnapshot(heli=trim_state, wind=WindState.zeros(),
                         dots=trim_dots, obs=trim_obs, wind_ned=wind_mean)
    return EnvState(heli=trim_state, wind=snap.wind, dots=trim_dots,
                    obs=trim_obs, wind_ned=wind_mean,
                    steps=jnp.zeros((), jnp.int32),
                    successed_steps=jnp.zeros((), jnp.int32), key=key,
                    init=snap)
