"""New tasks beyond the reference's shipped set (completing its TODO roadmap):
turning flight, slalom, landing. Behavior checks: finite shaped rewards,
sensible gradients toward the target behavior, gym registration."""
import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heligym_tpu  # noqa: F401
from heligym_tpu.envs import HeliEnv
from heligym_tpu.envs.tasks import (LandingTask, Normalizers, SlalomTask,
                                    TurningFlightTask)
from heligym_tpu.ops.state import HeliState


@pytest.fixture(scope="module")
def norm(hover_env):
    return hover_env.normalizers


def _state(**kw):
    s = HeliState.zeros()
    return s.replace(**{k: jnp.float32(v) for k, v in kw.items()})


def test_registration():
    for env_id in ("HeliTurningFlight-v0", "HeliSlalom-v0", "HeliLanding-v0"):
        assert env_id in gym.registry


def test_turning_shaping_directionality(norm):
    """House reward style: the terminal (derivative) term rewards moving
    toward the target and punishes moving away; large errors kill success."""
    task = TurningFlightTask(yaw_rate=0.15, vel=60.0, sea_alt=4000.0)
    base = dict(u=60.0, z=-4000.0)
    accel = _state(x=60.0, r=5.0)       # yaw accelerating positively
    # below target yaw rate + positive yaw accel => moving toward target
    r_toward, _ = task.reward(norm, _state(r=0.0, **base), accel)
    # above target + positive accel => moving away
    r_away, _ = task.reward(norm, _state(r=0.5, **base), accel)
    assert float(r_toward) > 0 > float(r_away)
    # far-off yaw rate kills the success predicate
    _, s_far = task.reward(norm, _state(r=5.0, **base), _state(x=60.0))
    assert not bool(s_far)
    _, s_on = task.reward(norm, _state(r=0.15, **base), _state(x=60.0))
    assert bool(s_on)


def test_slalom_shaping_directionality(norm):
    task = SlalomTask(amplitude=150.0, wavelength=2000.0, vel=80.0,
                      sea_alt=4000.0)
    # at x=500 (quarter wavelength) the reference track is at y=+150
    base = dict(x=500.0, u=80.0, z=-4000.0)
    moving_east = _state(x=80.0, y=30.0)
    # west of track, moving east => toward the track
    r_toward, _ = task.reward(norm, _state(y=-150.0, **base), moving_east)
    # east of track, moving further east => away
    r_away, _ = task.reward(norm, _state(y=450.0, **base), moving_east)
    assert float(r_toward) > float(r_away)
    # being far off track kills success
    _, s_off = task.reward(norm, _state(y=-500.0, **base), _state(x=80.0))
    assert not bool(s_off)


def test_landing_success_when_settled(norm, hover_env):
    task = LandingTask()
    settled = _state(x=0.0, y=0.0, z=-1650.0)
    rew, success = task.reward(norm, settled, _state())
    assert bool(success)
    moving = _state(u=20.0)
    _, success2 = task.reward(norm, moving, _state())
    assert not bool(success2)


def test_task_envs_step(hover_env, hover_trim):
    """Each new task runs through the full env step with finite outputs."""
    for task in (TurningFlightTask(), SlalomTask(), LandingTask()):
        env = hover_env.replace(task=task)
        es, _ = env.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        for _ in range(5):
            es, out = step(es, jnp.asarray(hover_trim.action))
        assert np.isfinite(float(out.reward))
        assert np.isfinite(np.asarray(out.obs)).all()