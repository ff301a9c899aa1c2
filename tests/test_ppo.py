"""PPO learner smoke tests: the full sharded train step compiles, runs, and
produces finite losses; policy improves value-loss over a few updates."""
import jax
import numpy as np
import pytest

from heligym_tpu.envs import HeliEnv
from heligym_tpu.envs.tasks import HoverTask
from heligym_tpu.learner import PPOConfig, PPOLearner
from heligym_tpu.parallel import make_env_mesh


@pytest.fixture(scope="module")
def learner(hover_env):
    devs = jax.devices()
    mesh = make_env_mesh(devs)
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=2,
                    hidden=(32, 32))
    return PPOLearner(hover_env, cfg, mesh=mesh)


def test_train_step_runs(learner):
    ts = learner.init(jax.random.PRNGKey(0))
    step = learner.train_step_fn()
    ts, metrics = step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(ts.update_count) == 1


def test_multiple_updates_stable(learner):
    ts = learner.init(jax.random.PRNGKey(1))
    step = learner.train_step_fn()
    for _ in range(3):
        ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert abs(float(metrics["approx_kl"])) < 1.0


def test_policy_deterministic_head(learner):
    ts = learner.init(jax.random.PRNGKey(2))
    obs = np.asarray(ts.env_state.obs)
    act = learner.policy(ts.params, obs)
    assert act.shape == (16, 4)
    assert (np.abs(np.asarray(act)) <= 1.0).all()
