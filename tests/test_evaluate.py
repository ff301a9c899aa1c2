"""Evaluation harness: per-episode outcome stats from one jitted scan
(learner/evaluate.py). The env-side semantics under test are the latched
first-termination bookkeeping — success/fail/timeout must partition the
episode set, matching how the reference scores episodes one at a time
(helicopter.py:236-249)."""
import jax
import numpy as np
import pytest

from heligym_tpu.learner import PPOConfig, PPOLearner
from heligym_tpu.learner.evaluate import evaluate
from heligym_tpu.parallel import make_env_mesh

pytestmark = pytest.mark.quick


def test_evaluate_partitions_outcomes(hover_env):
    cfg = PPOConfig(num_envs=8, rollout_steps=4, minibatches=2, epochs=1,
                    hidden=(32, 32), log_std_init=-2.5)
    learner = PPOLearner(hover_env, cfg, mesh=make_env_mesh(jax.devices()[:1]))
    ts = learner.init(jax.random.PRNGKey(0))
    res = evaluate(hover_env, learner, ts, episodes=4, steps=30,
                   key=jax.random.PRNGKey(1))
    assert res["episodes"] == 4
    total = res["success_frac"] + res["fail_frac"] + res["timeout_frac"]
    assert abs(total - 1.0) < 1e-6
    # an untrained trim-centered mean policy neither succeeds nor crashes
    # within 30 steps (success needs 10 s of in-tolerance time)
    assert res["success_frac"] == 0.0
    assert np.isfinite(res["mean_episode_reward"])


def test_evaluate_per_task_breakdown(hover_env):
    from heligym_tpu.envs.tasks import HoverTask, LandingTask, MixedTask
    env = hover_env.replace(task=MixedTask(tasks=(HoverTask(), LandingTask())))
    cfg = PPOConfig(num_envs=8, rollout_steps=4, minibatches=2, epochs=1,
                    hidden=(32, 32), log_std_init=-2.5)
    learner = PPOLearner(env, cfg, mesh=make_env_mesh(jax.devices()[:1]))
    ts = learner.init(jax.random.PRNGKey(0))
    task_ids = np.arange(4) % 2
    res = evaluate(env, learner, ts, episodes=4, steps=20,
                   key=jax.random.PRNGKey(2), task_ids=task_ids)
    assert "success_frac_t0" in res and "success_frac_t1" in res
