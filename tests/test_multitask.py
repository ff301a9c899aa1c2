"""Task-conditioned multi-task batches (BASELINE.json config #3):
forward-flight + oblique-flight envs stepping in one lockstep batch, each
env's reward selected by its per-env task_id — including through the fused
Pallas rollout."""
import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import (ForwardFlightTask, MixedTask, ObliqueFlightTask,
                              VectorHeliEnv)
from heligym_tpu.ops.pallas import build_fused_rollout


def _mixed_env(hover_env):
    return hover_env.replace(task=MixedTask(
        tasks=(ForwardFlightTask(), ObliqueFlightTask())))


def test_mixed_rewards_match_per_task(hover_env, hover_trim):
    env = _mixed_env(hover_env)
    B = 4
    venv = VectorHeliEnv(env, B, auto_reset=False)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
    es = venv.assign_tasks(es, [0, 1, 0, 1])
    act = jnp.tile(jnp.asarray(hover_trim.action), (B, 1))
    for _ in range(5):
        es, out = venv.step(es, act)
    mixed_rewards = np.asarray(out.reward)

    # single-task batches with the same keys reproduce each slice
    for tid, task in ((0, ForwardFlightTask()), (1, ObliqueFlightTask())):
        venv_t = VectorHeliEnv(hover_env.replace(task=task), B,
                               auto_reset=False)
        es_t, _ = venv_t.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
        for _ in range(5):
            es_t, out_t = venv_t.step(es_t, act)
        ref = np.asarray(out_t.reward)
        for i in range(B):
            if i % 2 == tid:
                np.testing.assert_allclose(mixed_rewards[i], ref[i], rtol=1e-6)


def test_task_conditioned_learner(hover_env):
    """MixedTask learner appends the task one-hot to the network input
    (round-3 verdict: a task-blind policy cannot succeed deterministically
    when sub-tasks start from the identical trim state). Pins: input width,
    task-distinguishable policy output, a finite fused train step, and the
    evaluator's task conditioning."""
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.learner.evaluate import make_evaluator
    from heligym_tpu.parallel import make_env_mesh

    env = _mixed_env(hover_env)
    cfg = PPOConfig(num_envs=128, rollout_steps=4, minibatches=2, epochs=1,
                    hidden=(32, 32))
    learner = PPOLearner(env, cfg, mesh=make_env_mesh(jax.devices()[:1]))
    assert learner.task_dim == 2
    task_ids = np.arange(cfg.num_envs) % 2
    ts = learner.init(jax.random.PRNGKey(0), task_ids=task_ids)
    # first Dense layer consumes obs + one-hot
    k0 = ts.params["params"]["Dense_0"]["kernel"]
    assert k0.shape[0] == 17 + 2
    # identical obs, different task id -> different deterministic action
    obs = jnp.zeros((2, 17), jnp.float32)
    toh = learner._task_oh(jnp.asarray([0, 1]))
    acts = learner.policy(ts.params, obs, obs_stats=ts.obs_stats,
                          task_oh=toh)
    assert not np.allclose(np.asarray(acts[0]), np.asarray(acts[1]))
    # one full (fused-path) train step runs and stays finite (the jitted
    # step DONATES its input TrainState — only the returned state is live)
    step = learner.train_step_fn()
    ts2, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert "success_ep_frac_t0" in metrics and "success_ep_frac_t1" in metrics
    # task one-hot must ride the rollout into the minibatch loss: a second
    # step from the updated state also stays finite
    ts3, m3 = step(ts2)
    assert np.isfinite(float(m3["loss"]))
    # evaluator conditions on es.task_id and reports per-task fractions
    ev = make_evaluator(env, learner, episodes=4, steps=5,
                        task_ids=np.arange(4) % 2)
    r = ev(ts3, jax.random.PRNGKey(2))
    assert "success_frac_t0" in r and "success_frac_t1" in r


def test_task_conditioned_learner_sharded(hover_env):
    """The task one-hot must thread through the shard_map-wrapped fused
    collector: it is per-env state, so it shards along the env axis with the
    farm (P(ENV_AXIS) in the policy-carry spec) while params stay
    replicated."""
    import pytest
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.parallel import make_env_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 simulated devices")
    env = _mixed_env(hover_env)
    cfg = PPOConfig(num_envs=8 * 128, rollout_steps=2, minibatches=2,
                    epochs=1, hidden=(16, 16))
    learner = PPOLearner(env, cfg, mesh=make_env_mesh(devs))
    assert learner.train_step_uses_fused()
    task_ids = np.arange(cfg.num_envs) % 2
    ts = learner.init(jax.random.PRNGKey(0), task_ids=task_ids)
    ts, metrics = learner.train_step_fn()(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["success_ep_frac_t1"]))


def test_mixed_through_fused_rollout(hover_env, hover_trim):
    """Identical injected Dryden noise through both paths (the production
    fused path pre-draws its noise per rollout, so LIVE streams differ by
    design — see fused_step.py noise design v2); what is under test here is
    the per-env task_id reward selection inside the kernel."""
    env = _mixed_env(hover_env)
    B, STEPS = 128, 10
    venv = VectorHeliEnv(env, B)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(1))
    task_ids = jnp.arange(B) % 2
    es = venv.assign_tasks(es, task_ids)
    acts = jnp.tile(jnp.asarray(hover_trim.action), (B, 1))
    eta_seq = (jax.random.normal(jax.random.PRNGKey(3), (STEPS, 3, B))
               * (1.0 / env.dt) ** 0.5)

    roll = jax.jit(build_fused_rollout(env, B, STEPS, collect=("reward",),
                                       eta_mode="inject"))
    es_f, outs = roll(es, acts, eta_seq)
    fused_rewards = np.asarray(outs["reward"])

    from heligym_tpu.envs.vector import auto_reset as do_reset

    @jax.jit
    def unfused_step(es, eta):
        new_es, out = jax.vmap(env.step_with_eta)(es, acts, eta.T)
        return do_reset(new_es, out)

    es_u = es
    for t in range(STEPS):
        es_u, out = unfused_step(es_u, eta_seq[t])
    np.testing.assert_allclose(fused_rewards[-1], np.asarray(out.reward),
                               atol=2e-5)
    # the two task populations genuinely get different rewards
    assert not np.allclose(fused_rewards[-1][task_ids == 0].mean(),
                           fused_rewards[-1][task_ids == 1].mean())