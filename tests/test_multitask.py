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