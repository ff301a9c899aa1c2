"""Vector-env tests: vmap-vs-single consistency and auto-reset semantics
(SURVEY.md §4 item 4)."""
import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import VectorHeliEnv
from heligym_tpu.envs.vector import rollout


def test_vmap_n1_matches_single(hover_env, hover_trim):
    """A batch of one env must reproduce the single-env trajectory exactly
    (same key, same actions): vmap is a pure batching transform."""
    key = jax.random.PRNGKey(3)
    venv = VectorHeliEnv(hover_env, num_envs=1, auto_reset=False)
    ves, _ = venv.reset_from_trim(hover_trim, key)

    es, _ = hover_env.reset_from_trim(hover_trim, jax.random.fold_in(key, 0))
    act = jnp.asarray(hover_trim.action)
    step1 = jax.jit(hover_env.step)
    for _ in range(20):
        ves, vout = venv.step(ves, act[None])
        es, out = step1(es, act)
        np.testing.assert_array_equal(np.asarray(vout.obs[0]), np.asarray(out.obs))
        np.testing.assert_array_equal(np.asarray(vout.reward[0]), np.asarray(out.reward))


def test_envs_decorrelate(hover_env, hover_trim):
    """Different env indices draw different turbulence."""
    venv = VectorHeliEnv(hover_env, num_envs=4, auto_reset=False)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
    act = jnp.tile(jnp.asarray(hover_trim.action), (4, 1))
    for _ in range(30):
        es, out = venv.step(es, act)
    obs = np.asarray(out.obs)
    assert not np.allclose(obs[0], obs[1])


def test_auto_reset_restores_snapshot(hover_env, hover_trim):
    """Force a crash in one env; on the step it terminates the state must be
    replaced by the episode's initial (trim) state."""
    venv = VectorHeliEnv(hover_env, num_envs=2, auto_reset=True)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(1))
    dive = jnp.asarray(hover_trim.action).at[0].set(-1.0)
    acts = jnp.stack([dive, jnp.asarray(hover_trim.action)])
    done_seen = False
    for _ in range(400):
        prev_steps = np.asarray(es.steps).copy()
        es, out = venv.step(es, acts)
        if bool(out.done[0]) or bool(out.truncated[0]):
            done_seen = True
            # env 0 snapped back to trim obs & zero counters
            np.testing.assert_array_equal(np.asarray(out.obs[0]),
                                          np.asarray(hover_trim.obs))
            assert int(es.steps[0]) == 0
            assert int(es.steps[1]) == prev_steps[1] + 1
            break
    assert done_seen, "dive action never terminated the episode"


def test_scan_rollout_matches_loop(hover_env, hover_trim):
    venv = VectorHeliEnv(hover_env, num_envs=3, auto_reset=True)
    es0, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(5))
    policy = lambda p, obs: jnp.tile(jnp.asarray(hover_trim.action), (obs.shape[0], 1))
    final, outs = jax.jit(lambda es: rollout(venv, es, policy, 25))(es0)
    # python-loop equivalent
    es = es0
    for t in range(25):
        es, out = venv.step(es, policy(None, es.obs))
    # scan-compiled and step-compiled programs may fuse float ops differently;
    # agreement is to within a few ulps per step
    np.testing.assert_allclose(np.asarray(final.heli.uvw), np.asarray(es.heli.uvw),
                               rtol=0, atol=1e-4)
    assert outs.obs.shape == (25, 3, 17)
