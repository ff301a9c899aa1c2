"""HeliVectorGymEnv facade + randomized device-trim resets."""
import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import HeliVectorGymEnv, VectorHeliEnv


def test_vector_gym_api():
    venv = HeliVectorGymEnv(4)
    obs, info = venv.reset(seed=0)
    assert obs.shape == (4, 17)
    assert venv.action_space.shape == (4, 4)
    for _ in range(5):
        obs, rew, done, trunc, info = venv.step(np.zeros((4, 4), np.float32))
    assert np.isfinite(obs).all()
    assert rew.shape == (4,)
    venv.close()


def test_vector_gym_reset_seeding():
    """Gymnasium seeding semantics: unseeded resets draw fresh entropy (two
    in a row differ), seed=0 is reproducible and distinct from unseeded
    (regression: `seed or 0` aliased them and replayed one episode set)."""
    venv = HeliVectorGymEnv(2)
    venv.reset(seed=0)
    k_seed0 = np.asarray(venv._state.key).copy()
    venv.reset()
    k_unseeded_a = np.asarray(venv._state.key).copy()
    venv.reset()
    k_unseeded_b = np.asarray(venv._state.key).copy()
    venv.reset(seed=0)
    k_seed0_again = np.asarray(venv._state.key).copy()
    np.testing.assert_array_equal(k_seed0, k_seed0_again)   # seeded: reproducible
    assert not np.array_equal(k_unseeded_a, k_unseeded_b)   # unseeded: fresh
    assert not np.array_equal(k_seed0, k_unseeded_a)        # seed=0 != unseeded
    # the key drives the per-env noise stream: trajectories actually diverge
    venv.reset(seed=0)
    act = np.zeros((2, 4), np.float32)
    for _ in range(20):
        obs_a, *_ = venv.step(act)
    venv.reset()
    for _ in range(20):
        obs_b, *_ = venv.step(act)
    assert not np.allclose(obs_a, obs_b)
    venv.close()


def test_randomized_reset(hover_env):
    venv = VectorHeliEnv(hover_env, 4)

    def sampler(key, n):
        ks = jax.random.split(key, 2)
        return {
            "yaw": jnp.zeros(n),
            "yaw_rate": jnp.zeros(n),
            "ned_vel": jnp.zeros((n, 3)).at[:, 0].set(
                jax.random.uniform(ks[0], (n,), minval=0.0, maxval=60.0)),
            "gr_alt": jax.random.uniform(ks[1], (n,), minval=300.0, maxval=2500.0),
            "xy": jnp.zeros((n, 2)),
            "psi_mr": jnp.zeros(n),
            "psi_tr": jnp.zeros(n),
        }

    es, obs = venv.reset_randomized(jax.random.PRNGKey(3), sampler)
    alts = np.asarray(obs[:, 16])          # ground altitude
    assert (alts > 250).all() and (alts < 2600).all()
    assert len(np.unique(alts.round(0))) > 1   # actually randomized
    # stepping the randomized batch works and envs stay near their trims
    es, out = venv.step(es, jnp.zeros((4, 4)))
    assert np.isfinite(np.asarray(out.obs)).all()
    # auto-reset snapshots are per-env: force termination and check return
    # to per-env initial altitude
    dive = jnp.tile(jnp.asarray([-1.0, 0, 0, 0], jnp.float32), (4, 1))
    for _ in range(600):
        es, out = venv.step(es, dive)
        if bool(out.done.any()):
            break
    idx = int(np.argmax(np.asarray(out.done)))
    np.testing.assert_allclose(np.asarray(out.obs[idx, 16]), alts[idx],
                               atol=2.0)

def test_vector_gym_final_observation():
    """SAME_STEP autoreset convention: a terminating step must surface the
    pre-reset terminal obs via final_obs/final_observation (+ masks and
    final_info) so an external GAE bootstraps off the right state."""
    venv = HeliVectorGymEnv(4)
    obs, info = venv.reset(seed=0)
    dive = np.tile(np.array([-1.0, 0.0, 0.0, 0.0], np.float32), (4, 1))
    done = np.zeros(4, bool)
    for _ in range(600):
        obs, rew, done, trunc, info = venv.step(dive)
        if done.any():
            break
    assert done.any(), "dive never crashed"
    for key in ("final_obs", "final_observation", "final_info",
                "_final_obs", "_final_observation", "_final_info"):
        assert key in info, key
    np.testing.assert_array_equal(info["_final_observation"], done | trunc)
    i = int(np.argmax(done))
    fo = info["final_observation"][i]
    assert fo is not None and fo.shape == (17,)
    # the returned obs is the FRESH episode's first obs; the terminal one
    # (mid-crash, near the ground) must be the different, pre-reset state
    assert not np.allclose(fo, obs[i])
    assert info["final_info"][i] == {"failed": True, "successed": False}
    alive = ~(done | trunc)
    if alive.any():
        j = int(np.argmax(alive))
        assert info["final_observation"][j] is None
