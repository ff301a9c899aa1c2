"""Checkpoint/resume: EnvState round-trips bit-exactly and resumed rollouts
continue identically (SURVEY.md §5 checkpoint row)."""
import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import VectorHeliEnv
from heligym_tpu.utils import checkpoint as ckpt


def test_envstate_roundtrip_npz(tmp_path, hover_env, hover_trim):
    venv = VectorHeliEnv(hover_env, num_envs=4)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
    act = jnp.tile(jnp.asarray(hover_trim.action), (4, 1))
    for _ in range(5):
        es, _ = venv.step(es, act)

    path = str(tmp_path / "env_state.npz")
    ckpt.save_npz(path, es)
    restored = ckpt.load_npz(path, es)

    for a, b in zip(jax.tree_util.tree_leaves(es), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: both continue identically
    es1, o1 = venv.step(es, act)
    es2, o2 = venv.step(restored, act)
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))


def test_envstate_roundtrip_orbax(tmp_path, hover_env, hover_trim):
    venv = VectorHeliEnv(hover_env, num_envs=2)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(1))
    path = str(tmp_path / "orbax_ckpt")
    try:
        ckpt.save_pytree(path, es)
        restored = ckpt.restore_pytree(path, es)
    except Exception as e:  # pragma: no cover - orbax/env quirk
        import pytest
        pytest.skip(f"orbax unavailable in this environment: {e}")
    for a, b in zip(jax.tree_util.tree_leaves(es), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scaleup_resume_transplants_params(tmp_path, hover_env):
    """resume_num_envs: a checkpoint saved at one farm size warm-starts a
    larger farm — params/optimizer/obs-stats transplant, farm is fresh,
    schedules restart (learner/ppo.py::train)."""
    import pytest
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.parallel import make_env_mesh

    mesh = make_env_mesh(jax.devices()[:1])
    small_cfg = PPOConfig(num_envs=4, rollout_steps=4, minibatches=2,
                          epochs=1, hidden=(16, 16))
    small = PPOLearner(hover_env, small_cfg, mesh=mesh)
    ts_small = small.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "small.npz")
    small.save(path, ts_small)

    big = PPOLearner(hover_env,
                     PPOConfig(num_envs=8, rollout_steps=4, minibatches=2,
                               epochs=1, hidden=(16, 16)), mesh=mesh)
    # a plain restore into the bigger farm must refuse (treedef embeds size)
    with pytest.raises(ValueError):
        big.restore(path, big.init(jax.random.PRNGKey(1)))
    ts_big, _ = big.train(jax.random.PRNGKey(1), num_updates=0,
                          resume_from=path, resume_num_envs=4)
    for a, b in zip(jax.tree_util.tree_leaves(ts_small.params),
                    jax.tree_util.tree_leaves(ts_big.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ts_big.env_state.obs.shape[0] == 8
    assert int(ts_big.update_count) == 0
