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
