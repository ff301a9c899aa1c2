"""Full state-derivative + observation parity over 256 random states
(SURVEY.md §4 item 2), gear-contact cases included."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.models import load_params
from heligym_tpu.ops import terrain as T
from heligym_tpu.ops.eom import heli_dynamics
from heligym_tpu.ops.state import HeliState

pytestmark = pytest.mark.quick  # ~2-minute smoke tier: pytest -m quick


def test_dynamics_matches_reference(fixtures):
    f = fixtures("dynamics")
    p = load_params("aw109")
    terr = T.load_terrain(p.ENV)

    def batch(vecs, actions, winds):
        # batch-polymorphic physics: no vmap, batched fields straight through
        s = HeliState.unflatten(vecs)
        h = T.ground_height(terr, s.x, s.y)
        dots, obs, _ = heli_dynamics(
            p, s, tuple(actions[:, i] for i in range(4)),
            tuple(winds[:, i] for i in range(3)), h)
        return dots.flatten(), jnp.stack(obs, axis=-1)

    dots, obs = jax.jit(batch)(
        jnp.asarray(f["states"]), jnp.asarray(f["actions"]), jnp.asarray(f["winds"]))
    dots, obs = np.asarray(dots), np.asarray(obs)
    ref_dots, ref_obs = f["dots"], f["obs"]

    # State derivative blocks, tolerance scaled to each block's magnitude.
    blocks = {"vi_mr": (0, 1), "vi_tr": (1, 2), "psi": (2, 4), "betas": (4, 6),
              "uvw": (6, 9), "pqr": (9, 12), "euler": (12, 15), "xyz": (15, 18)}
    for name, (a, b) in blocks.items():
        scale = max(np.abs(ref_dots[:, a:b]).max(), 1.0)
        np.testing.assert_allclose(
            dots[:, a:b] / scale, ref_dots[:, a:b] / scale, atol=5e-5,
            err_msg=f"dots block {name}")

    # Observation: power (hp), velocities, angles, positions.
    scale = np.maximum(np.abs(ref_obs).max(axis=0), 1.0)
    np.testing.assert_allclose(obs / scale, ref_obs / scale, atol=5e-5)
