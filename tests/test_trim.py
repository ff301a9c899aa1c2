"""Trim-solver tests: residual convergence + closeness to the reference's
Newton fixed points (SURVEY.md §4 item 3)."""
import ast

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heligym_tpu.envs.trim as trim_mod
from heligym_tpu.models import load_params
from heligym_tpu.ops import dryden, terrain as T


@pytest.fixture(scope="module")
def setup():
    p = load_params("aw109")
    terr = T.load_terrain(p.ENV)
    wind = dryden.mean_wind(dryden.WindParams.from_env(p.ENV))
    return p, terr, wind


def _default_cond(over=None):
    cond = {"yaw": 0.0, "yaw_rate": 0.0, "ned_vel": [0.0, 0.0, 0.0],
            "gr_alt": 100.0, "xy": [0.0, 0.0], "psi_mr": 0.0, "psi_tr": 0.0}
    cond.update(over or {})
    return cond


def test_trim_matches_reference_conditions(fixtures, setup):
    p, terr, wind = setup
    f = fixtures("trim")
    for i in range(int(f["n"])):
        cond = _default_cond(ast.literal_eval(str(f[f"cond{i}_json"])))
        tr = trim_mod.trim(p, terr, wind, cond)
        ours = np.asarray(tr.state.flatten())
        ref = f[f"cond{i}_state"]
        # Newton converges to the same fixed point within the residual
        # tolerance; velocities/angles O(1..500)
        scale = np.maximum(np.abs(ref), 1.0)
        np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-3,
                                   err_msg=f"trim cond {i}: {cond}")
        np.testing.assert_allclose(np.asarray(tr.action), f[f"cond{i}_action"],
                                   atol=2e-3)


def test_trim_residual_small(setup):
    p, terr, wind = setup
    for over in [{}, {"ned_vel": [80.0, 0.0, 0.0], "gr_alt": 2000.0}]:
        cond = _default_cond(over)
        base, h, residual = trim_mod.residual_fn(p, terr, wind, cond)
        tr = trim_mod.trim(p, terr, wind, cond)
        x = np.concatenate([
            np.atleast_1d(np.asarray(tr.state.vi_mr) / p.MR.V_TIP),
            np.atleast_1d(np.asarray(tr.state.vi_tr) / p.TR.V_TIP),
            np.asarray(tr.state.betas),
            np.asarray(tr.state.uvw) / p.MR.V_TIP,
            np.asarray(tr.state.pqr) / p.MR.OMEGA,
            np.asarray(tr.state.euler[:2]),
            np.asarray(tr.action)]).astype(np.float32)
        y = np.asarray(residual(jnp.asarray(x)))
        y_target = np.zeros(16, np.float32)
        y_target[-4] = cond["yaw_rate"]
        y_target[-3:] = np.asarray(cond["ned_vel"], np.float32) / p.MR.R
        assert float(((y - y_target) ** 2).sum()) < 1e-4


def test_trim_batched_device(setup):
    """On-device batched Newton agrees with the host solver."""
    p, terr, wind = setup
    conds = {
        "yaw": np.zeros(3, np.float32),
        "yaw_rate": np.zeros(3, np.float32),
        "ned_vel": np.asarray([[0, 0, 0], [50, 0, 0], [100, 10, 0]], np.float32),
        "gr_alt": np.asarray([100.0, 1000.0, 3000.0], np.float32),
        "xy": np.zeros((3, 2), np.float32),
        "psi_mr": np.zeros(3, np.float32),
        "psi_tr": np.zeros(3, np.float32),
    }
    batched = trim_mod.trim_batched(p, terr, wind, conds)
    for i, ned in enumerate([[0.0, 0.0, 0.0], [50.0, 0.0, 0.0], [100.0, 10.0, 0.0]]):
        host = trim_mod.trim(p, terr, wind, _default_cond(
            {"ned_vel": ned, "gr_alt": float(conds["gr_alt"][i])}))
        ours = np.asarray(jax.tree_util.tree_map(lambda x: x[i], batched).state.flatten())
        ref = np.asarray(host.state.flatten())
        scale = np.maximum(np.abs(ref), 1.0)
        np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-3)
