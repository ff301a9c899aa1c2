"""Dryden turbulence parity: injected-noise trajectory match per altitude
regime (SURVEY.md §4 item 5) plus distributional sanity of the jax.random path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.models import load_params
from heligym_tpu.ops import dryden
from heligym_tpu.ops.integrator import rk4_k4only
from heligym_tpu.ops.state import WindState
from heligym_tpu.utils.constants import DT

pytestmark = pytest.mark.quick  # ~2-minute smoke tier: pytest -m quick


@pytest.fixture(scope="module")
def wp():
    return dryden.WindParams.from_env(load_params("aw109").ENV)


@pytest.mark.parametrize("regime", ["low", "mid", "high"])
def test_wind_trajectory_matches_reference(fixtures, wp, regime):
    f = fixtures("wind")
    etas = f[f"{regime}_eta"].astype(np.float32)
    action = jnp.asarray(f[f"{regime}_action"])

    action4 = tuple(action[i] for i in range(4))

    @jax.jit
    def step(ws, eta):
        def rhs(s):
            return dryden.wind_dynamics(wp, s, action4,
                                        (eta[0], eta[1], eta[2]))
        new, _, obs = rk4_k4only(rhs, ws, DT)
        return new, jnp.stack(obs, axis=-1)

    ws = WindState.zeros()
    states, obs_list = [], []
    for eta in etas:
        ws, obs = step(ws, jnp.asarray(eta))
        states.append(np.concatenate([np.atleast_1d(np.asarray(ws.us)),
                                      np.asarray(ws.vs), np.asarray(ws.ws)]))
        obs_list.append(np.asarray(obs))
    states = np.stack(states)
    obs_arr = np.stack(obs_list)

    # reference computes filter coefficients in float64 (wind_dynamics.py:96);
    # ours are float32 -> small relative drift over 500 steps
    scale = np.maximum(np.abs(f[f"{regime}_states"]).max(axis=0), 1e-3)
    np.testing.assert_allclose(states / scale, f[f"{regime}_states"] / scale,
                               atol=2e-3)
    oscale = np.maximum(np.abs(f[f"{regime}_obs"]).max(axis=0), 1e-3)
    np.testing.assert_allclose(obs_arr / oscale, f[f"{regime}_obs"] / oscale,
                               atol=2e-3)


def test_turbulence_distribution_matches_reference(fixtures, wp):
    """The jax.random noise path reproduces the reference's turbulence
    *distribution* (per-component std within 20%), which is the strongest
    statement possible once the global numpy RNG is replaced (SURVEY.md §5)."""
    f = fixtures("wind")
    action = jnp.asarray(f["low_action"])

    action4 = tuple(action[i] for i in range(4))

    @jax.jit
    def step(carry, key):
        ws = carry
        eta = jax.random.normal(key, (3,), jnp.float32) * (1.0 / DT) ** 0.5

        def rhs(s):
            return dryden.wind_dynamics(wp, s, action4,
                                        (eta[0], eta[1], eta[2]))
        new, _, obs = rk4_k4only(rhs, ws, DT)
        return new, jnp.stack(obs, axis=-1)

    def run_chain(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), 500)
        _, obs = jax.lax.scan(step, WindState.zeros(), keys)
        return obs

    # ensemble of 64 independent 500-step chains, same horizon as the fixture
    obs = jax.jit(jax.vmap(run_chain))(jnp.arange(64))
    turb = np.asarray(obs) - np.asarray(dryden.mean_wind(wp))
    stds = turb.std(axis=1)                      # (64, 3) per-chain stds
    ref_std = (f["low_obs"] - np.asarray(dryden.mean_wind(wp))).std(axis=0)
    for i in range(3):
        lo, hi = stds[:, i].min(), stds[:, i].max()
        assert lo * 0.8 <= ref_std[i] <= hi * 1.2, \
            f"component {i}: ref std {ref_std[i]:.3f} outside ours [{lo:.3f},{hi:.3f}]"
