"""Golden-trajectory tests: replay reference rollouts through the jitted env
step with the reference's recorded Dryden noise injected (SURVEY.md §4 item 1).

Float32 XLA vs float64-tinged NumPy cannot agree bit-for-bit over thousands of
chaotic steps; the contract here is: tight agreement over the first hundreds of
steps, bounded normalized drift over the full horizon, and exact agreement of
the discrete outcomes (crash step, termination flags, reward sign structure).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.envs import EnvState, HeliEnv, ResetSnapshot
from heligym_tpu.envs.tasks import ForwardFlightTask, HoverTask
from heligym_tpu.ops import dryden
from heligym_tpu.ops.state import HeliState, WindState


def replay(env: HeliEnv, st0, obs0, etas, actions):
    heli0 = HeliState.unflatten(jnp.asarray(st0))
    snap = ResetSnapshot(heli=heli0, wind=WindState.zeros(),
                         dots=jax.tree_util.tree_map(jnp.zeros_like, heli0),
                         obs=jnp.asarray(obs0, jnp.float32),
                         wind_ned=dryden.mean_wind(env.wind_params))
    es = EnvState(heli=heli0, wind=snap.wind, dots=snap.dots, obs=snap.obs,
                  wind_ned=snap.wind_ned, steps=jnp.zeros((), jnp.int32),
                  successed_steps=jnp.zeros((), jnp.int32),
                  key=jax.random.PRNGKey(0), init=snap)
    step = jax.jit(env.step_with_eta)
    obs_t, rew_t, done_t, trunc_t, flags, states = [], [], [], [], [], []
    for eta, act in zip(etas, actions):
        es, out = step(es, jnp.asarray(act), jnp.asarray(eta, jnp.float32))
        obs_t.append(np.asarray(out.obs, np.float64))
        rew_t.append(float(out.reward))
        done_t.append(bool(out.done))
        trunc_t.append(bool(out.truncated))
        flags.append([bool(out.failed), bool(out.successed), bool(out.time_up)])
        states.append(np.asarray(es.heli.flatten()))
        if done_t[-1] or trunc_t[-1]:
            break
    return (np.stack(obs_t), np.asarray(rew_t), np.asarray(done_t),
            np.asarray(trunc_t), np.asarray(flags), np.stack(states))


def _compare_traj(ours, ref, horizon_tight=200, tol_tight=2e-3, tol_full=5e-2):
    """Normalized per-component comparison with a growing-tolerance contract."""
    n = min(len(ours), len(ref))
    scale = np.maximum(np.abs(ref[:n]).max(axis=0), 1.0)
    err = np.abs(ours[:n] - ref[:n]) / scale
    tight = min(horizon_tight, n)
    assert err[:tight].max() < tol_tight, \
        f"drift {err[:tight].max():.2e} within first {tight} steps"
    assert err.max() < tol_full, f"drift {err.max():.2e} over {n} steps"


@pytest.fixture(scope="module")
def hover():
    return HeliEnv.build("aw109", task=HoverTask())


@pytest.mark.quick
def test_hover_quiet_trajectory(fixtures, hover):
    """Trim-held hover, zero turbulence noise: the purely deterministic path."""
    f = fixtures("rollouts")
    obs, rew, done, trunc, flags, states = replay(
        hover, f["hoverA_st0"], f["hoverA_obs0"], f["hoverA_etas"],
        f["hoverA_actions"])
    assert len(obs) == len(f["hoverA_obs"])
    assert not done.any() and not trunc.any()
    _compare_traj(states, f["hoverA_states"])
    _compare_traj(obs, f["hoverA_obs"])
    # rewards are tiny near trim; compare absolutely
    np.testing.assert_allclose(rew[:200], f["hoverA_rew"][:200], atol=1e-4)


def test_hover_turbulent_perturbed(fixtures, hover):
    """Sinusoid control perturbation + the reference's recorded noise."""
    f = fixtures("rollouts")
    obs, rew, done, trunc, flags, states = replay(
        hover, f["hoverB_st0"], f["hoverB_obs0"], f["hoverB_etas"],
        f["hoverB_actions"])
    assert len(obs) == len(f["hoverB_obs"])
    _compare_traj(states, f["hoverB_states"], horizon_tight=200,
                  tol_tight=5e-3, tol_full=1e-1)
    np.testing.assert_allclose(rew[:100], f["hoverB_rew"][:100], atol=1e-3)


def test_crash_detection(fixtures, hover):
    """Collective full down: must crash, with the same terminal flags and a
    crash step within a tight window of the reference's."""
    f = fixtures("rollouts")
    obs, rew, done, trunc, flags, states = replay(
        hover, f["crash_st0"], f["crash_obs0"], f["crash_etas"],
        f["crash_actions"])
    ref_len = len(f["crash_obs"])
    assert done[-1]
    assert flags[-1][0]          # failed=True
    assert abs(len(obs) - ref_len) <= 2
    _compare_traj(states[:ref_len - 2], f["crash_states"][:ref_len - 2],
                  horizon_tight=100, tol_tight=2e-3, tol_full=5e-2)


def test_forward_flight_rewards(fixtures):
    f = fixtures("rollouts")
    env = HeliEnv.build("aw109", task=ForwardFlightTask())
    obs, rew, done, trunc, flags, states = replay(
        env, f["fwd_st0"], f["fwd_obs0"], f["fwd_etas"], f["fwd_actions"])
    n = min(len(rew), len(f["fwd_rew"]))
    np.testing.assert_allclose(rew[:150], f["fwd_rew"][:150], atol=2e-3)
    assert (done[:n] == f["fwd_done"][:n]).all()
