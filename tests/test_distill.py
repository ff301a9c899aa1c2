"""Self-imitation distillation (learner/distill.py) unit tests.

Pins the two properties PPO-resume correctness depends on:
  1. bc_fit regresses ONLY the actor tower — critic parameters and log_std
     stay bit-identical (a follow-up PPO polish must be able to reuse the
     restored critic).
  2. The regression actually moves the actor mean toward the cloned
     residuals (weighted loss decreases).
Plus the evaluator's cond_sampler path (deterministic start-altitude grid)
used for band-wide best-tracking.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.learner import PPOConfig, PPOLearner
from heligym_tpu.learner.distill import bc_fit, collect_successful
from heligym_tpu.learner.evaluate import make_evaluator
from heligym_tpu.learner.train import (make_alt_band_sampler,
                                       make_alt_grid_sampler)
from heligym_tpu.parallel import make_env_mesh


@pytest.fixture(scope="module")
def learner(hover_env):
    cfg = PPOConfig(num_envs=8, rollout_steps=4, minibatches=2, epochs=1,
                    hidden=(32, 32))
    return PPOLearner(hover_env, cfg, mesh=make_env_mesh(jax.devices()[:1]))


@pytest.mark.quick
def test_alt_grid_sampler_deterministic():
    s = make_alt_grid_sampler(6.0, 55.0)
    c1 = s(jax.random.PRNGKey(0), 5)
    c2 = s(jax.random.PRNGKey(99), 5)  # key is ignored by design
    np.testing.assert_array_equal(np.asarray(c1["gr_alt"]),
                                  np.linspace(6.0, 55.0, 5))
    np.testing.assert_array_equal(np.asarray(c1["gr_alt"]),
                                  np.asarray(c2["gr_alt"]))


@pytest.mark.quick
def test_bc_fit_touches_only_actor(learner):
    ts = learner.init(jax.random.PRNGKey(0))
    n, d = 64, 17
    k = jax.random.PRNGKey(1)
    obs = jax.random.normal(k, (4, 16, d))          # (T, B, obs)
    resid = 0.1 * jax.random.normal(k, (4, 16, 4))  # (T, B, act)
    w = jnp.ones((4, 16), jnp.float32)
    ts2, loss = bc_fit(learner, ts, obs, resid, w, epochs=3, lr=1e-3,
                       minibatch=16, key=jax.random.PRNGKey(2))
    assert np.isfinite(loss)
    p1, p2 = ts.params["params"], ts2.params["params"]
    n_hidden = len(learner.config.hidden)
    actor = {f"Dense_{i}" for i in range(n_hidden + 1)}
    moved = unmoved = 0
    for name in p1:
        same = all(np.array_equal(np.asarray(p1[name][k]),
                                  np.asarray(p2[name][k]))
                   for k in p1[name]) if name != "log_std" else \
            np.array_equal(np.asarray(p1[name]), np.asarray(p2[name]))
        if name in actor:
            assert not same, f"actor param {name} did not move"
            moved += 1
        else:
            assert same, f"non-actor param {name} moved"
            unmoved += 1
    assert moved == n_hidden + 1 and unmoved >= n_hidden + 2


@pytest.mark.quick
def test_bc_fit_reduces_loss(learner):
    ts = learner.init(jax.random.PRNGKey(3))
    k = jax.random.PRNGKey(4)
    obs = jax.random.normal(k, (8, 16, 17))
    target = jnp.tanh(obs[..., :4] * 0.3)  # learnable state-dependent law
    w = jnp.ones((8, 16), jnp.float32)
    _, loss_1 = bc_fit(learner, ts, obs, target, w, epochs=1, lr=3e-3,
                       minibatch=32, key=jax.random.PRNGKey(5))
    _, loss_30 = bc_fit(learner, ts, obs, target, w, epochs=30, lr=3e-3,
                        minibatch=32, key=jax.random.PRNGKey(5))
    assert loss_30 < loss_1


@pytest.mark.quick
def test_bc_fit_small_dataset(learner):
    """Datasets smaller than the minibatch must clamp, not crash (advisor
    finding, round 3: reshape(nb, minibatch) raised on small --episodes
    sanity runs), and epochs=0 must error loudly instead of NameError."""
    ts = learner.init(jax.random.PRNGKey(10))
    k = jax.random.PRNGKey(11)
    obs = jax.random.normal(k, (2, 4, 17))      # 8 samples
    resid = 0.1 * jax.random.normal(k, (2, 4, 4))
    w = jnp.ones((2, 4), jnp.float32)
    ts2, loss = bc_fit(learner, ts, obs, resid, w, epochs=2, lr=1e-3,
                       minibatch=65536, key=jax.random.PRNGKey(12))
    assert np.isfinite(loss)
    with pytest.raises(ValueError):
        bc_fit(learner, ts, obs, resid, w, epochs=0, lr=1e-3,
               minibatch=65536, key=jax.random.PRNGKey(12))


@pytest.mark.quick
def test_evaluator_cond_sampler_grid(hover_env, learner):
    """Evaluator accepts a cond_sampler (batched on-device trim) and returns
    per-episode stats over the grid."""
    ts = learner.init(jax.random.PRNGKey(6))
    ev = make_evaluator(hover_env, learner, episodes=4, steps=6,
                        cond_sampler=make_alt_grid_sampler(40.0, 120.0))
    r = ev(ts, jax.random.PRNGKey(7))
    assert r["episodes"] == 4
    for key in ("success_frac", "fail_frac", "timeout_frac"):
        assert 0.0 <= r[key] <= 1.0


def test_collect_successful_shapes(hover_env, learner):
    ts = learner.init(jax.random.PRNGKey(8))
    obs, resid, w, succ = collect_successful(
        hover_env, learner, ts, episodes=4, steps=6,
        key=jax.random.PRNGKey(9),
        cond_sampler=make_alt_band_sampler(50.0, 60.0))
    assert obs.shape == (6, 4, 17) and resid.shape == (6, 4, 4)
    assert w.shape == (6, 4) and 0.0 <= succ <= 1.0
    # residual targets must reproduce executed actions inside the clip box
    assert np.all(np.abs(np.asarray(resid) + np.asarray(learner.act_bias))
                  <= 1.0 + 1e-6)
