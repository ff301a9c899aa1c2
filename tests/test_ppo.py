"""PPO learner smoke tests: the full sharded train step compiles, runs, and
produces finite losses; policy improves value-loss over a few updates."""
import jax
import numpy as np
import pytest

from heligym_tpu.envs import HeliEnv
from heligym_tpu.envs.tasks import HoverTask
from heligym_tpu.learner import PPOConfig, PPOLearner
from heligym_tpu.parallel import make_env_mesh


@pytest.fixture(scope="module")
def learner(hover_env):
    devs = jax.devices()
    mesh = make_env_mesh(devs)
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=2,
                    hidden=(32, 32))
    return PPOLearner(hover_env, cfg, mesh=mesh)


def test_train_step_runs(learner):
    ts = learner.init(jax.random.PRNGKey(0))
    step = learner.train_step_fn()
    ts, metrics = step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(ts.update_count) == 1


def test_multiple_updates_stable(learner):
    ts = learner.init(jax.random.PRNGKey(1))
    step = learner.train_step_fn()
    for _ in range(3):
        ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert abs(float(metrics["approx_kl"])) < 1.0


def test_policy_deterministic_head(learner):
    ts = learner.init(jax.random.PRNGKey(2))
    obs = np.asarray(ts.env_state.obs)
    act = learner.policy(ts.params, obs)
    assert act.shape == (16, 4)
    assert (np.abs(np.asarray(act)) <= 1.0).all()


def test_fused_collector_single_device(hover_env):
    """The fused Pallas collection path (single-device mesh) trains finitely."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=128, rollout_steps=8, minibatches=2, epochs=2,
                    hidden=(32, 32), use_fused_rollout=True)
    learner = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = learner.init(jax.random.PRNGKey(3))
    step = learner.train_step_fn()
    ts, metrics = step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_fused_collector_multi_device(hover_env):
    """shard_map-wrapped fused collector: one Pallas kernel per device shard."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = make_env_mesh(devs)
    cfg = PPOConfig(num_envs=1024, rollout_steps=4, minibatches=2, epochs=1,
                    hidden=(16, 16), use_fused_rollout=True)
    learner = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = learner.init(jax.random.PRNGKey(5))
    step = learner.train_step_fn()
    ts, metrics = step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_action_centering(hover_env):
    """center_actions=True executes clip(trim_action + residual): the
    deterministic policy at init (mean ~ 0) must sit on the trim action,
    and turning it off must recover the absolute-action policy."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg_c = PPOConfig(num_envs=16, rollout_steps=4, minibatches=2, epochs=1,
                      hidden=(16, 16), center_actions=True)
    cfg_a = PPOConfig(num_envs=16, rollout_steps=4, minibatches=2, epochs=1,
                      hidden=(16, 16), center_actions=False)
    lc = PPOLearner(hover_env, cfg_c, mesh=mesh)
    la = PPOLearner(hover_env, cfg_a, mesh=mesh)
    trim_act = np.asarray(hover_env.trim_result().action)
    ts = lc.init(jax.random.PRNGKey(0))
    obs = np.asarray(ts.env_state.obs)
    act_c = np.asarray(lc.policy(ts.params, obs))
    act_a = np.asarray(la.policy(ts.params, obs))
    # init mean head has 0.01-scale orthogonal weights -> |mean| << 0.1
    np.testing.assert_allclose(act_c, act_a + trim_act, atol=1e-6)
    assert np.abs(act_c - trim_act).max() < 0.1
    assert np.abs(np.asarray(lc.act_bias) - trim_act).max() == 0.0


def test_shaped_gae_finite(hover_env):
    """success-bonus/fail-penalty/AGL-potential shaping keeps the train step
    finite (shaping is training-only: reward_mean must equal the raw env
    reward regardless of shaping)."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                    hidden=(16, 16), success_bonus=2.0, fail_penalty=5.0,
                    agl_shaping=10.0, vf_clip_eps=0.0, target_kl=0.05)
    l = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = l.init(jax.random.PRNGKey(6))
    ts, m = l.train_step_fn()(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    cfg0 = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                     hidden=(16, 16))
    l0 = PPOLearner(hover_env, cfg0, mesh=mesh)
    ts0 = l0.init(jax.random.PRNGKey(6))
    ts0, m0 = l0.train_step_fn()(ts0)
    np.testing.assert_allclose(float(m["reward_mean"]),
                               float(m0["reward_mean"]), rtol=1e-5)


def test_flare_shaping_training_only(hover_env):
    """Flare potential (Phi = -|down_vel| * exp(-agl/scale)) keeps the train
    step finite and, like every shaping term, never leaks into the reported
    env reward."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                    hidden=(16, 16), flare_shaping=20.0, flare_scale=10.0,
                    vf_clip_eps=0.0)
    l = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = l.init(jax.random.PRNGKey(6))
    ts, m = l.train_step_fn()(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    cfg0 = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                     hidden=(16, 16))
    l0 = PPOLearner(hover_env, cfg0, mesh=mesh)
    ts0 = l0.init(jax.random.PRNGKey(6))
    ts0, m0 = l0.train_step_fn()(ts0)
    np.testing.assert_allclose(float(m["reward_mean"]),
                               float(m0["reward_mean"]), rtol=1e-5)


def test_vel_track_shaping_training_only(hover_env):
    """Velocity-vector and slalom-track potentials keep the train step
    finite and never leak into the reported env reward (same contract as
    every other shaping term)."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                    hidden=(16, 16), vel_shaping=0.3, vel_target_n=42.4,
                    vel_target_e=42.4, track_shaping=0.1,
                    track_amplitude=150.0, track_wavelength=2000.0,
                    vf_clip_eps=0.0)
    l = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = l.init(jax.random.PRNGKey(6))
    ts, m = l.train_step_fn()(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    cfg0 = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                     hidden=(16, 16))
    l0 = PPOLearner(hover_env, cfg0, mesh=mesh)
    ts0 = l0.init(jax.random.PRNGKey(6))
    ts0, m0 = l0.train_step_fn()(ts0)
    np.testing.assert_allclose(float(m["reward_mean"]),
                               float(m0["reward_mean"]), rtol=1e-5)


def test_checkpoint_resume(tmp_path, learner):
    ts = learner.init(jax.random.PRNGKey(4))
    step = learner.train_step_fn()
    ts, _ = step(ts)
    path = str(tmp_path / "ppo_ckpt.npz")
    learner.save(path, ts)
    restored = learner.restore(path, ts)
    ts2, m2 = step(restored)
    ts1, m1 = step(ts)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_freeze_obs_stats(hover_env):
    """freeze_obs_stats: stats are applied but never merged — the fine-tune
    setting (PPOConfig docstring; measured policy-degradation rationale)."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                    hidden=(32, 32), freeze_obs_stats=True)
    learner = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = learner.init(jax.random.PRNGKey(4))
    before = jax.tree_util.tree_map(np.asarray, ts.obs_stats)
    step = learner.train_step_fn()
    ts, _ = step(ts)
    after = jax.tree_util.tree_map(np.asarray, ts.obs_stats)
    np.testing.assert_array_equal(before.mean, after.mean)
    np.testing.assert_array_equal(before.var, after.var)
    np.testing.assert_array_equal(before.count, after.count)


def test_critic_warmup_deep(hover_env):
    """critic_warmup at a NON-default depth (hidden=(64,64,64)): the derived
    actor/critic split (ppo.py::PPOLearner.__init__) must freeze exactly the
    actor torso+head+log_std while the critic tower moves. A hardcoded
    2-layer name set would treat Dense_3 (the 3-layer actor's mean head) as
    critic and let it drift during warmup."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=2,
                    hidden=(64, 64, 64), critic_warmup=3)
    learner = PPOLearner(hover_env, cfg, mesh=mesh)
    n_hidden = 3
    actor_keys = {f"Dense_{i}" for i in range(n_hidden + 1)} | {"log_std"}
    critic_keys = {f"Dense_{i}" for i in range(n_hidden + 1, 2 * n_hidden + 2)}
    assert learner._actor_keys == frozenset(actor_keys)
    ts = learner.init(jax.random.PRNGKey(7))
    before = jax.tree_util.tree_map(np.asarray, ts.params)
    ts, _ = learner.train_step_fn()(ts)
    after = jax.tree_util.tree_map(np.asarray, ts.params)
    b, a = before["params"], after["params"]
    for k in actor_keys:
        leaf_b = b[k] if k == "log_std" else b[k]["kernel"]
        leaf_a = a[k] if k == "log_std" else a[k]["kernel"]
        np.testing.assert_array_equal(leaf_b, leaf_a,
                                      err_msg=f"actor param {k} moved "
                                              "during critic warmup")
    moved = [k for k in critic_keys
             if np.abs(a[k]["kernel"] - b[k]["kernel"]).max() > 0]
    assert moved, "critic tower did not move during warmup"


def test_prof_shaping_training_only(hover_env):
    """Descent-profile potential (Phi = -|w_ned - v_ref(agl)|, v_ref =
    vmax * (1 - exp(-agl/scale))) keeps the train step finite and never
    leaks into the reported env reward (same contract as every other
    shaping term)."""
    mesh = make_env_mesh(jax.devices()[:1])
    cfg = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                    hidden=(16, 16), prof_shaping=15.0, prof_vmax=7.0,
                    prof_scale=25.0, vf_clip_eps=0.0)
    l = PPOLearner(hover_env, cfg, mesh=mesh)
    ts = l.init(jax.random.PRNGKey(6))
    ts, m = l.train_step_fn()(ts)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    cfg0 = PPOConfig(num_envs=16, rollout_steps=8, minibatches=2, epochs=1,
                     hidden=(16, 16))
    l0 = PPOLearner(hover_env, cfg0, mesh=mesh)
    ts0 = l0.init(jax.random.PRNGKey(6))
    ts0, m0 = l0.train_step_fn()(ts0)
    np.testing.assert_allclose(float(m["reward_mean"]),
                               float(m0["reward_mean"]), rtol=1e-5)


def test_parse_target_offsets(hover_env):
    """'ground+N' / 'start+N' target offsets resolve against the terrain
    contact altitude (the descend-expert objective's CLI face)."""
    from heligym_tpu.learner.train import _parse_target
    g = _parse_target("touch_alt=ground", hover_env)["touch_alt"]
    g30 = _parse_target("touch_alt=ground+30", hover_env)["touch_alt"]
    s = _parse_target("sea_alt=start", hover_env)["sea_alt"]
    s5 = _parse_target("sea_alt=start+5", hover_env)["sea_alt"]
    np.testing.assert_allclose(g30 - g, 30.0, atol=1e-5)
    np.testing.assert_allclose(s5 - s, 5.0, atol=1e-5)
    np.testing.assert_allclose(_parse_target("vel=60", hover_env)["vel"],
                               60.0)
