"""Gymnasium API surface: drop-in compatibility with the reference package
(registration ids, spaces, setters, episode loop)."""
import gymnasium as gym
import numpy as np
import pytest

import heligym_tpu  # noqa: F401  (registers envs)


def test_registration_ids():
    ids = set(gym.registry.keys())
    for env_id in ("Heli-v0", "HeliHover-v0", "HeliForwardFlight-v0",
                   "HeliObliqueFlight-v0"):
        assert env_id in ids
    spec = gym.spec("HeliHover-v0")
    assert spec.max_episode_steps == 5000
    assert spec.reward_threshold == 0.95


@pytest.fixture(scope="module")
def env():
    e = gym.make("HeliHover-v0")
    yield e
    e.close()


def test_spaces(env):
    assert env.observation_space.shape == (17,)
    assert env.action_space.shape == (4,)
    assert env.action_space.low.min() == -1.0 and env.action_space.high.max() == 1.0


def test_episode_runs(env):
    obs, info = env.reset(seed=0)
    assert obs.shape == (17,)
    assert set(info) >= {"failed", "successed", "time_up"}
    total = 0.0
    for _ in range(20):
        obs, rew, done, trunc, info = env.step(np.zeros(4, np.float32))
        total += rew
        assert np.isfinite(obs).all()
    assert np.isfinite(total)


def test_setters(env):
    raw = env.unwrapped
    raw.set_max_time(10.0)
    assert raw.success_duration == 2.5
    raw.set_target({"sea_alt": 5000.0})
    assert raw.get_target()["sea_alt"] == 5000.0
    raw.set_trim_cond({"gr_alt": 200.0})
    assert raw.get_trim_cond()["gr_alt"] == 200.0
    raw.set_reward_weights()
    assert raw.base_reward_weight.shape == (17, 17)
    raw.set_max_time()  # restore

    assert set(raw.normalizers) == {"t", "x", "v", "a"}


def test_deterministic_reseed(env):
    obs1, _ = env.reset(seed=42)
    a = np.asarray([0.1, -0.1, 0.05, 0.0], np.float32)
    tr1 = [env.step(a)[0] for _ in range(5)]
    obs2, _ = env.reset(seed=42)
    tr2 = [env.step(a)[0] for _ in range(5)]
    np.testing.assert_array_equal(obs1, obs2)
    for x, y in zip(tr1, tr2):
        np.testing.assert_array_equal(x, y)


def test_render_rgb_array():
    e = gym.make("HeliHover-v0", render_mode="rgb_array")
    e.reset(seed=0)
    frame = e.render()
    assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.uint8
    e.close()
