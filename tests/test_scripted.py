"""Scripted model-based landing controller (learner/scripted.py).

Pins the properties the distillation pipeline depends on:
  1. The feedback law is batch-polymorphic and pure: (B, 17) batched
     evaluation equals per-row evaluation, residuals bounded by resid_max.
  2. Zero state error at the trim point -> (near-)zero residual, so the
     controller reduces to the trim hover it is built around.
  3. End-to-end: the controller actually LANDS — a full episode from a
     low-altitude start terminates `successed` (the settled-on-gear
     criterion of envs/tasks.py LandingTask), not failed/timeout.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.learner.scripted import (ApproachGains, landing_residual,
                                          make_scripted_policy)


@pytest.fixture(scope="module")
def landing_env():
    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import LandingTask
    from heligym_tpu.ops import terrain as terrain_ops

    env = HeliEnv.build("aw109", task=LandingTask())
    contact = float(terrain_ops.ground_touching_altitude(
        env.params, env.terrain, jnp.float32(0.0), jnp.float32(0.0)))
    return env.replace(task=dataclasses.replace(env.task, touch_alt=contact))


@pytest.mark.quick
def test_batch_polymorphic_and_bounded():
    g = ApproachGains()
    trim_att = (-0.05, 0.05, 0.0)
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (16, 17)) * jnp.asarray(
        [500, 15, 15, 5, 10, 10, 5, 0.2, 0.2, 0.5, 0.3, 0.3, 0.3,
         30, 30, 1700, 50])
    batched = landing_residual(obs, g, trim_att)
    assert batched.shape == (16, 4)
    rows = jnp.stack([landing_residual(obs[i], g, trim_att)
                      for i in range(16)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(rows),
                               rtol=1e-6)
    assert np.all(np.abs(np.asarray(batched)) <= g.resid_max + 1e-6)


@pytest.mark.quick
def test_trim_point_residual_small(landing_env):
    """At the exact trim state (aloft, level flight condition) the only
    commanded deviation is the descent profile's collective offset."""
    act_bias, trim_att, fn = make_scripted_policy(landing_env)
    tr = landing_env.trim_result()
    resid = np.asarray(fn(jnp.asarray(tr.obs)))
    # cyclic/pedal: zero state error -> only the coll->pedal feedforward
    assert abs(resid[1]) < 0.02 and abs(resid[2]) < 0.02
    # collective commands the profile descent (negative = less thrust)
    assert resid[0] < 0.0


def test_scripted_landing_succeeds(landing_env):
    """Full-episode rollout from 15 ft AGL lands and settles (successed)."""
    from heligym_tpu.ops import terrain as terrain_ops

    env = landing_env
    hmap = terrain_ops.prep_hmap_arg(env.terrain)
    act_bias, trim_att, fn = make_scripted_policy(env)
    tr = env.trim_result({"gr_alt": 15.0})
    es, _ = env.reset_from_trim(tr, jax.random.PRNGKey(3))

    @jax.jit
    def roll(es):
        def step(carry, _):
            es, res = carry
            resid = fn(es.obs)
            act = jnp.clip(act_bias + resid, -1.0, 1.0)
            es, out = env.step(es, act, hmap)
            first_end = (out.done | out.truncated) & (res["end"] < 0)
            res = {"succ": res["succ"] | (first_end & out.successed),
                   "fail": res["fail"] | (first_end & out.failed),
                   "end": jnp.where(first_end, jnp.int32(1), res["end"])}
            return (es, res), None

        res0 = {"succ": jnp.zeros((), bool), "fail": jnp.zeros((), bool),
                "end": jnp.full((), -1, jnp.int32)}
        (_, res), _ = jax.lax.scan(step, (es, res0), None,
                                   length=env.time_up_steps + 3)
        return res

    res = jax.device_get(roll(es))
    assert bool(res["succ"]) and not bool(res["fail"])
