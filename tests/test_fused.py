"""Fused Pallas rollout consistency: the single-kernel step must reproduce
the unfused (golden-tested) path, including auto-reset and noise streams.
Runs in interpreter mode on the CPU test backend; the same kernel compiles
via Mosaic on real TPUs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.envs import VectorHeliEnv
from heligym_tpu.ops.pallas import build_fused_rollout


def test_fused_matches_unfused(hover_env, hover_trim):
    """Identical injected Dryden noise through both paths (the production
    fused path pre-draws its noise per rollout, so live streams differ by
    design; physics parity is pinned via the eta seam).

    NOT in the quick tier: tracing + interpret-lowering the fused kernel on
    CPU costs ~210 s regardless of step count (measured: 222 s at 3 steps,
    250 s at 6, 605 s at 30) — one test would triple the tier's budget.
    Fused parity is still pinned by the full suite and, on real hardware,
    by tools/fused_parity.py (FUSED_PARITY.json)."""
    B, STEPS = 128, 30
    venv = VectorHeliEnv(hover_env, B, auto_reset=True)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
    acts = jnp.tile(jnp.asarray(hover_trim.action), (B, 1))
    eta_seq = (jax.random.normal(jax.random.PRNGKey(7), (STEPS, 3, B))
               * (1.0 / hover_env.dt) ** 0.5)

    from heligym_tpu.envs.vector import auto_reset as do_reset

    @jax.jit
    def unfused_step(es, eta):
        new_es, out = jax.vmap(hover_env.step_with_eta)(es, acts, eta.T)
        return do_reset(new_es, out)

    es_u = es
    rews = []
    for t in range(STEPS):
        es_u, out = unfused_step(es_u, eta_seq[t])
        rews.append(np.asarray(out.reward))
    rews = np.stack(rews)

    roll = jax.jit(build_fused_rollout(hover_env, B, STEPS,
                                       collect=("reward", "done", "obs"),
                                       eta_mode="inject"))
    es_f, outs = roll(es, acts, eta_seq)

    np.testing.assert_allclose(np.asarray(outs["reward"]), rews, atol=2e-5)
    np.testing.assert_allclose(np.asarray(es_f.heli.flatten()),
                               np.asarray(es_u.heli.flatten()),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(es_f.obs), np.asarray(es_u.obs),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(es_f.steps), np.asarray(es_u.steps))


def test_fused_autoreset_on_crash(hover_env, hover_trim):
    """A diving batch must terminate and snap back to the trim state inside
    the fused rollout."""
    B, STEPS = 128, 300
    venv = VectorHeliEnv(hover_env, B, auto_reset=True)
    es, _ = venv.reset_from_trim(hover_trim, jax.random.PRNGKey(1))
    dive = jnp.asarray(hover_trim.action).at[0].set(-1.0)
    acts = jnp.tile(dive, (B, 1))
    roll = jax.jit(build_fused_rollout(hover_env, B, STEPS,
                                       collect=("reward", "done")))
    es_f, outs = roll(es, acts)
    done = np.asarray(outs["done"])
    assert done.any(), "dive never terminated inside fused rollout"
    # after a reset, step counters restart
    assert (np.asarray(es_f.steps) < STEPS).all()
