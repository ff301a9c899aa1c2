"""Observation-stats surgery: re-span a normalized obs channel's affine map.

    python tools/stats_surgery.py --checkpoint land25.npz --out statfix.npz \
        --task landing --target touch_alt=ground --train-num-envs 1024 \
        --anchor-alt 6 --top-alt 120 --top-z 9

Why (measured, docs/TRAINING.md "Extending landing to realistic altitudes"):
normalized observations are clipped to +-10 (ppo.py::_norm). Under stats
learned at a 25-ft start altitude, obs[16] (CG altitude above ground,
helicopter_dynamics.py:486-488) hits the clip at ~32 ft — every altitude
above that produces the IDENTICAL network input, so the policy is
altitude-blind exactly where a start-altitude curriculum needs it to see.
Unfreezing the stats instead destroys the policy outright (transplant shock:
fail_ep 1.0 within 10 updates).

The surgery rewrites mean/var of ONE channel as the affine map through two
anchors: z(anchor_alt) keeps its OLD normalized value (the settle-region
input the trained policy depends on is bit-preserved), z(top_alt) maps to
`top_z` (unclipped headroom). Near-ground competence carries over unchanged;
the re-spanned axis above it re-fits in the following training stage
(run with --freeze-obs-stats so the new map sticks).

This is the committed, reusable form of the round-3 ad-hoc fix that took the
50-ft deterministic landing eval from 0.0 to 0.641.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--task", default="landing")
    ap.add_argument("--target", default="touch_alt=ground")
    ap.add_argument("--train-num-envs", type=int, required=True,
                    help="the checkpoint's training num_envs (restore "
                         "template shape)")
    ap.add_argument("--obs-index", type=int, default=16,
                    help="channel to re-span (16 = altitude above ground)")
    ap.add_argument("--anchor-alt", type=float, default=6.0,
                    help="start altitude [ft AGL] whose normalized value is "
                         "PRESERVED (the trained competence anchor)")
    ap.add_argument("--top-alt", type=float, default=120.0,
                    help="start altitude [ft AGL] mapped to --top-z")
    ap.add_argument("--top-z", type=float, default=9.0,
                    help="normalized value at --top-alt (inside the +-10 "
                         "clip with headroom)")
    args = ap.parse_args(argv)

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.learner.train import TASKS, _parse_target
    from heligym_tpu.parallel import make_env_mesh

    env = HeliEnv.build("aw109", task=TASKS[args.task]())
    if args.target:
        env = env.replace(task=env.task.with_target(
            **_parse_target(args.target, env)))
    learner = PPOLearner(env, PPOConfig(num_envs=args.train_num_envs),
                         mesh=make_env_mesh(jax.devices()[:1]))
    ts = learner.restore(args.checkpoint,
                         learner.init(jax.random.PRNGKey(0)))

    i = args.obs_index

    def scaled(alt: float) -> float:
        """Pre-standardization (scaled) obs channel at a fresh trim reset."""
        _, obs = env.reset(jax.random.PRNGKey(0), {"gr_alt": alt})
        return float((obs / learner._scales)[i])

    x_lo, x_hi = scaled(args.anchor_alt), scaled(args.top_alt)
    st = ts.obs_stats
    m, v = np.asarray(st.mean).copy(), np.asarray(st.var).copy()
    z_lo_old = (x_lo - m[i]) / np.sqrt(v[i] + 1e-8)
    # new affine through (x_lo, z_lo_old) and (x_hi, top_z)
    s_new = (x_hi - x_lo) / (args.top_z - z_lo_old)
    if not s_new > 0:
        raise SystemExit(
            f"requested anchors imply a non-positive scale (s_new="
            f"{s_new:.4g}): need top_z ({args.top_z:g}) > z(anchor_alt) "
            f"({z_lo_old:.3f}) when top_alt > anchor_alt — v = s**2 would "
            f"silently drop the sign and the saved stats would not pass "
            f"through the requested anchor points")
    m[i] = x_lo - z_lo_old * s_new
    v[i] = s_new ** 2
    ts = ts.replace(obs_stats=st.replace(mean=jnp.asarray(m),
                                         var=jnp.asarray(v)))
    learner.save(args.out, ts)

    print(f"channel {i}: z({args.anchor_alt:g} ft) = {z_lo_old:+.3f} "
          f"(preserved), z({args.top_alt:g} ft) = {args.top_z:+.3f}")
    for alt in (args.anchor_alt, 15, 25, 35, 50, 80, args.top_alt):
        _, obs = env.reset(jax.random.PRNGKey(0), {"gr_alt": float(alt)})
        x = np.asarray(learner._norm(obs, ts.obs_stats))
        print(f"  alt {alt:6.1f} ft: normalized obs[{i}] = {x[i]:+7.3f}")
    print(f"saved {args.out} (resume it with --freeze-obs-stats)")


if __name__ == "__main__":
    main()
