"""Re-span normalized obs channels WITH exact input-layer compensation.

    python tools/respan_stats.py --checkpoint fwd.npz --task oblique \
        --target sea_alt=start,vel=60 --train-num-envs 512 \
        --respan 9:0:1.0:3 --respan 5:0:1.8:3 --out respanned.npz

Each --respan entry is `index:anchor:top:top_z` in SCALED units (after the
fixed physical normalizers, networks.obs_scales): the channel's affine map
is rewritten to pass through (anchor, z_old(anchor)) and (top, top_z).

This generalizes tools/stats_surgery.py two ways:

  * anchors are scaled values directly (any channel, not just altitude);
  * the input-layer kernels/biases (actor Dense_0 and critic
    Dense_{L+1}) are EXACTLY compensated for the affine change — the
    checkpoint computes the identical function wherever the +-10
    normalization clip was inactive, so there is NO transplant shock and
    no --freeze-obs-stats retraining hit; the policy simply gains sight
    of regions the old stats clipped.

Why (measured, round 4): a forward-flight expert's stats are razor-thin
in heading and east-velocity (it always flies north), so an
oblique-flight curriculum resuming it is course-blind — z(psi = pi/4)
and z(ve = 42 ft/s) both sit past the clip; every heading-band run
plateaued at the input checkpoint's level (0.133) and best-tracking
never improved.
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
    ap.add_argument("--task", required=True)
    ap.add_argument("--target", default=None)
    ap.add_argument("--train-num-envs", type=int, required=True)
    ap.add_argument("--respan", action="append", required=True,
                    metavar="IDX:ANCHOR:TOP:TOPZ",
                    help="channel re-span in scaled units (repeatable)")
    ap.add_argument("--out", required=True)
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

    m = np.asarray(ts.obs_stats.mean).copy()
    v = np.asarray(ts.obs_stats.var).copy()
    s_old = np.sqrt(v + 1e-8)
    m_old, v_old = m.copy(), v.copy()

    for spec in args.respan:
        i_s, anchor_s, top_s, topz_s = spec.split(":")
        i, anchor, top, top_z = (int(i_s), float(anchor_s), float(top_s),
                                 float(topz_s))
        z_anchor_old = (anchor - m_old[i]) / s_old[i]
        s_new = (top - anchor) / (top_z - z_anchor_old)
        if not s_new > 0:
            raise SystemExit(
                f"channel {i}: anchors imply a non-positive scale (s_new="
                f"{s_new:.4g}): need top_z ({top_z:g}) > z(anchor) "
                f"({z_anchor_old:.3f}) when top > anchor — v = s**2 would "
                f"silently drop the sign (the input-layer compensation "
                f"stays self-consistent, so the mistake would be invisible)")
        m[i] = anchor - z_anchor_old * s_new
        v[i] = s_new ** 2
        print(f"channel {i}: z({anchor:g}) = {z_anchor_old:+.3f} "
              f"(preserved), z({top:g}) = {top_z:+.3f} "
              f"(was {(top - m_old[i]) / s_old[i]:+.1f})")

    # exact compensation: z_old = a * z_new + d per channel
    s_new_all = np.sqrt(v + 1e-8)
    a = (s_new_all / s_old).astype(np.float32)
    d = ((m - m_old) / s_old).astype(np.float32)

    L = len(learner.config.hidden)
    input_layers = {"Dense_0", f"Dense_{L + 1}"}
    K = learner.task_dim
    p = dict(ts.params["params"])
    for name in input_layers:
        k_src = np.asarray(p[name]["kernel"])
        n_obs = a.shape[0]
        k_new = k_src.copy()
        k_new[:n_obs] = k_src[:n_obs] * a[:, None]   # one-hot rows untouched
        b_new = np.asarray(p[name]["bias"]) + k_src[:n_obs].T @ d
        p[name] = dict(p[name], kernel=jnp.asarray(k_new),
                       bias=jnp.asarray(b_new))
    ts = ts.replace(
        params=dict(ts.params, params=p),
        obs_stats=ts.obs_stats.replace(mean=jnp.asarray(m),
                                       var=jnp.asarray(v)))

    # identity probe on in-distribution states (trim-reset + old-stats noise)
    _, obs0 = env.reset(jax.random.PRNGKey(0), None)
    rng = np.random.default_rng(0)
    sig = s_old * np.asarray(learner._scales)
    obs_probe = (np.asarray(obs0)[None, :]
                 + rng.normal(size=(8, m.shape[0])).astype(np.float32)
                 * sig).astype(np.float32)
    old = PPOLearner(env, PPOConfig(num_envs=args.train_num_envs),
                     mesh=make_env_mesh(jax.devices()[:1]))
    ts_old = old.restore(args.checkpoint, old.init(jax.random.PRNGKey(0)))
    toh = (learner._task_oh(jnp.zeros(8, jnp.int32)) if K else None)
    a_old = old.policy(ts_old.params, jnp.asarray(obs_probe),
                       obs_stats=ts_old.obs_stats, task_oh=toh)
    a_new = learner.policy(ts.params, jnp.asarray(obs_probe),
                           obs_stats=ts.obs_stats, task_oh=toh)
    np.testing.assert_allclose(np.asarray(a_old), np.asarray(a_new),
                               atol=2e-5)
    learner.save(args.out, ts)
    print(f"saved {args.out}; in-distribution behavior identity verified "
          f"(atol 2e-5)")


if __name__ == "__main__":
    main()
