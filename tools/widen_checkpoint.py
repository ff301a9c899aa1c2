"""Widen a single-task checkpoint into a task-conditioned MixedTask one.

    python tools/widen_checkpoint.py --checkpoint hover.npz \
        --task hover --train-num-envs 512 \
        --tasks hover,forward --target sea_alt=start,vel=60 \
        --out-num-envs 1024 --out mt_seed.npz

MixedTask learners append a K-wide task one-hot to the network input
(ppo.py::_net_in), so their first Dense layers consume obs_dim + K columns
and a single-task checkpoint (obs_dim columns) cannot be restored directly.
This transplant:

  * copies every parameter, padding the two INPUT layers (actor torso
    Dense_0 and critic torso Dense_{L+1}, flax call-order numbering as in
    ppo.py::_actor_keys) with ZERO rows for the one-hot columns — at init
    the widened policy is exactly the source policy for EVERY task id, and
    training grows per-task behavior out of the zero rows;
  * copies the observation stats verbatim (they cover only the obs
    channels; the one-hot is not normalized);
  * re-initializes the optimizer and the env farm (a new training regime).

Why (measured, round 4): training hover+forward from scratch, forward's
dense reward stream drags the shared torso and hover collapses
(success_ep_t0 peaked 0.28 @ update 50, then 0.0 for the rest of the run);
resuming that wreck only spread the failure. Seeding BOTH behaviors from
the hover policy keeps the fragile skill while the dominant one re-learns
— the same curriculum logic as the landing altitude chain.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="single-task source checkpoint")
    ap.add_argument("--task", required=True,
                    help="the source checkpoint's task")
    ap.add_argument("--train-num-envs", type=int, required=True,
                    help="the source checkpoint's num_envs")
    ap.add_argument("--tasks", required=True,
                    help="comma list of target MixedTask sub-tasks")
    ap.add_argument("--target", default=None,
                    help="task target override 'k=v,...' (as in train.py)")
    ap.add_argument("--out-num-envs", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mix-stats-from", default=None,
                    help="second single-task checkpoint whose obs stats are "
                         "MIXED into the output stats (50/50 mixture "
                         "mean/var). The input-layer kernels/biases are "
                         "EXACTLY compensated for the affine change, so the "
                         "widened policy still reproduces the source policy "
                         "bit-for-bit wherever the +-10 normalization clip "
                         "is inactive — no transplant shock, and the second "
                         "task's state distribution maps unclipped. Use "
                         "with --freeze-obs-stats in the following training "
                         "stage. (Measured: widening hover->hover+forward "
                         "with hover-only stats clips the velocity channels "
                         "for forward states; with UNfrozen stats the drift "
                         "destroys hover within 30 updates: best 0.023.)")
    ap.add_argument("--mix-stats-task", default=None,
                    help="the --mix-stats-from checkpoint's task")
    ap.add_argument("--mix-stats-num-envs", type=int, default=None,
                    help="the --mix-stats-from checkpoint's num_envs")
    args = ap.parse_args(argv)

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import MixedTask
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.learner.train import TASKS, _parse_target
    from heligym_tpu.parallel import make_env_mesh

    mesh = make_env_mesh(jax.devices()[:1])

    src_env = HeliEnv.build("aw109", task=TASKS[args.task]())
    names = [s.strip() for s in args.tasks.split(",") if s.strip()]
    dst_task = MixedTask(tasks=tuple(TASKS[n]() for n in names))
    dst_env = HeliEnv.build("aw109", task=dst_task)
    if args.target:
        updates = _parse_target(args.target, src_env)
        src_env = src_env.replace(task=src_env.task.with_target(
            **{k: v for k, v in updates.items()
               if k in src_env.task.target_dict()}))
        dst_env = dst_env.replace(task=MixedTask(tasks=tuple(
            t.with_target(**{k: v for k, v in updates.items()
                             if k in t.target_dict()})
            for t in dst_task.tasks)))

    src = PPOLearner(src_env, PPOConfig(num_envs=args.train_num_envs),
                     mesh=mesh)
    ts_src = src.restore(args.checkpoint,
                         src.init(jax.random.PRNGKey(0)))

    dst = PPOLearner(dst_env, PPOConfig(num_envs=args.out_num_envs),
                     mesh=mesh)
    task_ids = np.arange(args.out_num_envs) % len(names)
    ts_dst = dst.init(jax.random.PRNGKey(1), task_ids=task_ids)

    L = len(dst.config.hidden)
    input_layers = {"Dense_0", f"Dense_{L + 1}"}   # actor + critic torsos
    K = dst.task_dim

    out_stats = ts_src.obs_stats
    # per-channel affine compensation (identity unless --mix-stats-from):
    # z_old = a * z_new + d  with  a = s_new/s_old, d = (m_new - m_old)/s_old
    n_obs = np.asarray(ts_src.obs_stats.mean).shape[0]
    a = np.ones(n_obs, np.float32)
    d = np.zeros(n_obs, np.float32)
    if args.mix_stats_from:
        if not (args.mix_stats_task and args.mix_stats_num_envs):
            ap.error("--mix-stats-from needs --mix-stats-task and "
                     "--mix-stats-num-envs")
        env2 = HeliEnv.build("aw109", task=TASKS[args.mix_stats_task]())
        l2 = PPOLearner(env2, PPOConfig(num_envs=args.mix_stats_num_envs),
                        mesh=mesh)
        st2 = l2.restore(args.mix_stats_from,
                         l2.init(jax.random.PRNGKey(2))).obs_stats
        m1, v1 = (np.asarray(ts_src.obs_stats.mean),
                  np.asarray(ts_src.obs_stats.var))
        m2, v2 = np.asarray(st2.mean), np.asarray(st2.var)
        # 50/50 mixture moments: spans both tasks' state distributions
        mm = 0.5 * (m1 + m2)
        vm = 0.5 * (v1 + v2) + 0.25 * (m1 - m2) ** 2
        s1, sm = np.sqrt(v1 + 1e-8), np.sqrt(vm + 1e-8)
        a = (sm / s1).astype(np.float32)
        d = ((mm - m1) / s1).astype(np.float32)
        out_stats = ts_src.obs_stats.replace(mean=jnp.asarray(mm),
                                             var=jnp.asarray(vm))

    sp, dp = ts_src.params["params"], dict(ts_dst.params["params"])
    for name in sp:
        if name in input_layers:
            k_src = np.asarray(sp[name]["kernel"])
            # fold the stats change into the input layer: row c scales by
            # a_c, and the shift lands in the bias (w.z_old + b ==
            # (w*a).z_new + (b + w.d))
            k_comp = k_src * a[:, None]
            b_comp = np.asarray(sp[name]["bias"]) + k_src.T @ d
            k_new = np.zeros((k_src.shape[0] + K, k_src.shape[1]),
                             k_src.dtype)
            k_new[:k_src.shape[0]] = k_comp    # one-hot rows start at zero
            dp[name] = dict(sp[name], kernel=jnp.asarray(k_new),
                            bias=jnp.asarray(b_comp))
        else:
            dp[name] = sp[name]
    ts_dst = ts_dst.replace(
        params=dict(ts_dst.params, params=dp),
        opt_state=dst.tx.init(dict(ts_dst.params, params=dp)),
        obs_stats=out_stats)

    # sanity: the widened policy must reproduce the source policy exactly
    # for every task id. Probe with IN-DISTRIBUTION observations (trim-reset
    # obs plus stats-scaled noise): under --mix-stats-from the identity holds
    # wherever the +-10 normalization clip is inactive, which is exactly the
    # source policy's operating envelope.
    _, obs0 = src_env.reset(jax.random.PRNGKey(0), None)
    rng = np.random.default_rng(0)
    sig = np.sqrt(np.asarray(ts_src.obs_stats.var)) * np.asarray(src._scales)
    obs = (np.asarray(obs0)[None, :]
           + rng.normal(size=(4, n_obs)).astype(np.float32) * sig
           ).astype(np.float32)
    a_src = src.policy(ts_src.params, jnp.asarray(obs),
                       obs_stats=ts_src.obs_stats)
    for tid in range(K):
        toh = dst._task_oh(jnp.full((4,), tid, jnp.int32))
        a_dst = dst.policy(ts_dst.params, jnp.asarray(obs),
                           obs_stats=ts_dst.obs_stats, task_oh=toh)
        np.testing.assert_allclose(np.asarray(a_src), np.asarray(a_dst),
                                   atol=1e-6)
    dst.save(args.out, ts_dst)
    print(f"widened {args.checkpoint} ({args.task}, "
          f"{args.train_num_envs} envs) -> {args.out} "
          f"({'+'.join(names)}, {args.out_num_envs} envs); "
          f"behavior-identity verified for all {K} task ids")


if __name__ == "__main__":
    main()
