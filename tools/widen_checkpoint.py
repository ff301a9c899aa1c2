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

    sp, dp = ts_src.params["params"], dict(ts_dst.params["params"])
    for name in sp:
        if name in input_layers:
            k_src = np.asarray(sp[name]["kernel"])
            k_new = np.zeros((k_src.shape[0] + K, k_src.shape[1]),
                             k_src.dtype)
            k_new[:k_src.shape[0]] = k_src     # one-hot rows start at zero
            dp[name] = dict(sp[name], kernel=jnp.asarray(k_new))
        else:
            dp[name] = sp[name]
    ts_dst = ts_dst.replace(
        params=dict(ts_dst.params, params=dp),
        opt_state=dst.tx.init(dict(ts_dst.params, params=dp)),
        obs_stats=ts_src.obs_stats)

    # sanity: the widened policy must reproduce the source policy exactly
    # for every task id
    obs = np.random.default_rng(0).normal(size=(4, 17)).astype(np.float32)
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
