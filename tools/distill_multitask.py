"""Distill single-task expert policies into one task-conditioned network.

    python tools/distill_multitask.py \
        --experts hover=examples/hover_policy.npz:512,forward=examples/forward_policy.npz:512 \
        --target sea_alt=start,vel=60 \
        --out-num-envs 1024 --out mt_distilled.npz --eval-episodes 256

Why (measured, round 4): PPO on a MixedTask batch destroys the fragile
sub-task no matter how it is seeded — from scratch, hover peaks at 0.28
and dies while forward reaches 1.0; hover-weighted batches (3:1) do not
save it; and even a widened hover-expert seed that EVALUATES 0.922/0.0 at
update 4 is dead by update 600. The shared torso means the dominant
task's gradient stream overwrites the other's behavior, and a 2-wide
input one-hot cannot shield it. Supervised distillation sidesteps PPO
entirely: each expert labels its own states, the task-conditioned student
regresses both datasets at once, and there is no interference because
nothing is on-policy.

Mechanics:
  * For each expert: roll its slightly-noised policy in its OWN env
    (exploration std `--collect-log-std` around the expert mean, the
    state-coverage trick from learner/distill.py), recording observations
    and the expert's DETERMINISTIC mean residual at every state.
  * Student obs stats are fit from the pooled scaled observations (count
    pre-saturated, so a later PPO resume with --freeze-obs-stats keeps
    them).
  * The student (obs + task one-hot input, ppo.py::_net_in) regresses the
    expert residuals with the actor-only masked optimizer from
    learner/distill.py::make_bc_fitter; log_std is set to
    --collect-log-std. The critic is left at init — a PPO resume must use
    --critic-warmup.
  * Per-task deterministic evaluation via the standard evaluator.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--experts", required=True,
                    help="comma list of task=checkpoint:num_envs entries, "
                         "in MixedTask sub-task order")
    ap.add_argument("--target", default=None,
                    help="task target override 'k=v,...' applied per task "
                         "(as in train.py)")
    ap.add_argument("--collect-steps", type=int, default=1200,
                    help="rollout length per expert (episodes auto-reset)")
    ap.add_argument("--collect-envs", type=int, default=512,
                    help="parallel envs per expert collection")
    ap.add_argument("--collect-log-std", type=float, default=-3.0,
                    help="exploration std around the expert mean during "
                         "collection (state coverage incl. recovery "
                         "neighborhoods)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--dagger-rounds", type=int, default=0,
                    help="after the initial fit, N rounds of: roll the "
                         "STUDENT (with --collect-log-std noise) in each "
                         "task env, label the visited states with the "
                         "expert's mean, extend the dataset, refit. Fixes "
                         "the BC covariate shift on unstable transients "
                         "(measured: plain BC gives hover 0.99 but forward "
                         "0.41 — the student's small errors compound along "
                         "the acceleration transient into states the "
                         "expert dataset never covers)")
    ap.add_argument("--bc-lr", type=float, default=3e-4)
    ap.add_argument("--minibatch", type=int, default=65536)
    ap.add_argument("--hidden", default=None, metavar="H1,H2,...",
                    help="student hidden sizes (default PPOConfig's "
                         "256,256) — the 5-task BC residual error that "
                         "kills landing is a capacity question; widen to "
                         "probe it")
    ap.add_argument("--task-loss-weights", default=None, metavar="W0,W1,...",
                    help="per-task BC sample weights (floats, expert "
                         "order): upweight a precision-critical task "
                         "(landing) or a lagging head (hover) in the "
                         "regression without changing collection")
    ap.add_argument("--dagger-tasks", default=None,
                    help="comma subset of expert task names to run DAgger "
                         "collection on (default all) — targeted rounds on "
                         "the lagging task only")
    ap.add_argument("--out-num-envs", type=int, required=True,
                    help="farm size of the saved student checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval-episodes", type=int, default=256)
    ap.add_argument("--metrics-out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import MixedTask
    from heligym_tpu.envs.vector import VectorHeliEnv
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.learner.distill import make_bc_fitter
    from heligym_tpu.learner.evaluate import make_evaluator
    from heligym_tpu.learner.ppo import ObsStats
    from heligym_tpu.learner.train import TASKS, _parse_target
    from heligym_tpu.ops import terrain as terrain_ops
    from heligym_tpu.parallel import make_env_mesh

    mesh = make_env_mesh(jax.devices()[:1])
    specs = []
    for entry in args.experts.split(","):
        name, rest = entry.split("=")
        ckpt, nenv = rest.rsplit(":", 1)
        specs.append((name.strip(), ckpt.strip(), int(nenv)))

    # ---- experts + per-task collectors ----------------------------------
    B, T = args.collect_envs, args.collect_steps
    cls = float(args.collect_log_std)
    experts = []          # (name, env, learner, ts, stats, hmap, venv)
    for tid, (name, ckpt, nenv) in enumerate(specs):
        env = HeliEnv.build("aw109", task=TASKS[name]())
        if args.target:
            upd = _parse_target(args.target, env)
            env = env.replace(task=env.task.with_target(
                **{k: v for k, v in upd.items()
                   if k in env.task.target_dict()}))
        expert = PPOLearner(env, PPOConfig(num_envs=nenv), mesh=mesh)
        ts = expert.restore(ckpt, expert.init(jax.random.PRNGKey(0)))
        stats = ts.obs_stats if expert.config.obs_norm else None
        venv = VectorHeliEnv(env, B, auto_reset=True)
        hmap = terrain_ops.prep_hmap_arg(env.terrain)
        experts.append((name, env, expert, ts, stats, hmap, venv))

    all_obs, all_resid, all_tid = [], [], []

    # One jitted runner per (task, mode, length), built lazily and CACHED;
    # params/stats/hmap enter as arguments, never closure captures — a fresh
    # jax.jit per collect() with the expert pytree captured as a program
    # constant retraces + re-uploads through the TPU tunnel every DAgger
    # round (advisor finding, round 4; same reasoning as
    # learner/distill.py::make_collector).
    _runners = {}

    def _get_runner(tid, mode, steps):
        ck = (tid, mode, steps)
        if ck in _runners:
            return _runners[ck]
        name, env, expert, _, _, _, _ = experts[tid]

        def run(params_a, stats_a, params_e, stats_e, hmap, es, k):
            def scan_step(carry, _):
                es, k = carry
                k, k_t = jax.random.split(k)
                obs = es.obs
                if mode == "expert":
                    mean_a, _, _ = expert.network.apply(
                        params_a, expert._norm(obs, stats_a))
                    label = mean_a
                else:
                    toh = student._task_oh(
                        jnp.full((B,), tid, jnp.int32))
                    mean_a, _, _ = student.network.apply(
                        params_a, student._net_in(obs, stats_a, toh))
                    label, _, _ = expert.network.apply(
                        params_e, expert._norm(obs, stats_e))
                noise = jax.random.normal(k_t, mean_a.shape)
                executed = jnp.clip(
                    expert.act_bias + mean_a + jnp.exp(jnp.float32(cls))
                    * noise, -1.0, 1.0)
                es, out = jax.vmap(env.step, in_axes=(0, 0, None))(
                    es, executed, hmap)
                return (es, k), (obs, label)

            (_, _), (o, lbl) = jax.lax.scan(scan_step, (es, k), None,
                                            length=steps)
            return o, lbl

        _runners[ck] = jax.jit(run)
        return _runners[ck]

    def collect(tid, actor, key, steps):
        """Roll `actor` (noised) in task `tid`'s env for `steps`, labeling
        every visited state with the EXPERT's deterministic residual.
        actor = None rolls the expert itself (initial dataset);
        actor = (params_s, stats_s) rolls the student (DAgger rounds)."""
        name, env, expert, ts_e, stats_e, hmap, venv = experts[tid]
        k_env, k_act = jax.random.split(key)
        es0, _ = venv.reset(k_env)
        if actor is None:
            run = _get_runner(tid, "expert", steps)
            o, lbl = run(ts_e.params, stats_e, ts_e.params, stats_e, hmap,
                         es0, k_act)
        else:
            params_s, stats_s = actor
            run = _get_runner(tid, "student", steps)
            o, lbl = run(params_s, stats_s, ts_e.params, stats_e, hmap,
                         es0, k_act)
        o, lbl = jax.device_get((o, lbl))
        o = o.reshape(-1, o.shape[-1])
        lbl = lbl.reshape(-1, lbl.shape[-1])
        keep = np.isfinite(o).all(-1) & np.isfinite(lbl).all(-1)
        all_obs.append(o[keep])
        all_resid.append(lbl[keep])
        all_tid.append(np.full(keep.sum(), tid, np.int32))
        print(f"task {name}: +{keep.sum()} samples "
              f"({'expert' if actor is None else 'student'}-driven)",
              flush=True)

    key = jax.random.PRNGKey(args.seed)
    for tid in range(len(specs)):
        key, k_c = jax.random.split(key)
        collect(tid, None, k_c, T)

    obs = np.concatenate(all_obs)
    resid = np.concatenate(all_resid)
    tids = np.concatenate(all_tid)

    # ---- student ---------------------------------------------------------
    dst_task = MixedTask(tasks=tuple(TASKS[n]() for n, _, _ in specs))
    dst_env = HeliEnv.build("aw109", task=dst_task)
    if args.target:
        upd = _parse_target(args.target, dst_env)
        dst_env = dst_env.replace(task=MixedTask(tasks=tuple(
            t.with_target(**{k: v for k, v in upd.items()
                             if k in t.target_dict()})
            for t in dst_task.tasks)))
    hidden = (tuple(int(v) for v in args.hidden.split(","))
              if args.hidden else PPOConfig.hidden)
    student = PPOLearner(dst_env, PPOConfig(num_envs=args.out_num_envs,
                                            hidden=hidden),
                         mesh=mesh)
    task_ids = np.arange(args.out_num_envs) % len(specs)
    ts_s = student.init(jax.random.PRNGKey(args.seed + 1), task_ids=task_ids)

    # stats from the pooled scaled observations (count saturated so a PPO
    # resume's running merge cannot shift them quickly)
    scaled = np.clip(obs / np.asarray(student._scales), -50.0, 50.0)
    ts_s = ts_s.replace(obs_stats=ObsStats(
        mean=jnp.asarray(scaled.mean(0), jnp.float32),
        var=jnp.asarray(scaled.var(0) + 1e-6, jnp.float32),
        count=jnp.float32(5e6)))
    params = dict(ts_s.params, params=dict(
        ts_s.params["params"],
        log_std=jnp.full_like(ts_s.params["params"]["log_std"],
                              args.collect_log_std)))
    ts_s = ts_s.replace(params=params)

    # regression: the student input needs the task one-hot per sample — fold
    # it through the (T, B) API of make_bc_fitter by treating each sample as
    # its own env column via assign-at-collection: we instead wrap _net_in by
    # pre-concatenating the one-hot INTO the fitter's obs argument using a
    # student whose task one-hot comes from a per-sample id array.
    onehot = np.eye(len(specs), dtype=np.float32)[tids]

    n_obs_dim = obs.shape[-1]

    class _StudentView:
        """Adapter exposing the student to make_bc_fitter with the task
        one-hot spliced into the network input: the fitter hands obs_aug =
        [obs | onehot] rows; _net_in splits them again."""

        def __init__(self):
            self.network = self
            self.config = student.config
            self._actor_keys = student._actor_keys

        def apply(self, params, x):
            return student.network.apply(params, x)

        def _net_in(self, obs_aug, stats, task_oh=None):
            o = obs_aug[..., :n_obs_dim]
            oh = obs_aug[..., n_obs_dim:]
            return student._net_in(o, stats, oh)

    fitter = make_bc_fitter(_StudentView(), lr=args.bc_lr,
                            minibatch=args.minibatch)
    eval_tids = np.arange(args.eval_episodes) % len(specs)
    ev = make_evaluator(dst_env, student, episodes=args.eval_episodes,
                        steps=dst_env.time_up_steps + 3, task_ids=eval_tids)
    eval_key = jax.random.PRNGKey(1234)

    tlw = (np.asarray([float(v) for v in args.task_loss_weights.split(",")],
                      np.float32) if args.task_loss_weights else None)
    if tlw is not None and len(tlw) != len(specs):
        raise SystemExit("--task-loss-weights needs one weight per expert")

    def fit(ts_s, key):
        t = np.concatenate(all_tid)
        oh = np.eye(len(specs), dtype=np.float32)[t]
        o = np.concatenate(all_obs)
        r = np.concatenate(all_resid)
        obs_aug = np.concatenate([o, oh], -1)[None]        # (1, N, D)
        w = (tlw[t] if tlw is not None
             else np.ones(o.shape[0], np.float32))[None]
        return fitter(ts_s, jnp.asarray(obs_aug), jnp.asarray(r[None]),
                      jnp.asarray(w), epochs=args.epochs, key=key)

    def min_per_task(r):
        return min(v for k, v in r.items() if k.startswith("success_frac_t"))

    key, k_f = jax.random.split(key)
    ts_s, loss = fit(ts_s, k_f)
    r = ev(ts_s, eval_key)
    print(f"round 0: bc_loss={loss:.6f} per-task "
          f"{[round(r[f'success_frac_t{i}'], 3) for i in range(len(specs))]}",
          flush=True)
    history = [{"round": 0, "bc_loss": loss, **r}]
    best, best_r = min_per_task(r), r
    student.save(args.out + ".best.npz", ts_s)

    dagger_tids = (
        [i for i, (n, _, _) in enumerate(specs)
         if n in {s.strip() for s in args.dagger_tasks.split(",")}]
        if args.dagger_tasks else list(range(len(specs))))
    for rnd in range(1, args.dagger_rounds + 1):
        stats_s = ts_s.obs_stats if student.config.obs_norm else None
        for tid in dagger_tids:
            key, k_c = jax.random.split(key)
            collect(tid, (ts_s.params, stats_s), k_c,
                    max(T // 2, 1))
        key, k_f = jax.random.split(key)
        ts_s, loss = fit(ts_s, k_f)
        r = ev(ts_s, eval_key)
        print(f"round {rnd}: bc_loss={loss:.6f} per-task "
              f"{[round(r[f'success_frac_t{i}'], 3)
                  for i in range(len(specs))]}", flush=True)
        history.append({"round": rnd, "bc_loss": loss, **r})
        if min_per_task(r) > best:
            best, best_r = min_per_task(r), r
            student.save(args.out + ".best.npz", ts_s)
            print(f"  saved best (min per-task {best:.3f})", flush=True)

    student.save(args.out, ts_s)
    print(json.dumps(best_r, indent=2))
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump({"config": vars(args), "history": history,
                       "best_eval": best_r}, f, indent=1)
    print(f"saved {args.out}; best (min per-task {best:.3f}) -> "
          f"{args.out}.best.npz")


if __name__ == "__main__":
    main()
