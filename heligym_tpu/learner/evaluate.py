"""Batched policy evaluation: N independent fresh-trim episodes, one jitted scan.

    python -m heligym_tpu.learner.evaluate --checkpoint ck.npz.best.npz \
        --task hover --target sea_alt=start --train-num-envs 4096 --episodes 64

Each episode runs to its OWN first termination (success / crash / 40 s wall,
envs/env.py:254-295); there is no auto-reset, so the reported fractions are
true per-episode statistics, not per-transition ones. The whole evaluation is
one `lax.scan` on device — per-env end flags are latched in the carry, matching
how the reference would score `successed`/`failed` episode-by-episode
(reference success criterion: accumulated in-tolerance time >= max_time/4,
helicopter.py:236-237; failure: crash/OOB, helicopter.py:238-249).

`--train-num-envs` must match the checkpoint's training config: checkpoints
snapshot the FULL TrainState (utils/checkpoint.py validates the treedef), so
the restore template needs the same farm shape. `--episodes` is independent.

Deterministic (mean-policy) evaluation is the default; `--stochastic` samples
from the learned Gaussian instead (matches training-time behavior — on
policies whose success rides on exploration noise the two differ, see
docs/TRAINING.md).
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import HeliEnv
from ..envs.tasks import MixedTask
from ..parallel.mesh import make_env_mesh
from .ppo import PPOConfig, PPOLearner
from .train import TASKS, _parse_target


def make_evaluator(env: HeliEnv, learner: PPOLearner, *, episodes: int,
                   steps: int, stochastic: bool = False,
                   trim_cond=None, task_ids=None, cond_sampler=None):
    """Build a reusable evaluator `fn(ts, key) -> stats dict`.

    The jitted scan is traced ONCE and cached across calls — required for
    in-training periodic evaluation (PPOLearner.train `eval_every`), where a
    per-call re-trace would cost ~30 s through the TPU tunnel every time."""
    from ..envs.vector import VectorHeliEnv
    from ..ops import terrain as terrain_ops

    venv = VectorHeliEnv(env, episodes, auto_reset=False)
    hmap = terrain_ops.prep_hmap_arg(env.terrain)

    def policy(params, stats, obs, toh, k):
        # toh: per-env task one-hot from EnvState.task_id (zero-width on
        # single-task envs) — MixedTask policies are task-conditioned
        mean, log_std, _ = learner.network.apply(
            params, learner._net_in(obs, stats, toh))
        act = (mean + jnp.exp(log_std) * jax.random.normal(k, mean.shape)
               if stochastic else mean)
        return jnp.clip(learner.act_bias + act, -1.0, 1.0)

    def scan_step(carry, t):
        es, k, res, params, stats = carry
        k, k_t = jax.random.split(k)
        act = policy(params, stats, es.obs, learner._task_oh(es.task_id), k_t)
        es, out = jax.vmap(env.step, in_axes=(0, 0, None))(es, act, hmap)
        alive = res["end"] < 0
        end_now = (out.done | out.truncated) & alive
        # a blown-up env can emit one non-finite reward before its NaN-guard
        # termination (envs/env.py:287); keep the sums finite
        r = jnp.nan_to_num(out.reward, nan=0.0, posinf=0.0, neginf=0.0)
        res = {
            "succ": res["succ"] | (end_now & out.successed),
            "fail": res["fail"] | (end_now & out.failed),
            "end": jnp.where(end_now, t, res["end"]),
            "reward": res["reward"] + jnp.where(alive, r, 0.0),
        }
        return (es, k, res, params, stats), None

    @jax.jit
    def run(params, stats, es, k):
        res0 = {"succ": jnp.zeros(episodes, bool),
                "fail": jnp.zeros(episodes, bool),
                "end": jnp.full(episodes, -1, jnp.int32),
                "reward": jnp.zeros(episodes, jnp.float32)}
        (_, _, res, _, _), _ = jax.lax.scan(
            scan_step, (es, k, res0, params, stats), jnp.arange(steps))
        return res

    def evaluator(ts, key) -> dict:
        k_env, k_act = jax.random.split(key)
        if cond_sampler is not None:
            # per-episode initial conditions through the on-device batched
            # Newton trim — e.g. a deterministic altitude GRID across a
            # training band, so best-tracking selects the policy that
            # generalizes over the band instead of overfitting the single
            # --start-alt point (measured: single-point selection produced a
            # det policy succeeding at 6 and 50 ft but hover-timing-out at
            # 15-25 ft and crashing at 35 ft)
            es0, _ = venv.reset_randomized(k_env, cond_sampler)
        else:
            es0, _ = venv.reset(k_env, trim_cond)
        if task_ids is not None:
            es0 = venv.assign_tasks(es0, task_ids)
        stats = ts.obs_stats if learner.config.obs_norm else None
        res = jax.device_get(run(ts.params, stats, es0, k_act))
        succ, fail, end = res["succ"], res["fail"], res["end"]
        ended = end >= 0
        out = {
            "episodes": episodes,
            "success_frac": float(succ.mean()),
            "fail_frac": float(fail.mean()),
            # time_up without the success criterion firing, or never ended
            # within the scan horizon
            "timeout_frac": float((~succ & ~fail).mean()),
            "median_end_step": int(np.median(np.where(ended, end, steps))),
            "mean_episode_reward": float(
                (res["reward"] / np.maximum(np.where(ended, end + 1, steps),
                                            1)).mean()),
        }
        if task_ids is not None:
            tid = np.asarray(task_ids)
            for i in sorted(set(tid.tolist())):
                m = tid == i
                out[f"success_frac_t{i}"] = float(succ[m].mean())
                out[f"fail_frac_t{i}"] = float(fail[m].mean())
        return out

    return evaluator


def evaluate(env: HeliEnv, learner: PPOLearner, ts, *, episodes: int,
             steps: int, key, stochastic: bool = False,
             trim_cond=None, task_ids=None, cond_sampler=None) -> dict:
    """One-shot wrapper over `make_evaluator` (CLI entry point)."""
    return make_evaluator(env, learner, episodes=episodes, steps=steps,
                          stochastic=stochastic, trim_cond=trim_cond,
                          task_ids=task_ids,
                          cond_sampler=cond_sampler)(ts, key)


#: the standard committed-artifact eval protocol (examples/*_eval.json):
#: every artifact is scored on the SAME seed set, both policies, so no
#: number in the repo can be a one-seed cherry-pick (round-4 verdict #3)
STANDARD_SEEDS = (0, 1, 2)


def multi_seed_evaluate(env: HeliEnv, learner: PPOLearner, ts, *,
                        episodes: int, steps: int, seeds,
                        trim_cond=None, task_ids=None,
                        cond_sampler=None) -> dict:
    """Run the evaluator over `seeds` for BOTH the deterministic (mean) and
    the stochastic policy; return per-seed results plus aggregates.

    Each (policy, seed) pair draws fresh initial conditions and Dryden wind
    streams from PRNGKey(seed); the two jitted evaluators are traced once
    and reused across seeds. Aggregates report mean/std/min over seeds of
    the headline fractions — the cross-seed std is the number that answers
    "was this one lucky seed?" (binomial noise at 256 episodes is ~±0.03;
    a seed effect shows up as std well above that)."""
    per_seed = {"mean": [], "stochastic": []}
    for policy_name, stochastic in (("mean", False), ("stochastic", True)):
        ev = make_evaluator(env, learner, episodes=episodes, steps=steps,
                            stochastic=stochastic, trim_cond=trim_cond,
                            task_ids=task_ids, cond_sampler=cond_sampler)
        for seed in seeds:
            r = ev(ts, jax.random.PRNGKey(int(seed)))
            per_seed[policy_name].append({"seed": int(seed), **r})

    def aggregate(rows):
        keys = [k for k in rows[0]
                if k.startswith(("success_frac", "fail_frac",
                                 "timeout_frac"))]
        out = {}
        for k in keys:
            v = np.asarray([r[k] for r in rows], np.float64)
            out[k] = {"mean": float(v.mean()), "std": float(v.std()),
                      "min": float(v.min()), "max": float(v.max())}
        return out

    return {"episodes": episodes, "seeds": [int(s) for s in seeds],
            "per_seed": per_seed,
            "aggregate": {p: aggregate(rows)
                          for p, rows in per_seed.items()}}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--task", choices=sorted(TASKS), default="hover")
    ap.add_argument("--tasks", default=None,
                    help="comma list for MixedTask checkpoints (must match "
                         "training); episodes are split round-robin and "
                         "per-task fractions reported")
    ap.add_argument("--target", default=None,
                    help="task target override 'k=v,...' (match training)")
    ap.add_argument("--train-num-envs", type=int, default=512,
                    help="num_envs of the TRAINING run (restore template "
                         "shape; utils/checkpoint.py validates the treedef)")
    ap.add_argument("--episodes", type=int, default=64)
    ap.add_argument("--steps", type=int, default=0,
                    help="scan horizon (0 = the env's 40 s wall + margin)")
    ap.add_argument("--stochastic", action="store_true",
                    help="sample the learned Gaussian instead of the mean")
    ap.add_argument("--set-log-std", type=float, default=None,
                    help="overwrite the checkpoint's learned log-std before "
                         "evaluating — probes how stochastic success scales "
                         "with noise without retraining (the std-surgery "
                         "calibration step; see PPOLearner.train)")
    ap.add_argument("--no-center-actions", action="store_true")
    ap.add_argument("--start-alt", type=float, default=None,
                    help="initial trim altitude above ground [ft] "
                         "(match training)")
    ap.add_argument("--start-band", type=str, default=None, metavar="LO:HI",
                    help="evaluate on a deterministic linspace(LO, HI) "
                         "start-altitude grid (one altitude per episode, "
                         "batched on-device trim) instead of a single "
                         "--start-alt — reports band-wide generalization")
    ap.add_argument("--max-time", type=float, default=None,
                    help="episode wall [s] (reference set_max_time; match "
                         "training)")
    ap.add_argument("--turb-level", type=int, default=None,
                    help="override the Dryden turbulence level (1..7) for "
                         "the evaluation env — robustness probe (mean wind "
                         "unchanged, trim cache shared)")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to the CPU backend")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=str, default=None, metavar="S0,S1,...",
                    help="multi-seed protocol: run EVERY listed seed for "
                         "BOTH the mean and the stochastic policy and "
                         "report per-seed + aggregate stats (the standard "
                         "committed-artifact protocol is seeds 0,1,2 x 256 "
                         "episodes; makes single-seed cherry-picking "
                         "impossible). Overrides --seed/--stochastic.")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)
    if args.start_band and args.start_alt is not None:
        # --start-band used to silently override --start-alt (advisor
        # finding, round 3); make the conflict loud
        ap.error("--start-band and --start-alt are mutually exclusive")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    task_ids = None
    if args.tasks:
        names = [s.strip() for s in args.tasks.split(",") if s.strip()]
        task = MixedTask(tasks=tuple(TASKS[n]() for n in names))
        task_ids = np.arange(args.episodes) % len(names)
    else:
        task = TASKS[args.task]()
    env = HeliEnv.build("aw109", task=task)
    if args.target:
        updates = _parse_target(args.target, env)
        if args.tasks:
            subs = tuple(t.with_target(**{k: v for k, v in updates.items()
                                          if k in t.target_dict()})
                         for t in env.task.tasks)
            env = env.replace(task=MixedTask(tasks=subs))
        else:
            env = env.replace(task=env.task.with_target(**updates))

    if args.max_time is not None:
        env = env.replace(max_time=args.max_time)
    if args.turb_level is not None:
        import dataclasses as _dc
        env = env.replace(wind_params=_dc.replace(
            env.wind_params, turbulence_level=args.turb_level))
    learner = PPOLearner(
        env, PPOConfig(num_envs=args.train_num_envs,
                       center_actions=not args.no_center_actions),
        mesh=make_env_mesh(jax.devices()[:1]))
    template = learner.init(jax.random.PRNGKey(0))
    ts = learner.restore(args.checkpoint, template)
    if args.set_log_std is not None:
        params = jax.tree_util.tree_map(lambda x: x, ts.params)
        params["params"]["log_std"] = jnp.full_like(
            params["params"]["log_std"], args.set_log_std)
        ts = ts.replace(params=params)

    steps = args.steps or env.time_up_steps + 3
    cond_sampler = None
    if args.start_band:
        from .train import make_alt_grid_sampler
        cond_sampler = make_alt_grid_sampler(
            *(float(v) for v in args.start_band.split(":")))
    trim_cond = ({"gr_alt": args.start_alt}
                 if args.start_alt is not None else None)
    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",")]
        result = multi_seed_evaluate(
            env, learner, ts, episodes=args.episodes, steps=steps,
            seeds=seeds, trim_cond=trim_cond, task_ids=task_ids,
            cond_sampler=cond_sampler)
        result = {"checkpoint": args.checkpoint,
                  "turb_level": args.turb_level, **result}
    else:
        result = evaluate(
            env, learner, ts, episodes=args.episodes, steps=steps,
            key=jax.random.PRNGKey(args.seed), stochastic=args.stochastic,
            trim_cond=trim_cond,
            task_ids=task_ids, cond_sampler=cond_sampler)
        result = {"checkpoint": args.checkpoint,
                  "policy": "stochastic" if args.stochastic else "mean",
                  "seed": args.seed, "turb_level": args.turb_level, **result}
    print(json.dumps(result, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
