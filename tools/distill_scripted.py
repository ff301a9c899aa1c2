"""Distill the scripted model-based landing controller into the actor net.

    python tools/distill_scripted.py --init examples/landing100_policy.npz \
        --band 6:100 --episodes 1024 --bc-rounds 2 --dagger-rounds 6 \
        --out landing100_scripted.npz

Why (measured, round 5 — docs/TRAINING.md "attacked six ways"): no learning
route out of the learned policies' behavior basin produces a high-altitude
arrest behavior, because PPO's exploration from 55-100 ft is crash-dominated
and success-conditioned noise flukes share no common strategy to clone. The
scripted controller (learner/scripted.py) sidesteps learning for the EXPERT —
a cascaded PD law around trim that scores ~0.95 on the 6:100 grid where the
best learned policy managed 0.574 — and this tool moves that behavior into
the standard ActorCritic so the result drops into evaluate.py, PPO resumes,
and the multitask distillation tooling unchanged.

Mechanics (expert-label distillation, the proven machinery from
tools/distill_multitask.py, with a scripted labeler):
  * BC rounds: roll the EXPERT with small exploration noise around its
    command (state coverage incl. recovery neighborhoods), label every
    pre-termination step of successful episodes with the expert's
    deterministic residual, regress the student mean onto the labels
    (actor-tower-only fitter from learner/distill.py).
  * DAgger rounds: roll the STUDENT mean (optionally noised), label the
    states the student actually visits with the expert — closes the
    covariate-shift gap exactly as in the multitask distiller; weight all
    pre-termination steps (the expert label is valid anywhere).
  * Selection: deterministic student eval on the --band altitude grid each
    round; '<out>.best.npz' keeps the best round.

The student checkpoint's obs stats are FROZEN (pass an --init whose stats
span the band, e.g. the round-4 landing100 artifact); log_std is left
untouched so a PPO polish can resume.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--init", required=True,
                    help="student init checkpoint (arch + obs stats; e.g. "
                         "the committed landing100 artifact)")
    ap.add_argument("--train-num-envs", type=int, default=512,
                    help="the init checkpoint's training num_envs "
                         "(restore template shape)")
    ap.add_argument("--band", type=str, default="6:100", metavar="LO:HI")
    ap.add_argument("--episodes", type=int, default=1024,
                    help="episodes collected per round")
    ap.add_argument("--bc-rounds", type=int, default=2,
                    help="expert-rollout behavior-cloning rounds")
    ap.add_argument("--dagger-rounds", type=int, default=6,
                    help="student-rollout expert-labeled rounds")
    ap.add_argument("--collect-log-std", type=float, default=-3.0,
                    help="exploration noise around the acting policy "
                         "during collection (both phases)")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--replay", type=int, default=1,
                    help="fit on the last N rounds' datasets concatenated "
                         "(true-DAgger aggregation; 1 = current round only)")
    ap.add_argument("--bc-lr", type=float, default=3e-4)
    ap.add_argument("--minibatch", type=int, default=65536)
    ap.add_argument("--eval-episodes", type=int, default=256)
    ap.add_argument("--turb-level", type=int, default=None,
                    help="collection turbulence override (train-hard)")
    ap.add_argument("--eval-turb-level", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--metrics-out", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses as _dc

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.vector import VectorHeliEnv
    from heligym_tpu.learner.distill import make_bc_fitter
    from heligym_tpu.learner.evaluate import make_evaluator
    from heligym_tpu.learner.ppo import PPOConfig, PPOLearner
    from heligym_tpu.learner.scripted import (ApproachGains,
                                              landing_residual,
                                              make_scripted_policy)
    from heligym_tpu.learner.train import (TASKS, _parse_target,
                                           make_alt_band_sampler,
                                           make_alt_grid_sampler)
    from heligym_tpu.ops import terrain as terrain_ops
    from heligym_tpu.parallel.mesh import make_env_mesh

    env = HeliEnv.build("aw109", task=TASKS["landing"]())
    env = env.replace(task=env.task.with_target(
        **_parse_target("touch_alt=ground", env)))
    collect_env = env if args.turb_level is None else env.replace(
        wind_params=_dc.replace(env.wind_params,
                                turbulence_level=args.turb_level))
    eval_env = env if args.eval_turb_level is None else env.replace(
        wind_params=_dc.replace(env.wind_params,
                                turbulence_level=args.eval_turb_level))

    learner = PPOLearner(env, PPOConfig(num_envs=args.train_num_envs),
                         mesh=make_env_mesh(jax.devices()[:1]))
    ts = learner.restore(args.init, learner.init(jax.random.PRNGKey(0)))

    lo, hi = (float(v) for v in args.band.split(":"))
    band = make_alt_band_sampler(lo, hi)
    grid = make_alt_grid_sampler(lo, hi)
    steps = env.time_up_steps + 3
    gains = ApproachGains()
    act_bias, trim_att, _ = make_scripted_policy(env, gains)
    assert np.allclose(np.asarray(act_bias),
                       np.asarray(learner.act_bias)), \
        "student act_bias differs from the scripted expert's trim"

    venv = VectorHeliEnv(collect_env, args.episodes, auto_reset=False)
    hmap = terrain_ops.prep_hmap_arg(collect_env.terrain)

    def make_labeled_collector(act_with_student: bool):
        """collect(params, stats, key) -> (obs, expert_resid, w, info).

        Acts with the expert (BC phase) or the student mean (DAgger
        phase), plus exploration noise; labels every visited state with
        the expert's deterministic residual. Params/stats enter as
        arguments (tunnel retrace rule, learner/distill.py)."""

        @jax.jit
        def run(params, stats, es, k):
            def scan_step(carry, t):
                es, k, res = carry
                k, k_t = jax.random.split(k)
                obs = es.obs
                label = landing_residual(obs, gains, trim_att)
                if act_with_student:
                    mean, _, _ = learner.network.apply(
                        params, learner._net_in(obs, stats))
                    base = mean
                else:
                    base = label
                noise = (jnp.exp(jnp.float32(args.collect_log_std))
                         * jax.random.normal(k_t, base.shape))
                executed = jnp.clip(learner.act_bias + base + noise,
                                    -1.0, 1.0)
                es, out = jax.vmap(collect_env.step,
                                   in_axes=(0, 0, None))(es, executed, hmap)
                alive = res["end"] < 0
                end_now = (out.done | out.truncated) & alive
                res = {"succ": res["succ"] | (end_now & out.successed),
                       "end": jnp.where(end_now, t, res["end"])}
                return (es, k, res), (obs, label, alive)

            res0 = {"succ": jnp.zeros(args.episodes, bool),
                    "end": jnp.full(args.episodes, -1, jnp.int32)}
            (_, _, res), (obs, label, alive) = jax.lax.scan(
                scan_step, (es, k, res0), jnp.arange(steps))
            if act_with_student:
                w = alive                     # expert labels valid anywhere
            else:
                w = alive & res["succ"][None, :]   # don't clone crashes
            # sanitize: a blown-up post-termination env can emit non-finite
            # obs; 0-weight rows still poison the MSE loss (0 * nan = nan)
            finite = (jnp.all(jnp.isfinite(obs), axis=-1)
                      & jnp.all(jnp.isfinite(label), axis=-1))
            w = w & finite
            obs = jnp.nan_to_num(obs, nan=0.0, posinf=0.0, neginf=0.0)
            label = jnp.nan_to_num(label, nan=0.0, posinf=0.0, neginf=0.0)
            return obs, label, w.astype(jnp.float32), res["succ"]

        def collect(ts, key):
            k_env, k_act = jax.random.split(key)
            es0, _ = venv.reset_randomized(k_env, band)
            stats = ts.obs_stats if learner.config.obs_norm else None
            obs, label, w, succ = run(ts.params, stats, es0, k_act)
            return obs, label, w, float(jnp.mean(succ.astype(jnp.float32)))

        return collect

    collect_bc = make_labeled_collector(act_with_student=False)
    collect_dagger = make_labeled_collector(act_with_student=True)
    fitter = make_bc_fitter(learner, lr=args.bc_lr, minibatch=args.minibatch)
    evaluator = make_evaluator(eval_env, learner,
                               episodes=args.eval_episodes, steps=steps,
                               cond_sampler=grid)
    key = jax.random.PRNGKey(args.seed)
    eval_key = jax.random.PRNGKey(1234)

    r0 = evaluator(ts, eval_key)
    print(f"round 0 (init): det success={r0['success_frac']:.3f} "
          f"fail={r0['fail_frac']:.3f}", flush=True)
    best, best_ts = r0["success_frac"], ts
    learner.save(args.out + ".best.npz", best_ts)
    history = [{"round": 0, **r0}]

    total = args.bc_rounds + args.dagger_rounds
    replay = []   # (obs, label, w) of the last --replay rounds
    for rnd in range(1, total + 1):
        phase = "bc" if rnd <= args.bc_rounds else "dagger"
        collect = collect_bc if phase == "bc" else collect_dagger
        key, k_c, k_f = jax.random.split(key, 3)
        obs, label, w, act_succ = collect(ts, k_c)
        kept = float(jnp.sum(w))
        print(f"round {rnd} [{phase}]: acting success={act_succ:.3f}, "
              f"{kept:.0f} labeled steps", flush=True)
        if kept < 1.0:
            print("no labeled steps - stopping", flush=True)
            break
        replay = (replay + [(obs, label, w)])[-max(1, args.replay):]
        if len(replay) > 1:   # concat along the episode axis (same T)
            obs, label, w = (jnp.concatenate(parts, axis=1)
                             for parts in zip(*replay))
        ts, l = fitter(ts, obs, label, w, epochs=args.epochs, key=k_f)
        ev = evaluator(ts, eval_key)
        print(f"round {rnd} [{phase}]: bc_loss={l:.5f} det "
              f"success={ev['success_frac']:.3f} "
              f"fail={ev['fail_frac']:.3f}", flush=True)
        history.append({"round": rnd, "phase": phase,
                        "acting_success": act_succ, "bc_loss": l, **ev})
        if ev["success_frac"] > best:
            best, best_ts = ev["success_frac"], ts
            learner.save(args.out + ".best.npz", best_ts)
            print(f"  new best ({best:.3f}) -> {args.out}.best.npz",
                  flush=True)

    learner.save(args.out, ts)
    print(f"saved {args.out}; best det success={best:.3f}", flush=True)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump({"history": history, "best": best,
                       "args": vars(args)}, f, indent=1, default=float)


if __name__ == "__main__":
    main()
