"""Blend two altitude-phase experts into ONE landing policy by distillation.

    python tools/distill_hybrid.py \
        --lander examples/landing_band_policy.npz:4096 \
        --descender descend30.npz:4096 \
        --band 6:100 --switch-agl 34 --blend-width 6 \
        --rounds 8 --out hybrid.npz

Why (measured, round 4, docs/TRAINING.md): the low-altitude lander is
excellent (6-55 ft det 0.719, zero crashes) but arrives too hot from
55-100 ft; every direct fix failed — PPO on the high band collapses,
altitude-chained self-imitation does not bootstrap (the high-altitude
flare is a NEW behavior the noise pool never discovers), and a longer
episode budget changes nothing (the crash mode is behavioral). The
missing behavior is separable: "descend to a low hover" is trainable on
its own (LandingTask with touch_alt = contact + 30 turns the per-step
success gate into a 30-ft station-keep). This tool composes the two:

  * roll the STUDENT (noised) on the full landing task over the band;
  * label every visited state with an altitude-gated blend of the two
    experts' deterministic means — w(agl) * descender + (1-w) * lander,
    w = sigmoid((agl - switch)/width) — each expert evaluated under its
    OWN obs stats;
  * behavior-clone the student's actor onto the blended labels
    (learner/distill.py::make_bc_fitter), DAgger-style rounds, and
    best-track a deterministic band-grid evaluation.

The student starts as the LANDER (its near-ground competence is the
harder-won asset); the descender grafts in above the switch altitude.
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
    ap.add_argument("--lander", required=True, metavar="CKPT:NENV",
                    help="low-altitude landing expert (student init)")
    ap.add_argument("--descender", required=True, metavar="CKPT:NENV",
                    help="descend-to-hover expert (labels above the switch)")
    ap.add_argument("--target", default="touch_alt=ground",
                    help="the FULL task's target (evaluation objective)")
    ap.add_argument("--band", default="6:100", metavar="LO:HI")
    ap.add_argument("--switch-agl", type=float, default=34.0,
                    help="blend midpoint [ft AGL]")
    ap.add_argument("--blend-width", type=float, default=6.0,
                    help="sigmoid width [ft] of the expert handover")
    ap.add_argument("--episodes", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--bc-lr", type=float, default=3e-4)
    ap.add_argument("--minibatch", type=int, default=65536)
    ap.add_argument("--collect-log-std", type=float, default=-3.0)
    ap.add_argument("--eval-episodes", type=int, default=256)
    ap.add_argument("--out", required=True)
    ap.add_argument("--metrics-out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.vector import VectorHeliEnv
    from heligym_tpu.learner import PPOConfig, PPOLearner
    from heligym_tpu.learner.distill import make_bc_fitter
    from heligym_tpu.learner.evaluate import make_evaluator
    from heligym_tpu.learner.train import (TASKS, _parse_target,
                                           make_alt_band_sampler,
                                           make_alt_grid_sampler)
    from heligym_tpu.ops import terrain as terrain_ops
    from heligym_tpu.parallel import make_env_mesh

    mesh = make_env_mesh(jax.devices()[:1])
    env = HeliEnv.build("aw109", task=TASKS["landing"]())
    env = env.replace(task=env.task.with_target(
        **_parse_target(args.target, env)))

    def load(spec):
        ck, nenv = spec.rsplit(":", 1)
        l = PPOLearner(env, PPOConfig(num_envs=int(nenv)), mesh=mesh)
        ts = l.restore(ck, l.init(jax.random.PRNGKey(0)))
        return l, ts

    lander, ts_land = load(args.lander)
    desc, ts_desc = load(args.descender)
    # student = the lander (same learner object/params to start)
    ts_s = ts_land

    lo, hi = (float(v) for v in args.band.split(":"))
    band = make_alt_band_sampler(lo, hi)
    grid = make_alt_grid_sampler(lo, hi)
    B = args.episodes
    steps = env.time_up_steps + 3
    venv = VectorHeliEnv(env, B, auto_reset=False)
    hmap = terrain_ops.prep_hmap_arg(env.terrain)
    cls = float(args.collect_log_std)

    @jax.jit
    def collect(params_s, stats_s, params_d, stats_d, params_l, stats_l,
                hmap, es, k):
        def scan_step(carry, _):
            es, k, alive = carry
            k, k_t = jax.random.split(k)
            obs = es.obs
            mean_s, _, _ = lander.network.apply(
                params_s, lander._norm(obs, stats_s))
            noise = jax.random.normal(k_t, mean_s.shape)
            executed = jnp.clip(lander.act_bias + mean_s
                                + jnp.exp(jnp.float32(cls)) * noise,
                                -1.0, 1.0)
            # altitude-gated expert blend, each under its OWN stats
            m_l, _, _ = lander.network.apply(params_l,
                                             lander._norm(obs, stats_l))
            m_d, _, _ = desc.network.apply(params_d,
                                           desc._norm(obs, stats_d))
            w = jax.nn.sigmoid((obs[..., 16] - args.switch_agl)
                               / args.blend_width)[..., None]
            label = w * m_d + (1.0 - w) * m_l
            es, out = jax.vmap(env.step, in_axes=(0, 0, None))(es, executed,
                                                               hmap)
            # latch each env's first termination (as in learner/distill.py's
            # make_collector): with auto_reset=False the env keeps
            # integrating past done, and finite-but-invalid post-crash /
            # post-success states would otherwise enter the BC dataset
            # (advisor finding, round 4)
            alive_next = alive & ~(out.done | out.truncated)
            return (es, k, alive_next), (obs, label, alive)

        alive0 = jnp.ones(B, bool)
        (_, _, _), (o, lbl, alive) = jax.lax.scan(
            scan_step, (es, k, alive0), None, length=steps)
        return o, lbl, alive

    fitter = make_bc_fitter(lander, lr=args.bc_lr, minibatch=args.minibatch)
    evaluator = make_evaluator(env, lander, episodes=args.eval_episodes,
                               steps=steps, cond_sampler=grid)
    key = jax.random.PRNGKey(args.seed)
    eval_key = jax.random.PRNGKey(1234)

    r0 = evaluator(ts_s, eval_key)
    print(f"round 0 (lander): det band success={r0['success_frac']:.3f} "
          f"fail={r0['fail_frac']:.3f}", flush=True)
    best, history = r0["success_frac"], [{"round": 0, **r0}]
    lander.save(args.out + ".best.npz", ts_s)

    stats_l = ts_land.obs_stats
    stats_d = ts_desc.obs_stats
    for rnd in range(1, args.rounds + 1):
        key, k_c, k_e, k_f = jax.random.split(key, 4)
        es0, _ = venv.reset_randomized(k_e, band)
        o, lbl, alive = collect(ts_s.params, ts_s.obs_stats, ts_desc.params,
                                stats_d, ts_land.params, stats_l, hmap,
                                es0, k_c)
        o, lbl, alive = jax.device_get((o, lbl, alive))
        keep = (alive & np.isfinite(o).all(-1) & np.isfinite(lbl).all(-1))
        w_fit = keep.astype(np.float32)
        # crashed/terminated states keep integrating in this no-autoreset
        # scan and go non-finite; their weight is 0 but a NaN label would
        # still poison the loss through 0 * NaN — replace, don't just mask
        o = np.nan_to_num(o, nan=0.0, posinf=0.0, neginf=0.0)
        lbl = np.nan_to_num(lbl, nan=0.0, posinf=0.0, neginf=0.0)
        print(f"  kept {keep.sum()}/{keep.size} finite samples", flush=True)
        ts_s, loss = fitter(ts_s, jnp.asarray(o), jnp.asarray(lbl),
                            jnp.asarray(w_fit), epochs=args.epochs, key=k_f)
        r = evaluator(ts_s, eval_key)
        print(f"round {rnd}: bc_loss={loss:.5f} det band "
              f"success={r['success_frac']:.3f} fail={r['fail_frac']:.3f}",
              flush=True)
        history.append({"round": rnd, "bc_loss": loss, **r})
        if r["success_frac"] > best:
            best = r["success_frac"]
            lander.save(args.out + ".best.npz", ts_s)
            print(f"  saved best ({best:.3f})", flush=True)

    lander.save(args.out, ts_s)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump({"config": vars(args), "history": history}, f, indent=1)
    print(f"final best det band success={best:.3f} -> {args.out}.best.npz")


if __name__ == "__main__":
    main()
