"""Self-imitation distillation: clone SUCCESSFUL stochastic episodes into
the deterministic mean policy.

    python -m heligym_tpu.learner.distill --checkpoint land.npz \
        --task landing --target touch_alt=ground --train-num-envs 2048 \
        --band 6:55 --episodes 2048 --rounds 4 --out distilled.npz

Why this exists (measured, docs/TRAINING.md "the landing problem"): on the
landing task the stochastic policy succeeds at 0.5-0.7 while its own MEAN
succeeds at ~0.05 — the exploration dither is load-bearing (it supplies the
high-frequency station-keeping the frictionless gear contact needs, and it
kicks the policy out of the hover attractor above the pad). PPO's gradient
keeps paying the stochastic behavior, so the gap never closes from PPO alone.

The fix is the selection effect: in episodes that SUCCEEDED, the noise was
not white — conditioned on success, the executed action correlates with the
state (when drifting up, the successful episodes are the ones whose noise
pushed down). Regressing the mean onto the EXECUTED actions of successful
episodes (reward-filtered behavior cloning, as in self-imitation learning /
reward-weighted regression) distills that state-conditioned correlation into
a deterministic feedback law. Iterating collect -> clone (DAgger-style, each
round collecting from the updated policy + its noise) walks the mean toward
a policy whose own deterministic rollout lands.

Only the ACTOR tower is regressed (ActorCritic's actor and critic are
separate MLPs, ppo.py:213-219): the critic and log_std are untouched, so a
follow-up PPO polish can resume from the distilled checkpoint.

Collection std caveat: after a std-cap-annealed run (--std-cap-updates) the
checkpoint's log_std PARAMETER keeps its stale pre-cap value; the behavior
the run trained was min(param, cap_final). Pass --collect-std-cap (or
--collect-log-std) to reproduce it — the effective sampling log-std is
printed each round so a mismatch is visible.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs import HeliEnv
from ..envs.vector import VectorHeliEnv
from ..ops import terrain as terrain_ops
from ..parallel.mesh import make_env_mesh
from .ppo import PPOConfig, PPOLearner
from .evaluate import make_evaluator
from .train import TASKS, _parse_target, make_alt_band_sampler, \
    make_alt_grid_sampler


def make_collector(env: HeliEnv, learner: PPOLearner, *, episodes: int,
                   steps: int, cond_sampler):
    """Build a reusable `collect(ts, key, ...) -> (obs, resid, w, succ_frac)`
    rolling `episodes` stochastic episodes; weight>0 only on pre-termination
    steps of SUCCESSFUL episodes.

    The regression target is the executed action re-expressed as the
    pre-bias residual (executed - act_bias): cloning it makes
    clip(act_bias + mean(obs)) reproduce the executed action exactly.

    The jitted scan is traced ONCE per factory; params/stats/hmap enter as
    ARGUMENTS, not closure captures — a captured device array becomes a
    jit-program constant that re-materializes inside the scan and forces a
    full retrace + re-upload through the TPU tunnel every DAgger round
    (advisor finding, round 3)."""
    venv = VectorHeliEnv(env, episodes, auto_reset=False)
    hmap = terrain_ops.prep_hmap_arg(env.terrain)
    # cond_sampler=None -> default trim resets (non-landing tasks)

    @jax.jit
    def run(params, stats, hmap, es, k):
        def scan_step(carry, t):
            es, k, res = carry
            k, k_t = jax.random.split(k)
            obs = es.obs
            mean, log_std, _ = learner.network.apply(
                params, learner._net_in(obs, stats,
                                        learner._task_oh(es.task_id)))
            noise = jax.random.normal(k_t, mean.shape)
            executed = jnp.clip(learner.act_bias + mean
                                + jnp.exp(log_std) * noise, -1.0, 1.0)
            es, out = jax.vmap(env.step, in_axes=(0, 0, None))(es, executed,
                                                               hmap)
            alive = res["end"] < 0
            end_now = (out.done | out.truncated) & alive
            res = {"succ": res["succ"] | (end_now & out.successed),
                   "end": jnp.where(end_now, t, res["end"])}
            return (es, k, res), (obs, executed - learner.act_bias, alive)

        res0 = {"succ": jnp.zeros(episodes, bool),
                "end": jnp.full(episodes, -1, jnp.int32)}
        (_, _, res), (obs, resid, alive) = jax.lax.scan(
            scan_step, (es, k, res0), jnp.arange(steps))
        # (T, B) weights: alive steps of successful episodes
        w = alive & res["succ"][None, :]
        return obs, resid, w.astype(jnp.float32), res["succ"]

    def collect(ts, key, *, log_std_override=None, std_cap=None):
        params = ts.params
        log_std = params["params"]["log_std"]
        if log_std_override is not None:
            log_std = jnp.full_like(log_std, log_std_override)
        elif std_cap is not None:
            # a std-cap-annealed run's effective behavior std (ppo.py:572-576)
            log_std = jnp.minimum(log_std, std_cap)
        params = dict(params, params=dict(params["params"], log_std=log_std))
        print(f"  sampling log_std = "
              f"{np.array2string(np.asarray(log_std), precision=2)}",
              flush=True)
        stats = ts.obs_stats if learner.config.obs_norm else None
        k_env, k_act = jax.random.split(key)
        if cond_sampler is not None:
            es0, _ = venv.reset_randomized(k_env, cond_sampler)
        else:
            es0, _ = venv.reset(k_env)
        obs, resid, w, succ = run(params, stats, hmap, es0, k_act)
        return obs, resid, w, float(jnp.mean(succ.astype(jnp.float32)))

    return collect


def make_bc_fitter(learner: PPOLearner, *, lr: float, minibatch: int):
    """Build a reusable weighted-MSE regressor of the actor mean onto
    executed residuals. Gradients are masked to the actor tower (minus
    log_std, which the MSE loss never touches anyway); critic parameters
    stay bit-identical. The jitted epoch is traced once per dataset shape."""
    tx = optax.adam(lr)
    # freeze everything but the actor tower: masking the UPDATES (not just
    # the grads) keeps adam moments for frozen leaves at exactly zero
    actor = learner._actor_keys - {"log_std"}

    def mask_updates(updates):
        def mask(path, u):
            names = {getattr(p, "key", None) for p in path}
            return u if names & actor else jnp.zeros_like(u)
        return jax.tree_util.tree_map_with_path(mask, updates)

    def loss_fn(params, stats, o, r, ww):
        # single-task only (CLI builds TASKS[...]; _net_in raises loudly on
        # a MixedTask learner, whose loss would need per-sample task ids)
        mean, _, _ = learner.network.apply(params,
                                           learner._net_in(o, stats))
        per = jnp.sum((mean - r) ** 2, axis=-1)
        return jnp.sum(ww * per) / (jnp.sum(ww) + 1e-8)

    # the dataset is passed as ARGUMENTS, not captured in the closure (same
    # retrace/re-upload reasoning as make_collector)
    @jax.jit
    def epoch(params, opt_state, stats, k, obs, resid, w):
        n = obs.shape[0]
        mb = min(minibatch, n)          # small sanity runs: n < minibatch
        nb = n // mb
        perm = jax.random.permutation(k, n)[:nb * mb].reshape(nb, mb)

        def step(carry, idx):
            params, opt_state = carry
            l, g = jax.value_and_grad(loss_fn)(params, stats, obs[idx],
                                               resid[idx], w[idx])
            upd, opt_state = tx.update(g, opt_state, params)
            upd = mask_updates(upd)
            params = optax.apply_updates(params, upd)
            return (params, opt_state), l

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   perm)
        return params, opt_state, jnp.mean(losses)

    def fit(ts, obs, resid, w, *, epochs: int, key):
        if epochs < 1:
            raise ValueError("bc_fit needs epochs >= 1")
        T, B = w.shape
        obs = obs.reshape(T * B, -1)
        resid = resid.reshape(T * B, -1)
        w = w.reshape(T * B)
        stats = ts.obs_stats if learner.config.obs_norm else None
        params = ts.params
        opt_state = tx.init(params)
        for _ in range(epochs):
            key, k_e = jax.random.split(key)
            params, opt_state, l = epoch(params, opt_state, stats, k_e,
                                         obs, resid, w)
        return ts.replace(params=params), float(l)

    return fit


def collect_successful(env, learner, ts, *, episodes, steps, key,
                       cond_sampler, log_std_override=None, std_cap=None):
    """One-shot wrapper over `make_collector` (tests / interactive use)."""
    return make_collector(env, learner, episodes=episodes, steps=steps,
                          cond_sampler=cond_sampler)(
        ts, key, log_std_override=log_std_override, std_cap=std_cap)


def bc_fit(learner, ts, obs, resid, w, *, epochs, lr, minibatch, key):
    """One-shot wrapper over `make_bc_fitter` (tests / interactive use)."""
    return make_bc_fitter(learner, lr=lr, minibatch=minibatch)(
        ts, obs, resid, w, epochs=epochs, key=key)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--task", choices=sorted(TASKS), default="landing")
    ap.add_argument("--target", default=None)
    ap.add_argument("--train-num-envs", type=int, default=512,
                    help="the checkpoint's training num_envs (restore "
                         "template shape)")
    ap.add_argument("--band", type=str, default="6:55", metavar="LO:HI",
                    help="start-altitude band: collection samples it "
                         "uniformly, evaluation grids it; 'none' uses the "
                         "task's default trim resets (non-landing tasks)")
    ap.add_argument("--episodes", type=int, default=2048,
                    help="stochastic episodes collected per round")
    ap.add_argument("--rounds", type=int, default=4,
                    help="DAgger-style collect->clone rounds (collection "
                         "re-runs under the UPDATED policy each round)")
    ap.add_argument("--epochs", type=int, default=8,
                    help="BC epochs over the collected dataset per round")
    ap.add_argument("--bc-lr", type=float, default=3e-4)
    ap.add_argument("--minibatch", type=int, default=65536)
    ap.add_argument("--collect-log-std", type=float, default=None,
                    help="sample collection actions at this log-std instead "
                         "of the checkpoint's parameter")
    ap.add_argument("--collect-std-cap", type=float, default=None,
                    help="elementwise ceiling on the sampling log-std — set "
                         "to the training run's --std-cap-final: after a "
                         "std-cap anneal the stored parameter keeps its "
                         "stale pre-cap value (ppo.py set_log_std notes), "
                         "so raw-parameter collection is much noisier than "
                         "the trained behavior")
    ap.add_argument("--eval-band", type=str, default=None, metavar="LO:HI",
                    help="evaluation/selection altitude grid when it should "
                         "differ from the COLLECTION band (e.g. collect "
                         "55:100 where the missing behavior lives, select "
                         "on 6:100 so low-band competence is protected); "
                         "default: same as --band")
    ap.add_argument("--eval-episodes", type=int, default=256)
    ap.add_argument("--turb-level", type=int, default=None,
                    help="override the Dryden turbulence level (1..7) for "
                         "COLLECTION — robustness distillation: clone "
                         "stochastic successes under hard turbulence so the "
                         "mean learns gust rejection (the hover flagship's "
                         "train-hard recipe applied to the BC loop)")
    ap.add_argument("--eval-turb-level", type=int, default=None,
                    help="turbulence level of the selection evaluator "
                         "(default: the model's nominal level — train hard, "
                         "select easy; set equal to --turb-level to select "
                         "directly for turbulence robustness)")
    ap.add_argument("--no-center-actions", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True,
                    help="output checkpoint; '<out>.best.npz' keeps the "
                         "round with the highest deterministic band success "
                         "(round 0 = the input checkpoint)")
    ap.add_argument("--metrics-out", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    env = HeliEnv.build("aw109", task=TASKS[args.task]())
    if args.target:
        env = env.replace(task=env.task.with_target(
            **_parse_target(args.target, env)))
    # collection/evaluation turbulence overrides (mean wind unchanged, so
    # the trim disk cache is shared across all variants)
    import dataclasses as _dc
    collect_env = env if args.turb_level is None else env.replace(
        wind_params=_dc.replace(env.wind_params,
                                turbulence_level=args.turb_level))
    eval_env = env if args.eval_turb_level is None else env.replace(
        wind_params=_dc.replace(env.wind_params,
                                turbulence_level=args.eval_turb_level))
    learner = PPOLearner(
        env, PPOConfig(num_envs=args.train_num_envs,
                       center_actions=not args.no_center_actions),
        mesh=make_env_mesh(jax.devices()[:1]))
    ts = learner.restore(args.checkpoint, learner.init(jax.random.PRNGKey(0)))

    if args.band == "none":
        band = grid = None
    else:
        lo, hi = (float(v) for v in args.band.split(":"))
        band = make_alt_band_sampler(lo, hi)
        grid = make_alt_grid_sampler(lo, hi)
    if args.eval_band:
        grid = make_alt_grid_sampler(
            *(float(v) for v in args.eval_band.split(":")))
    steps = env.time_up_steps + 3
    collector = make_collector(collect_env, learner, episodes=args.episodes,
                               steps=steps, cond_sampler=band)
    fitter = make_bc_fitter(learner, lr=args.bc_lr, minibatch=args.minibatch)
    evaluator = make_evaluator(eval_env, learner, episodes=args.eval_episodes,
                               steps=steps, cond_sampler=grid)
    key = jax.random.PRNGKey(args.seed)
    eval_key = jax.random.PRNGKey(1234)

    r0 = evaluator(ts, eval_key)
    print(f"round 0 (input): det band success={r0['success_frac']:.3f} "
          f"fail={r0['fail_frac']:.3f}", flush=True)
    best, best_ts = r0["success_frac"], ts
    # the input checkpoint IS round 0's best: save it so the printed
    # '<out>.best.npz' path exists even if no round improves on it
    learner.save(args.out + ".best.npz", best_ts)
    history = [{"round": 0, **r0}]

    for rnd in range(1, args.rounds + 1):
        key, k_c, k_b = jax.random.split(key, 3)
        obs, resid, w, succ = collector(
            ts, k_c, log_std_override=args.collect_log_std,
            std_cap=args.collect_std_cap)
        kept = float(jnp.sum(w))
        print(f"round {rnd}: collected {args.episodes} episodes, "
              f"stochastic success={succ:.3f}, {kept:.0f} cloned steps",
              flush=True)
        if kept < 1.0:
            print("no successful episodes - stopping", flush=True)
            break
        ts, l = fitter(ts, obs, resid, w, epochs=args.epochs, key=k_b)
        ev = evaluator(ts, eval_key)
        print(f"round {rnd}: bc_loss={l:.5f} det band "
              f"success={ev['success_frac']:.3f} "
              f"fail={ev['fail_frac']:.3f}", flush=True)
        history.append({"round": rnd, "stoch_success": succ,
                        "bc_loss": l, **ev})
        if ev["success_frac"] > best:
            best, best_ts = ev["success_frac"], ts
            learner.save(args.out + ".best.npz", best_ts)
            print(f"  saved best (round {rnd}, success={best:.3f})",
                  flush=True)

    learner.save(args.out, ts)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump({"config": vars(args), "history": history}, f)
    print(f"final: last round -> {args.out}; best det band success={best:.3f}"
          f" -> {args.out}.best.npz")


if __name__ == "__main__":
    main()
