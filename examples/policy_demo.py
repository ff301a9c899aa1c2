#!/usr/bin/env python
"""Roll out a trained PPO policy and render it with the native rasterizer.

    python examples/policy_demo.py --checkpoint examples/hover_policy.npz \
        --out examples/hover_policy.gif --task hover --target sea_alt=start

--task/--target must match the checkpoint's training invocation so the
reported reward/success reflect the objective the policy was trained on
(the policy network itself is target-agnostic: targets live in the reward).
"""
import argparse

import jax
import numpy as np

from heligym_tpu.envs import HeliEnv
from heligym_tpu.learner import PPOConfig, PPOLearner
from heligym_tpu.learner.train import TASKS, _parse_target
from heligym_tpu.parallel import make_env_mesh
from heligym_tpu.render import get_renderer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="examples/hover_policy.npz")
    ap.add_argument("--out", default="examples/hover_policy.gif")
    ap.add_argument("--task", choices=sorted(TASKS), default="hover")
    ap.add_argument("--target", default=None,
                    help="task target override 'k=v,...' (match training)")
    ap.add_argument("--num-envs", type=int, default=2048,
                    help="must match the checkpoint's training config")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--every", type=int, default=8)
    ap.add_argument("--camera", choices=("chase", "orbit"), default="chase")
    ap.add_argument("--no-center-actions", action="store_true",
                    help="checkpoint was trained with absolute (uncentered) "
                         "actions — must match training")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to the CPU backend")
    ap.add_argument("--start-alt", type=float, default=None,
                    help="initial trim altitude above ground [ft] "
                         "(match training --start-alt)")
    ap.add_argument("--seed", type=int, default=42,
                    help="episode RNG seed (wind turbulence stream)")
    ap.add_argument("--stochastic", action="store_true",
                    help="sample actions from the policy distribution "
                         "instead of taking the mean")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    env = HeliEnv.build("aw109", task=TASKS[args.task]())
    if args.target:
        env = env.replace(task=env.task.with_target(
            **_parse_target(args.target, env)))
    learner = PPOLearner(
        env, PPOConfig(num_envs=args.num_envs,
                       center_actions=not args.no_center_actions),
        mesh=make_env_mesh(jax.devices()[:1]))
    template = learner.init(jax.random.PRNGKey(0))
    ts = learner.restore(args.checkpoint, template)

    es, obs = env.reset(
        jax.random.PRNGKey(args.seed),
        {"gr_alt": args.start_alt} if args.start_alt is not None else None)
    step = jax.jit(env.step)
    stats = ts.obs_stats if learner.config.obs_norm else None
    if args.stochastic:
        policy = jax.jit(lambda o, k: learner.policy(
            ts.params, o[None], key=k, obs_stats=stats)[0])
        act_key = jax.random.PRNGKey(args.seed + 10_000)
    else:
        policy = jax.jit(lambda o, k: learner.policy(
            ts.params, o[None], obs_stats=stats)[0])
        act_key = jax.random.PRNGKey(0)   # unused

    renderer = get_renderer(env, camera_mode=args.camera,
                            orbit_frames=args.steps // args.every)
    frames, rewards = [], []
    succ = failed = False
    # Gear legs hang LG.LOC z below the CG, so the skids physically reach the
    # ground when obs[16] (CG altitude above ground) <= leg reach (contact
    # FORCES engage earlier, in the reference's leg_alt < ground + WL_CG/12
    # window — ops/gear.py).
    gear_h = max(l[2] for l in env.params.LG.LOC)
    contact_steps, min_agl, first_contact = 0, float("inf"), -1
    for t in range(args.steps):
        act_key, k_t = jax.random.split(act_key)
        act = policy(es.obs, k_t)
        es, out = step(es, act)
        rewards.append(float(out.reward))
        agl = float(es.obs[16]) - gear_h
        min_agl = min(min_agl, agl)
        if agl <= 0.0:
            contact_steps += 1
            if first_contact < 0:
                first_contact = t
        if t % args.every == 0:
            frames.append(np.asarray(renderer.render(es)))
        succ = succ or bool(out.successed)
        if bool(out.done) or bool(out.truncated):
            failed = bool(out.failed)
            print(f"episode ended at step {t} "
                  f"(successed={bool(out.successed)}, failed={failed}, "
                  f"time_up={bool(out.time_up)})")
            break
    renderer.close()

    import imageio.v2 as imageio
    imageio.mimsave(args.out, frames, duration=0.12, loop=0)
    succ_s = float(es.successed_steps) * env.dt
    print(f"wrote {args.out}: {len(frames)} frames; "
          f"mean reward {np.mean(rewards):+.3f}; successed={succ} "
          f"failed={failed} "
          f"(accumulated success time {succ_s:.1f}s / "
          f"{env.success_duration:.1f}s needed); "
          f"final alt {float(es.obs[15]):.0f} ft")
    if first_contact >= 0:
        print(f"touchdown: gear on ground from step {first_contact} "
              f"({first_contact * env.dt:.1f}s), {contact_steps} "
              f"gear-contact steps, min skid height {min_agl:+.2f} ft")
    else:
        print(f"no gear contact (min skid height {min_agl:+.2f} ft)")


if __name__ == "__main__":
    main()
