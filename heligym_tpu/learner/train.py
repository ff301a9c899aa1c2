"""CLI training entry point: PPO on a sharded hover/forward/oblique env farm.

Usage:
    python -m heligym_tpu.learner.train --task hover --num-envs 1024 --updates 200
"""
from __future__ import annotations

import argparse
import json
import time

import jax

from ..envs import HeliEnv
from ..envs.tasks import (ForwardFlightTask, HoverTask, LandingTask,
                          ObliqueFlightTask, SlalomTask, TurningFlightTask)
from .ppo import PPOConfig, PPOLearner

TASKS = {"hover": HoverTask, "forward": ForwardFlightTask,
         "oblique": ObliqueFlightTask, "turning": TurningFlightTask,
         "slalom": SlalomTask, "landing": LandingTask}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=sorted(TASKS), default="hover")
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--updates", type=int, default=100)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--metrics-out", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="path to save (and periodically update) the full "
                         "training state")
    ap.add_argument("--resume", default=None,
                    help="path of a checkpoint to resume from")
    args = ap.parse_args(argv)

    env = HeliEnv.build("aw109", task=TASKS[args.task]())
    cfg = PPOConfig(num_envs=args.num_envs, rollout_steps=args.rollout_steps,
                    lr=args.lr)
    learner = PPOLearner(env, cfg)
    print(f"devices: {jax.devices()}  envs: {cfg.num_envs}  "
          f"steps/update: {cfg.num_envs * cfg.rollout_steps}")
    t0 = time.time()
    ts, history = learner.train(jax.random.PRNGKey(args.seed), args.updates,
                                checkpoint_path=args.checkpoint,
                                resume_from=args.resume)
    dt = time.time() - t0
    total_steps = args.updates * cfg.num_envs * cfg.rollout_steps
    print(f"trained {total_steps} env-steps in {dt:.1f}s "
          f"({total_steps / dt:.0f} steps/s incl. learner)")
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump(history, f)


if __name__ == "__main__":
    main()
