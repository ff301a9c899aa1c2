#!/usr/bin/env python
"""Minimal end-to-end demo: trim, batched rollout, metrics.

    python examples/rollout_demo.py [--num-envs 1024] [--steps 500] [--fused]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import HeliEnv, VectorHeliEnv
from heligym_tpu.envs.tasks import HoverTask
from heligym_tpu.ops.pallas import build_fused_rollout
from heligym_tpu.parallel import farm_metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--heli", default="aw109")
    args = ap.parse_args()

    env = HeliEnv.build(args.heli, task=HoverTask())
    venv = VectorHeliEnv(env, args.num_envs)
    print("solving trim...")
    state, obs = venv.reset(jax.random.PRNGKey(0))
    trim_action = jnp.asarray(env.trim_result().action)
    actions = jnp.tile(trim_action, (args.num_envs, 1))

    t0 = time.time()
    if args.fused:
        rollout = jax.jit(build_fused_rollout(env, args.num_envs, args.steps,
                                              collect=("reward", "done")))
        state, outs = rollout(state, actions)
        rewards, dones = outs["reward"], outs["done"]
    else:
        rewards, dones = [], []
        for _ in range(args.steps):
            state, out = venv.step(state, actions)
            rewards.append(out.reward)
            dones.append(out.done)
        rewards, dones = jnp.stack(rewards), jnp.stack(dones)
    jax.block_until_ready(rewards)
    dt = time.time() - t0

    total = args.num_envs * args.steps
    print(f"{total} env-steps in {dt:.2f}s -> {total / dt:,.0f} steps/s "
          f"(includes one-time compilation; see bench.py for steady-state)")
    print(f"mean reward {float(rewards.mean()):+.4f}   "
          f"episode terminations: {int(np.asarray(dones).sum())}")
    print(f"final altitude spread: "
          f"{float(state.obs[:, 15].min()):.0f}..{float(state.obs[:, 15].max()):.0f} ft")


if __name__ == "__main__":
    main()
