#!/usr/bin/env python
"""Batch-size throughput sweep over both execution paths.

    python benchmarks/sweep.py [--out benchmarks/results.json]

Writes one JSON record per (path, num_envs) with steady-state env-steps/s.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure(env, tr, num_envs, steps, reps, fused):
    from heligym_tpu.envs.vector import _broadcast_and_fold, auto_reset
    from heligym_tpu.ops.pallas import build_fused_rollout

    es1, _ = env.reset_from_trim(tr, jax.random.PRNGKey(0))
    es = _broadcast_and_fold(es1, jax.random.PRNGKey(0), num_envs)
    actions = jnp.tile(jnp.asarray(tr.action), (num_envs, 1))

    if fused:
        roll = jax.jit(build_fused_rollout(env, num_envs, steps, collect=()),
                       donate_argnums=0)
        run = lambda es: roll(es, actions)[0]
    else:
        def chunk(es, actions):
            def body(es, _):
                new_es, out = jax.vmap(env.step)(es, actions)
                return auto_reset(new_es, out)[0], None
            return jax.lax.scan(body, es, None, length=steps)[0]
        roll = jax.jit(chunk, donate_argnums=0)
        run = lambda es: roll(es, actions)

    es = run(es)
    jax.block_until_ready(es)
    t0 = time.perf_counter()
    for _ in range(reps):
        es = run(es)
    jax.block_until_ready(es)
    dt = time.perf_counter() - t0
    return num_envs * steps * reps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import HoverTask

    env = HeliEnv.build("aw109", task=HoverTask())
    tr = env.trim_result()
    records = []
    for fused in (True, False):
        for n in (1024, 4096, 8192, 16384):
            try:
                sps = measure(env, tr, n, args.steps, args.reps, fused)
                rec = {"path": "fused" if fused else "xla", "num_envs": n,
                       "env_steps_per_sec": round(sps, 1),
                       "device": str(jax.devices()[0])}
                records.append(rec)
                print(json.dumps(rec), flush=True)
            except Exception as e:
                print(json.dumps({"path": "fused" if fused else "xla",
                                  "num_envs": n, "error": str(e)[:200]}),
                      flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
