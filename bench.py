#!/usr/bin/env python
"""Benchmark: aggregate env-steps/s at 4096 lockstep envs on the local devices.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's best published single-env throughput of 500 env
steps/s (README.md:62-68, BASELINE.md) — dynamics in Python on an i7-8700K.

The measured program is the full production step: Dryden turbulence with
on-device RNG, helicopter RK4, hover reward, termination and auto-reset, all
inside one scanned jitted rollout (no host round-trips inside the timed loop).
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--chunk-steps", type=int, default=500)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--flat-terrain", action="store_true")
    args = ap.parse_args()

    from heligym_tpu.envs import HeliEnv, VectorHeliEnv
    from heligym_tpu.envs.tasks import HoverTask
    from heligym_tpu.envs.vector import auto_reset
    from heligym_tpu.parallel import EnvFarm, make_env_mesh, shard_env_state

    env = HeliEnv.build("aw109", task=HoverTask(), flat_ground=args.flat_terrain)
    mesh = make_env_mesh()
    n_dev = mesh.devices.size
    num_envs = (args.num_envs // n_dev) * n_dev
    farm = EnvFarm.build(env, num_envs, mesh=mesh)

    es, _ = farm.venv.reset(jax.random.PRNGKey(0))
    es = shard_env_state(es, mesh)
    trim_action = jnp.asarray(env.trim_result().action)

    def chunk(es, _):
        def body(es, _):
            acts = jnp.tile(trim_action, (num_envs, 1))
            new_es, out = jax.vmap(env.step)(es, acts)
            new_es, out = auto_reset(new_es, out)
            return new_es, None
        es, _ = jax.lax.scan(body, es, None, length=args.chunk_steps)
        return es, None

    from heligym_tpu.parallel import env_sharding
    sh = env_sharding(mesh)
    roll = jax.jit(lambda es: jax.lax.scan(chunk, es, None, length=1)[0],
                   in_shardings=(sh,), out_shardings=sh, donate_argnums=(0,))

    # compile + warmup
    es = roll(es)
    jax.block_until_ready(es)

    t0 = time.perf_counter()
    for _ in range(args.chunks):
        es = roll(es)
    jax.block_until_ready(es)
    dt = time.perf_counter() - t0

    total = num_envs * args.chunk_steps * args.chunks
    steps_per_sec = total / dt
    print(json.dumps({
        "metric": f"env_steps_per_sec@{num_envs}envs",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / 500.0, 2),
    }))


if __name__ == "__main__":
    main()
