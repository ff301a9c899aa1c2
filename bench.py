#!/usr/bin/env python
"""Benchmark: aggregate env-steps/s at 4096 lockstep envs on the local devices.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's best published single-env throughput of 500 env
steps/s (README.md:62-68, BASELINE.md) — dynamics in Python on an i7-8700K.

The measured program is the full production step: Dryden turbulence with
on-device RNG, helicopter RK4, hover reward, termination and auto-reset, all
inside one scanned jitted rollout with zero host round-trips. By default the
fused Pallas path runs (the whole step physics in one Mosaic kernel,
ops/pallas/fused_step.py); `--unfused` benchmarks the plain XLA path.
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
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument("--flat-terrain", action="store_true")
    ap.add_argument("--unfused", action="store_true")
    ap.add_argument("--block-envs", type=int, default=None)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()

    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import HoverTask
    from heligym_tpu.envs.vector import _broadcast_and_fold, auto_reset
    from heligym_tpu.ops.pallas import build_fused_rollout

    env = HeliEnv.build("aw109", task=HoverTask(), flat_ground=args.flat_terrain)
    num_envs = args.num_envs
    tr = env.trim_result()
    es1, _ = env.reset_from_trim(tr, jax.random.PRNGKey(0))
    es = _broadcast_and_fold(es1, jax.random.PRNGKey(0), num_envs)
    actions = jnp.tile(jnp.asarray(tr.action), (num_envs, 1))

    # The heightmap rides through the jit boundary as an ARGUMENT — the
    # packed texel table, so the per-step lookup is ONE slice gather
    # (closures / in-loop reshapes re-materialize the map every step;
    # ops/terrain.py docstring).
    hmap = env.terrain.packed

    if args.unfused:
        def chunk(es, actions, hmap):
            def body(es, _):
                new_es, out = jax.vmap(env.step, in_axes=(0, 0, None))(
                    es, actions, hmap)
                return auto_reset(new_es, out)[0], None
            es, _ = jax.lax.scan(body, es, None, length=args.chunk_steps)
            return es
        roll = jax.jit(chunk, donate_argnums=0)

        def run(es):
            return roll(es, actions, hmap)
    else:
        fused = build_fused_rollout(env, num_envs, args.chunk_steps, collect=(),
                                    block_envs=args.block_envs, unroll=args.unroll)
        roll = jax.jit(lambda es, a, hm: fused(es, a, hmap=hm)[0],
                       donate_argnums=0)

        def run(es):
            return roll(es, actions, hmap)

    def sync(es):
        # A device->host scalar fetch: the only sync that provably waits for
        # the whole dispatch chain (block_until_ready on donated arrays has
        # been observed returning early through the remote-TPU tunnel).
        import numpy as np
        assert np.isfinite(float(jnp.asarray(es.heli.z).ravel()[0]))

    es = run(es)               # compile + warmup
    sync(es)

    t0 = time.perf_counter()
    for _ in range(args.chunks):
        es = run(es)
    sync(es)
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
