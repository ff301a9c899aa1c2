"""Gather formulation shootout for the terrain lookup (XLA, TPU).

Variants at B=4096 over a 1024^2 f32 table:
  3xtake_rand   : three separate flat takes, random indices (current cost model)
  1xtake3B_rand : ONE take of all 3B flat indices
  1xtake3B_pib  : same, PROMISE_IN_BOUNDS (no per-index clamp)
  1xtakeB_pib   : one take of B indices, PROMISE_IN_BOUNDS
  small table   : one take of B from a 64^2 table
  clustered     : one take of 3B indices all within a 32x32 region
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_scan(name, body, carry, steps=500, reps=3):
    @jax.jit
    def run(c):
        return lax.scan(lambda c, _: (body(c), None), c, None, length=steps)[0]
    c = jax.block_until_ready(run(carry))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        c = jax.block_until_ready(run(c))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:14s}: {best/steps*1e6:8.1f} us/step")


def take_pib(table, idx):
    dnums = lax.GatherDimensionNumbers(offset_dims=(), collapsed_slice_dims=(0,),
                                       start_index_map=(0,))
    return lax.gather(table, idx[:, None], dnums, slice_sizes=(1,),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def main():
    B = 4096
    N = 1024 * 1024
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (N,), jnp.float32)
    small = jax.random.uniform(key, (64 * 64,), jnp.float32)

    idxB = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, N - 2048)
    idx3B = jax.random.randint(jax.random.fold_in(key, 2), (3 * B,), 0, N - 2048)
    idx_cl = (jax.random.randint(jax.random.fold_in(key, 3), (3 * B,), 0, 1024)
              + N // 2)
    idx_small = jax.random.randint(jax.random.fold_in(key, 4), (B,), 0, 64 * 64 - 8)

    def step(idx, tbl, n):
        def body(c):
            i = (c + 1) % n
            h = tbl[i]
            return i + h.astype(jnp.int32) % 2
        return body

    def mk(idx, tbl, fn):
        def body(c):
            v = fn(tbl, c)
            return (c + v.astype(jnp.int32) % 2 + 1) % (tbl.shape[0] - 2048)
        return body

    timed_scan("3xtakeB_rand", mk(idxB, table, lambda t, c: t[c] + t[c + 1] + t[c + 2048]), idxB)
    timed_scan("1xtake3B_rand", mk(idx3B, table, lambda t, c: t[c]), idx3B)
    timed_scan("1xtake3B_pib", mk(idx3B, table, take_pib), idx3B)
    timed_scan("1xtakeB_pib", mk(idxB, table, take_pib), idxB)
    timed_scan("1xtakeB_small", mk(idx_small, small, take_pib), idx_small)
    timed_scan("1xtake3B_clust", mk(idx_cl, table, take_pib), idx_cl)


if __name__ == "__main__":
    main()
