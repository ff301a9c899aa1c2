"""Per-component cost breakdown of the fused env step at 4096 envs.

Times (via scan-amortized wall clock) each piece of the per-step work:
  kernel   : fused Mosaic physics kernel only
  gather3  : current ground_height (3 element gathers)
  take1    : single flat-index take (per-index cost floor)
  patch22  : one lax.gather of a (2,2) slice per env + in-register selects
  noise    : per-env key split + normal(3)
  resetwhere: the auto-reset where over all state rows
  full     : current build_fused_rollout step
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
    print(f"{name:11s}: {best/steps*1e6:8.1f} us/step")
    return c


def main():
    B = 4096
    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import HoverTask
    from heligym_tpu.envs.vector import _broadcast_and_fold
    from heligym_tpu.ops import terrain as terrain_ops
    from heligym_tpu.ops.pallas.fused_step import _make_step_core

    env = HeliEnv.build("aw109", task=HoverTask())
    tr = env.trim_result()
    es1, _ = env.reset_from_trim(tr, jax.random.PRNGKey(0))
    es = _broadcast_and_fold(es1, jax.random.PRNGKey(0), B)
    hmap = env.terrain.hmap
    H, W = hmap.shape

    # positions spread over the map to make gathers realistically random
    key = jax.random.PRNGKey(1)
    xs = jax.random.uniform(key, (B,), minval=-20000.0, maxval=20000.0)
    ys = jax.random.uniform(jax.random.fold_in(key, 1), (B,),
                            minval=-20000.0, maxval=20000.0)

    # --- gather3: current formulation ---
    def g3(c):
        x, y = c
        h = terrain_ops.ground_height(env.terrain, x, y)
        return (x + h * 1e-9, y + h * 1e-9)
    timed_scan("gather3", g3, (xs, ys))

    # --- take1: single flat take ---
    flat = hmap.reshape(-1)
    def t1(c):
        x, y = c
        xi = jnp.clip(x / 39.0 + H // 2, 0, H - 1).astype(jnp.int32)
        yi = jnp.clip(y / 39.0 + W // 2, 0, W - 1).astype(jnp.int32)
        h = flat[yi * W + xi]
        return (x + h * 1e-9, y + h * 1e-9)
    timed_scan("take1", t1, (xs, ys))

    # --- patch22: one (2,2)-slice gather per env ---
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    def p22(c):
        x, y = c
        x_loc = jnp.clip(x / (env.terrain.ns_max / H) + H // 2, 0.0, float(H - 1))
        y_loc = jnp.clip(y / (env.terrain.ew_max / W) + W // 2, 0.0, float(H - 1))
        xi = jnp.floor(x_loc).astype(jnp.int32)
        yi = jnp.floor(y_loc).astype(jnp.int32)
        sy = jnp.minimum(yi, H - 2)
        sx = jnp.minimum(xi, W - 2)
        starts = jnp.stack([sy, sx], axis=-1)
        patch = lax.gather(hmap, starts, dnums, slice_sizes=(2, 2),
                           mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        p00, p01 = patch[:, 0, 0], patch[:, 0, 1]
        p10, p11 = patch[:, 1, 0], patch[:, 1, 1]
        mid_row = jnp.where(xi > sx, p11, p10)
        mid_row0 = jnp.where(xi > sx, p01, p00)
        middle = jnp.where(yi > sy, mid_row, mid_row0)
        north, east = p01, p10
        h = (middle + (north - middle) * (x_loc - sx)
             + (east - middle) * (y_loc - sy))
        return (x + h * 1e-9, y + h * 1e-9)
    timed_scan("patch22", p22, (xs, ys))

    # --- noise: split + normal ---
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(B))
    def noi(c):
        def draw(k):
            k2, sub = jax.random.split(k)
            return k2, jax.random.normal(sub, (3,), jnp.float32)
        keys, eta = jax.vmap(draw)(c)
        return keys
    timed_scan("noise", noi, keys)

    # --- resetwhere: auto-reset selects over 61 rows ---
    rows = jnp.zeros((61, B), jnp.float32)
    init_rows = jnp.ones((61, B), jnp.float32)
    def rw(c):
        mask = c[0] > 0.5
        out = jnp.where(mask[None, :], init_rows, c)
        return out + 1e-9
    timed_scan("resetwhere", rw, rows)

    # --- full fused v2 step (kernel + gather + scan glue) ---
    pack, unpack, step_core, epilogue, draw_eta = _make_step_core(
        env, B, None, None, True)
    act = jnp.tile(jnp.asarray(tr.action), (B, 1)).T
    eta = jnp.zeros((3, B), jnp.float32)
    carry0, init = pack(es)
    def fs(c):
        c2, info = step_core(c, init, act, eta)
        return c2
    timed_scan("full_v2", fs, carry0)

    # --- kernel only (v2, height pinned) ---
    h0 = terrain_ops.ground_height(env.terrain, es.heli.x, es.heli.y)
    def ko(c):
        c2, info = step_core(c, init, act, eta, h=h0)
        return c2
    timed_scan("kernel_v2", ko, carry0)


if __name__ == "__main__":
    main()
