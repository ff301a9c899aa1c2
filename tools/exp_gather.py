"""Experiment: Mosaic tpu.dynamic_gather support/perf for in-kernel terrain lookup.

Tests take_along_axis (lax.gather) inside a Pallas TPU kernel:
  A. axis-0 gather (per-lane select along sublanes), operand (S, L)
  B. axis-1 gather (per-sublane select along lanes), operand (S, L)
at several sizes, checking correctness vs numpy and rough timing.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_axis0_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def gather_axis1_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def build(kernel, S, L):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def trial(name, kernel, S, L, axis):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((S, L)).astype(np.float32)
    idx = rng.integers(0, S if axis == 0 else L, size=(S, L)).astype(np.int32)
    try:
        fn = jax.jit(build(kernel, S, L))
        out = np.asarray(jax.block_until_ready(fn(x, idx)))
        want = np.take_along_axis(x, idx, axis=axis)
        ok = np.array_equal(out, want)
        # timing: loop the kernel via scan to amortize dispatch
        def many(x, idx):
            def body(c, _):
                y = fn(c, idx)
                return y, ()
            y, _ = jax.lax.scan(body, x, None, length=100)
            return y
        manyj = jax.jit(many)
        r = jax.block_until_ready(manyj(x, idx))
        t0 = time.perf_counter()
        r = jax.block_until_ready(manyj(x, idx))
        dt = (time.perf_counter() - t0) / 100
        print(f"{name} S={S} L={L}: correct={ok}  {dt*1e6:.1f} us/call")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name} S={S} L={L}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for S, L in [(8, 128), (64, 128), (64, 1024), (256, 1024), (1024, 1024)]:
        trial("axis0", gather_axis0_kernel, S, L, 0)
    for S, L in [(8, 128), (8, 1024), (64, 1024), (1024, 1024)]:
        trial("axis1", gather_axis1_kernel, S, L, 1)
