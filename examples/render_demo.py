#!/usr/bin/env python
"""Render a short hover trajectory to an animated GIF with the native
C++ software rasterizer (fully headless — no GPU, no display).

    python examples/render_demo.py [--out hover.gif] [--steps 100]
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from heligym_tpu.envs import HeliEnv
from heligym_tpu.envs.tasks import HoverTask
from heligym_tpu.render import get_renderer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="hover.gif")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--every", type=int, default=4)
    ap.add_argument("--size", type=int, default=480)
    args = ap.parse_args()

    env = HeliEnv.build("aw109", task=HoverTask())
    tr = env.trim_result()
    es, _ = env.reset_from_trim(tr, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    renderer = get_renderer(env)

    frames = []
    action = jnp.asarray(tr.action)
    for t in range(args.steps):
        es, out = step(es, action)
        if t % args.every == 0:
            frames.append(np.asarray(renderer.render(es)))
    renderer.close()

    import imageio.v2 as imageio
    imageio.mimsave(args.out, frames, duration=0.08, loop=0)
    print(f"wrote {args.out}: {len(frames)} frames {frames[0].shape}")


if __name__ == "__main__":
    main()
