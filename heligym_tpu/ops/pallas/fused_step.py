"""Fused env-step Pallas kernel: the whole per-step physics in ONE TPU kernel.

Why: the XLA-compiled step runs ~72 small fusions over (B,)-shaped vectors; at
4096 envs each lockstep step costs ~250 us of kernel-dispatch latency, not
compute. This kernel collapses Dryden wind + helicopter RK4 + observation +
task reward into a single Mosaic kernel with the env batch on the 128-wide
lane dimension. Only the terrain-height gathers (per-lane dynamic indexing is
unsupported in Mosaic) and the done/auto-reset bookkeeping stay in XLA — a
handful of dispatches per step instead of ~72.

Correctness strategy: the physics is batch-polymorphic by construction (fully
scalarized state, ops/state.py), so the kernel body calls the EXACT functions
that pass the golden reference tests (`HeliEnv.step_physics`) on row views of
the packed state — no vmap, no layout changes, no reimplementation. A
consistency test asserts fused == unfused within float-fusion tolerance.

Data layout: all kernel I/O is (rows, B) float32 — components on sublanes,
envs on lanes: heli rows 18 (HELI_STATE_FIELDS order), wind rows 5, obs rows
17, eta rows 3, action rows 4, h row 1.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...envs.env import EnvState, HeliEnv
from ...ops import terrain as terrain_ops
from ...ops.state import HeliState, WindState
from ...utils.constants import D2R

LANES = 128


def _nonfin(x):
    return (x != x) | (jnp.abs(x) > jnp.float32(1e30))


def _kernel(env: HeliEnv,
            heli_ref, wind_ref, obs_ref, h_ref, eta_ref, act_ref, tid_ref,
            o_heli, o_wind, o_obs, o_rew, o_succ, o_dotz):
    heli = HeliState.from_rows(heli_ref[:])
    wind = WindState.from_rows(wind_ref[:])
    wind_action = (obs_ref[4], obs_ref[5], obs_ref[6], obs_ref[16])
    eta3 = (eta_ref[0], eta_ref[1], eta_ref[2])
    action4 = (act_ref[0], act_ref[1], act_ref[2], act_ref[3])

    wind_new, _, heli_new, dots, obs_t, reward, success = env.step_physics(
        heli, wind, wind_action, eta3, action4, h_ref[0],
        task_id=tid_ref[0])

    o_heli[:] = heli_new.rows()
    o_wind[:] = wind_new.rows()
    o_obs[:] = jnp.stack(obs_t, axis=0)
    o_rew[0] = reward
    o_succ[0] = success.astype(jnp.float32)
    o_dotz[0] = dots.z


def build_fused_core(env: HeliEnv, num_envs: int, block_envs: Optional[int] = None,
                     interpret: Optional[bool] = None):
    """Returns fused(heli_p, wind_p, obs_p, h, eta, act) -> (heli_p', wind_p',
    obs_p', reward, success, dots_z), all (rows, B) arrays."""
    if num_envs % LANES != 0:
        raise ValueError(f"num_envs must be a multiple of {LANES}")
    blk = block_envs or min(num_envs, 2048)
    if num_envs % blk != 0:
        raise ValueError("num_envs must be divisible by block_envs")
    grid = (num_envs // blk,)
    if interpret is None:
        # Mosaic kernels need a real TPU; interpret on CPU test backends.
        interpret = jax.default_backend() != "tpu"

    def spec(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((18, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((5, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((17, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((1, num_envs), jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_kernel, env),
        grid=grid,
        in_specs=[spec(18), spec(5), spec(17), spec(1), spec(3), spec(4),
                  spec(1)],
        out_specs=(spec(18), spec(5), spec(17), spec(1), spec(1), spec(1)),
        out_shape=out_shapes,
        interpret=interpret,
    )


def _make_step_core(env: HeliEnv, num_envs: int, block_envs, interpret):
    """Shared per-step machinery: fused kernel + terrain gather + termination
    + auto-reset over packed (rows, B) carries. Returns (pack, unpack, step).
    carry = (heli_p, wind_p, obs_p, h, steps, succ, keys)."""
    fused = build_fused_core(env, num_envs, block_envs, interpret)
    terrain = env.terrain
    p = env.params
    eta_scale = (1.0 / env.dt) ** 0.5
    succ_need = env.success_steps_required
    time_up_steps = env.time_up_steps

    def pack(es: EnvState):
        init = {
            "heli": es.init.heli.rows(),
            "wind": es.init.wind.rows(),
            "obs": es.init.obs.T,
            "h": terrain_ops.ground_height(terrain, es.init.heli.x,
                                           es.init.heli.y),
        }
        h0 = terrain_ops.ground_height(terrain, es.heli.x, es.heli.y)
        init["task_id"] = jnp.broadcast_to(es.task_id, es.steps.shape)[None]
        carry = (es.heli.rows(), es.wind.rows(), es.obs.T, h0,
                 es.steps, es.successed_steps, es.key)
        return carry, init

    def unpack(es: EnvState, carry) -> EnvState:
        heli_p, wind_p, obs_p, h, steps_c, succ_c, keys = carry
        return es.replace(heli=HeliState.from_rows(heli_p),
                          wind=WindState.from_rows(wind_p),
                          obs=obs_p.T, steps=steps_c,
                          successed_steps=succ_c, key=keys)

    def step(carry, init, act_rows, auto_reset=True):
        """One env step over the packed carry. `act_rows` is (4, B).
        Returns (carry', info) with info rows already unpacked to (B,)."""
        heli_p, wind_p, obs_p, h, steps, succ, keys = carry

        def draw(k):
            k2, sub = jax.random.split(k)
            return k2, jax.random.normal(sub, (3,), jnp.float32) * eta_scale
        keys, eta = jax.vmap(draw)(keys)

        heli_p, wind_p, obs_p, rew, succ_step, dotz = fused(
            heli_p, wind_p, obs_p, h[None], eta.T, act_rows,
            init["task_id"])
        rew, succ_step, dotz = rew[0], succ_step[0], dotz[0]

        hx, hy, hz = heli_p[15], heli_p[16], heli_p[17]
        h_new = terrain_ops.ground_height(terrain, hx, hy)

        # termination (helicopter.py:226-240) on packed rows
        touch = h_new + p.HELI.WL_CG / 12.0
        cond1 = (-hz) - touch < 0.0
        cond2 = dotz > p.MR.V_TIP * 0.05
        cond3 = heli_p[12] > 60.0 * D2R
        cond4 = heli_p[13] > 60.0 * D2R
        cond5 = ((jnp.abs(hx) > p.ENV.NS_MAX / 2.0)
                 | (jnp.abs(hy) > p.ENV.EW_MAX / 2.0)
                 | ((-hz) > touch + 10000.0))
        failed = (cond1 & (cond2 | cond3 | cond4)) | cond5
        # NaN/inf failsafe, matching HeliEnv.step (see env.py note)
        bad = (_nonfin(rew) | _nonfin(hz) | _nonfin(heli_p[6]))
        failed = failed | bad
        successed = succ >= succ_need     # pre-increment, like HeliEnv.step
        steps = steps + 1
        time_up = steps >= time_up_steps
        done = failed | successed
        succ = succ + succ_step.astype(jnp.int32)

        if auto_reset:
            ended = done | time_up
            mask = ended[None, :]
            heli_p = jnp.where(mask, init["heli"], heli_p)
            wind_p = jnp.where(mask, init["wind"], wind_p)
            obs_p = jnp.where(mask, init["obs"], obs_p)
            h = jnp.where(ended, init["h"], h_new)
            steps = jnp.where(ended, 0, steps)
            succ = jnp.where(ended, 0, succ)
        else:
            h = h_new

        info = {"reward": rew, "done": done, "truncated": time_up,
                "failed": failed, "obs_p": obs_p}
        return (heli_p, wind_p, obs_p, h, steps, succ, keys), info

    return pack, unpack, step


def build_fused_rollout(env: HeliEnv, num_envs: int, steps: int,
                        block_envs: Optional[int] = None,
                        collect: Tuple[str, ...] = ("reward", "done"),
                        auto_reset: bool = True,
                        interpret: Optional[bool] = None):
    """Jittable fused rollout: f(es, actions) -> (es', outputs dict).

    `actions`: (steps, num_envs, 4) or (num_envs, 4) held constant.
    The Dryden noise is drawn with the same per-env key split sequence as
    `HeliEnv.step`, so fused and unfused rollouts see identical noise.
    """
    pack, unpack, step_core = _make_step_core(env, num_envs, block_envs, interpret)

    def rollout(es: EnvState, actions):
        carry0, init = pack(es)
        act_seq = actions if actions.ndim == 3 else None
        act_const = actions.T if actions.ndim == 2 else None

        def body(carry, t):
            act = act_const if act_seq is None else act_seq[t].T
            carry, info = step_core(carry, init, act, auto_reset)
            outs = {}
            if "reward" in collect:
                outs["reward"] = info["reward"]
            if "done" in collect:
                outs["done"] = info["done"]
                outs["truncated"] = info["truncated"]
            if "obs" in collect:
                # post-auto-reset, matching the vector layer's convention
                outs["obs"] = info["obs_p"].T
            return carry, outs

        carry, outs = jax.lax.scan(body, carry0, jnp.arange(steps))
        return unpack(es, carry), outs

    return rollout


def build_fused_policy_rollout(env: HeliEnv, num_envs: int, steps: int,
                               policy_fn,
                               block_envs: Optional[int] = None,
                               auto_reset: bool = True,
                               interpret: Optional[bool] = None):
    """Fused rollout driven by a policy in the loop (the RL collection path):
    per step, `policy_fn(policy_params, obs (B, 17), key) -> (actions (B, 4)
    in [-1, 1], aux dict)` runs in XLA (matmuls on the MXU), then the physics
    runs in the fused kernel. Returns f(es, policy_params, key) ->
    (es', traj dict) with per-step obs/reward/done + the policy aux stacked
    over time."""
    pack, unpack, step_core = _make_step_core(env, num_envs, block_envs, interpret)

    def rollout(es: EnvState, policy_params, key):
        carry0, init = pack(es)

        def body(carry, key_t):
            env_carry = carry
            obs = env_carry[2].T                    # (B, 17) pre-step obs
            actions, aux = policy_fn(policy_params, obs, key_t)
            env_carry, info = step_core(env_carry, init, actions.T, auto_reset)
            outs = {"obs": obs, "action": actions, "reward": info["reward"],
                    "done": info["done"] | info["truncated"], **aux}
            return env_carry, outs

        keys = jax.random.split(key, steps)
        carry, traj = jax.lax.scan(body, carry0, keys)
        return unpack(es, carry), traj

    return rollout
