"""Fused env-step Pallas kernel: the whole per-step env logic in ONE TPU kernel.

Why: the XLA-compiled step runs ~72 small fusions over (B,)-shaped vectors; at
4096 envs each lockstep step costs more dispatch latency than compute. This
kernel collapses Dryden wind + helicopter RK4 + observation + task reward +
termination bookkeeping + auto-reset into a single Mosaic kernel; the ONLY
per-step XLA work left is the terrain-height gather (per-lane dynamic gather
from a 1024^2 map is unsupported in Mosaic) and the `lax.scan` glue.

Correctness strategy: the physics is batch-polymorphic by construction (fully
scalarized state, ops/state.py), so the kernel body calls the EXACT functions
that pass the golden reference tests (`HeliEnv.step_physics`) on row views of
the packed state — no vmap, no layout changes, no reimplementation. A
consistency test replays identical injected noise through the fused and
unfused paths and asserts agreement.

Pipelining design (v2): termination of transition t needs the terrain height
under the *post-step* position (reference helicopter.py:226-234), which is an
XLA gather. Instead of bouncing back to XLA for flag math + auto-reset every
step (measured ~110 us/step of the ~250 us total), the kernel at iteration
t+1 receives the freshly gathered height plus the height-independent partial
flags it emitted at iteration t, combines them into done/truncated, applies
the auto-reset select in-VMEM, and then runs step t+1's physics. Flag/obs
series therefore come out of the scan shifted by one step; a one-time XLA
epilogue computes the final transition's flags and the final committed state.

Noise design (v2): the Dryden white noise for a whole rollout is drawn in ONE
batched `jax.random.normal` from per-env subkeys before the scan (per-step
split+normal measured ~60 us/step; pre-generated it amortizes to ~nothing)
and fed through scan xs. Each env's stream is a function of its own carried
key only, so trajectories remain invariant to device count and sharding
layout (up to compiler FMA contraction). The stream differs from the unfused
path's per-step split (parity tests inject identical noise, eta_mode="inject").

I/O design (v2.1): every Mosaic BlockSpec is a separate DMA stream with
per-block setup cost — 19 small refs measurably slowed the kernel. All
per-step data is therefore packed into ONE carried (75, B) f32 block (exact
small-int counters ride as f32 rows) plus one constant init block in, and one
carry block plus one (22, B) collect block out. The XLA glue writes the
gather/noise/action rows into the carry block with a single static-slice
update per step.

Block row layout (envs on lanes, components on sublanes):
  carry block (75): 0-17 heli (HELI_STATE_FIELDS order) | 18-22 wind |
    23-39 obs | 40-57 dots | 58-60 wind_ned | 61-64 partial flags
    (any, rest, succ, time_up) | 65 h_pend | 66-68 eta | 69-72 action |
    73 steps | 74 successed_steps
  init block (63): 0-60 reset-target state | 61 h | 62 task_id
  collect block (22): 0 reward | 1 done_prev | 2 trunc_prev | 3 failed_prev |
    4-20 obs_eff (post-reset obs of the previous transition) |
    21 succ_step (THIS transition's in-tolerance flag, aligned with reward —
    the learner's optional success-bonus shaping reads it)
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

# carry-block row offsets
_H0, _W0, _O0, _D0, _N0 = 0, 18, 23, 40, 58     # state pieces
_SROWS = 61                                      # state rows
_PF0, _HP, _ETA0, _ACT0, _STEPS, _SUCC = 61, 65, 66, 69, 73, 74
_CROWS = 75
# init-block rows
_IH, _ITID, _IROWS = 61, 62, 63
# collect-block rows
_CREW, _CDONE, _CTRUNC, _CFAIL, _COBS0, _CSUCC, _XROWS = 0, 1, 2, 3, 4, 21, 22
# partial-flag meanings (rows _PF0+i)
_PF_ANY, _PF_REST, _PF_SUCC, _PF_TIMEUP = 0, 1, 2, 3


def _nonfin(x):
    return (x != x) | (jnp.abs(x) > jnp.float32(1e30))


def _state_rows(heli: HeliState, wind: WindState, obs_rows, dots: HeliState,
                wnd_rows) -> jnp.ndarray:
    """(61, B) state block from components (obs/wnd already (rows, B))."""
    return jnp.concatenate(
        [heli.rows(), wind.rows(), obs_rows, dots.rows(), wnd_rows], axis=0)


def _flags_from_partials(env: HeliEnv, pf, z_row, h):
    """done/truncated/failed for the pending transition, from the kernel's
    height-independent partials + the gathered height at the pending position
    (helicopter.py:226-240 split across the kernel boundary)."""
    p = env.params
    touch = h + p.HELI.WL_CG / 12.0
    cond1 = (-z_row) - touch < 0.0
    high = (-z_row) > touch + 10000.0
    failed = (cond1 & (pf[_PF_ANY] != 0)) | (pf[_PF_REST] != 0) | high
    done = failed | (pf[_PF_SUCC] != 0)
    truncated = pf[_PF_TIMEUP] != 0
    return done, truncated, failed


def _kernel(env: HeliEnv, auto_reset: bool, c_ref, init_ref, o_c, o_x):
    p = env.params
    c = c_ref[:]
    init = init_ref[:]
    h_pend = c[_HP]
    steps0 = c[_STEPS]
    succ0 = c[_SUCC]
    fz = lambda b: b.astype(jnp.float32)

    # --- finish transition t-1: flags + auto-reset select ------------------
    done_prev, trunc_prev, failed_prev = _flags_from_partials(
        env, c[_PF0:_HP], c[_H0 + 17], h_pend)

    if auto_reset:
        ended = done_prev | trunc_prev
        state = jnp.where(ended[None, :], init[:_SROWS], c[:_SROWS])
        h_eff = jnp.where(ended, init[_IH], h_pend)
        steps0 = jnp.where(ended, 0.0, steps0)
        succ0 = jnp.where(ended, 0.0, succ0)
    else:
        state = c[:_SROWS]
        h_eff = h_pend

    heli = HeliState.from_rows(state[_H0:_W0])
    wind = WindState.from_rows(state[_W0:_O0])
    obs_eff = state[_O0:_D0]

    # --- step t physics ----------------------------------------------------
    wind_action = (obs_eff[4], obs_eff[5], obs_eff[6], obs_eff[16])
    eta3 = (c[_ETA0], c[_ETA0 + 1], c[_ETA0 + 2])
    action4 = (c[_ACT0], c[_ACT0 + 1], c[_ACT0 + 2], c[_ACT0 + 3])
    wind_new, wnd_ned, heli_new, dots, obs_t, reward, succ_step = (
        env.step_physics(heli, wind, wind_action, eta3, action4, h_eff,
                         task_id=init[_ITID].astype(jnp.int32)))

    # --- counters (pre-increment success semantics, helicopter.py:201-205).
    # steps/succ ride as f32 rows; values stay far below 2^24 so the
    # arithmetic is exact.
    f_succ = succ0 >= float(env.success_steps_required)
    steps1 = steps0 + 1.0
    time_up = steps1 >= float(env.time_up_steps)
    succ1 = succ0 + fz(succ_step)

    # --- height-independent partial flags for transition t ------------------
    pf_any = ((dots.z > p.MR.V_TIP * 0.05)
              | (heli_new.phi > 60.0 * D2R)
              | (heli_new.theta > 60.0 * D2R))
    bad = (_nonfin(reward) | _nonfin(heli_new.z) | _nonfin(heli_new.u))
    pf_rest = ((jnp.abs(heli_new.x) > p.ENV.NS_MAX / 2.0)
               | (jnp.abs(heli_new.y) > p.ENV.EW_MAX / 2.0)
               | bad)

    obs_rows = jnp.stack(obs_t, axis=0)
    blk = c.shape[1]
    o_c[:] = jnp.concatenate([
        heli_new.rows(), wind_new.rows(), obs_rows, dots.rows(),
        jnp.stack(wnd_ned, axis=0),
        jnp.stack([fz(pf_any), fz(pf_rest), fz(f_succ), fz(time_up)], axis=0),
        jnp.zeros((_STEPS - _HP, blk), jnp.float32),   # h/eta/act: XLA-written
        steps1[None], succ1[None],
    ], axis=0)
    o_x[:] = jnp.concatenate([
        reward[None], fz(done_prev)[None], fz(trunc_prev)[None],
        fz(failed_prev)[None], obs_eff, fz(succ_step)[None],
    ], axis=0)


def build_fused_core(env: HeliEnv, num_envs: int, block_envs: Optional[int] = None,
                     interpret: Optional[bool] = None, auto_reset: bool = True):
    """Returns fused(carry_block (75,B), init_block (63,B)) ->
    (carry_block', collect_block (22,B))."""
    if num_envs % LANES != 0:
        raise ValueError(f"num_envs must be a multiple of {LANES}")
    blk = block_envs or min(num_envs, 2048)
    if num_envs % blk != 0:
        raise ValueError("num_envs must be divisible by block_envs")
    grid = (num_envs // blk,)
    if interpret is None:
        # Mosaic kernels need a real TPU; interpret on CPU test backends.
        interpret = jax.default_backend() != "tpu"
        if interpret:
            import warnings
            warnings.warn(
                "fused Pallas kernel running in INTERPRET mode on backend "
                f"'{jax.default_backend()}' — orders of magnitude slower than "
                "a compiled TPU kernel; fine for tests, wrong for production",
                stacklevel=3)

    def spec(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, env, auto_reset),
        grid=grid,
        in_specs=[spec(_CROWS), spec(_IROWS)],
        out_specs=(spec(_CROWS), spec(_XROWS)),
        out_shape=(jax.ShapeDtypeStruct((_CROWS, num_envs), jnp.float32),
                   jax.ShapeDtypeStruct((_XROWS, num_envs), jnp.float32)),
        interpret=interpret,
    )


def _pending_height(env: HeliEnv, c, hmap):
    """Terrain height under the pending position (carry rows 15/16).
    `hmap` must be an argument-plumbed device array: a closed-over constant
    map costs ~100 us/scan-iteration on TPU (ops/terrain.py docstring)."""
    return terrain_ops.ground_height(env.terrain, c[_H0 + 15], c[_H0 + 16],
                                     hmap=hmap)


def _make_step_core(env: HeliEnv, num_envs: int, block_envs, interpret,
                    auto_reset: bool):
    """Shared machinery around the kernel. Returns (pack, unpack, step,
    epilogue, draw_eta). carry = one (75, B) f32 block; init = (63, B)."""
    fused = build_fused_core(env, num_envs, block_envs, interpret, auto_reset)

    def pack(es: EnvState, hmap):
        state = _state_rows(es.heli, es.wind, es.obs.T, es.dots, es.wind_ned.T)
        zeros = jnp.zeros((_STEPS - _PF0, num_envs), jnp.float32)
        # zero partials make iteration 0's flag/reset phase a no-op for any
        # sane (non-failed) entering state — the carry is committed state
        carry = jnp.concatenate([
            state, zeros,
            es.steps.astype(jnp.float32)[None],
            es.successed_steps.astype(jnp.float32)[None]], axis=0)
        init = jnp.concatenate([
            _state_rows(es.init.heli, es.init.wind, es.init.obs.T,
                        es.init.dots, es.init.wind_ned.T),
            terrain_ops.ground_height(env.terrain, es.init.heli.x,
                                      es.init.heli.y, hmap=hmap)[None],
            jnp.broadcast_to(es.task_id, es.steps.shape).astype(
                jnp.float32)[None]], axis=0)
        return carry, init

    def unpack(es: EnvState, c) -> EnvState:
        return es.replace(
            heli=HeliState.from_rows(c[_H0:_W0]),
            wind=WindState.from_rows(c[_W0:_O0]),
            obs=c[_O0:_D0].T,
            dots=HeliState.from_rows(c[_D0:_N0]),
            wind_ned=c[_N0:_SROWS].T,
            steps=c[_STEPS].astype(jnp.int32),
            successed_steps=c[_SUCC].astype(jnp.int32))

    def step(c, init, act_rows, eta_rows, hmap, h=None):
        """One env step. `act_rows` (4,B), `eta_rows` (3,B) pre-scaled by
        1/sqrt(dt); `h` (B,) lets a caller reuse an already-gathered pending
        height. Emits reward for THIS transition and flags/obs for the
        PREVIOUS one (see module docstring)."""
        h = _pending_height(env, c, hmap) if h is None else h
        upd = jnp.concatenate([h[None], eta_rows, act_rows], axis=0)
        c = jax.lax.dynamic_update_slice(c, upd, (_HP, 0))
        c, x = fused(c, init)
        info = {"reward": x[_CREW],
                "done_prev": x[_CDONE] != 0, "trunc_prev": x[_CTRUNC] != 0,
                "failed_prev": x[_CFAIL] != 0, "obs_eff": x[_COBS0:_CSUCC],
                "succ_step": x[_CSUCC] != 0,
                "final_obs": c[_O0:_D0]}
        return c, info

    def epilogue(c, init, hmap):
        """Final transition's flags + the final committed carry (XLA, once
        per rollout)."""
        h = _pending_height(env, c, hmap)
        done, trunc, failed = _flags_from_partials(env, c[_PF0:_HP],
                                                   c[_H0 + 17], h)
        if auto_reset:
            ended = done | trunc
            state = jnp.where(ended[None, :], init[:_SROWS], c[:_SROWS])
            counters = jnp.where(ended[None, :], 0.0, c[_STEPS:_CROWS])
            c = jnp.concatenate([state, c[_SROWS:_STEPS], counters], axis=0)
        flags = {"done": done, "truncated": trunc, "failed": failed,
                 "obs_eff": c[_O0:_D0]}
        return c, flags

    def draw_eta(es: EnvState, steps: int):
        """Pre-draw the whole rollout's Dryden noise: one split + one normal
        per env, batched. Returns (new per-env keys, eta (T, 3, B))."""
        def draw(k):
            k2, sub = jax.random.split(k)
            return k2, jax.random.normal(sub, (steps, 3), jnp.float32)
        keys, eta = jax.vmap(draw)(es.key)
        return keys, jnp.moveaxis(eta, 0, -1) * (1.0 / env.dt) ** 0.5

    return pack, unpack, step, epilogue, draw_eta


def _shifted(series, last):
    """Align a flags/obs series emitted one step late: drop the iteration-0
    dummy, append the epilogue's entry for the final transition."""
    return jnp.concatenate([series[1:], last[None]], axis=0)


def build_fused_rollout(env: HeliEnv, num_envs: int, steps: int,
                        block_envs: Optional[int] = None,
                        collect: Tuple[str, ...] = ("reward", "done"),
                        auto_reset: bool = True,
                        interpret: Optional[bool] = None,
                        eta_mode: str = "batch",
                        unroll: int = 4):
    """Jittable fused rollout: f(es, actions[, eta_seq]) -> (es', outputs).

    `actions`: (steps, num_envs, 4) or (num_envs, 4) held constant.
    `eta_mode`: "batch" (default) pre-draws noise from the per-env keys;
    "inject" makes the rollout take an explicit eta_seq (steps, 3, num_envs)
    already scaled by 1/sqrt(dt) — the parity-test seam (the unfused path
    replays the same array through `HeliEnv.step_with_eta`).
    `hmap`: the terrain heightmap. Callers that jit the rollout MUST thread
    it through their jit boundary as an argument — the `terrain.hmap`
    fallback becomes a trace-time constant that costs ~100 us/step on TPU
    (ops/terrain.py docstring).
    """
    pack, unpack, step_core, epilogue, draw_eta = _make_step_core(
        env, num_envs, block_envs, interpret, auto_reset)

    def rollout(es: EnvState, actions, eta_seq=None, hmap=None):
        # normalize ONCE, outside the scan (defaults to the packed texel
        # table — ONE gather/step; ops/terrain.py docstring)
        hmap = terrain_ops.prep_hmap_arg(env.terrain, hmap)
        if eta_mode == "inject":
            if eta_seq is None:
                raise ValueError("eta_mode='inject' needs an eta_seq")
            keys = es.key
        else:
            keys, eta_seq = draw_eta(es, steps)
        carry0, init = pack(es, hmap)
        act_seq = actions if actions.ndim == 3 else None
        act_const = actions.T if actions.ndim == 2 else None

        def body(carry, xs):
            t, eta_t = xs
            act = act_const if act_seq is None else act_seq[t].T
            carry, info = step_core(carry, init, act, eta_t, hmap)
            outs = {}
            if "reward" in collect:
                outs["reward"] = info["reward"]
            if "done" in collect:
                outs["done"] = info["done_prev"]
                outs["truncated"] = info["trunc_prev"]
            if "failed" in collect:
                outs["failed"] = info["failed_prev"]
            if "obs" in collect:
                outs["obs"] = info["obs_eff"]
            return carry, outs

        carry, outs = jax.lax.scan(body, carry0, (jnp.arange(steps), eta_seq),
                                   unroll=unroll)
        carry, flags = epilogue(carry, init, hmap)
        if "done" in collect:
            outs["done"] = _shifted(outs["done"], flags["done"])
            outs["truncated"] = _shifted(outs["truncated"], flags["truncated"])
        if "failed" in collect:
            outs["failed"] = _shifted(outs["failed"], flags["failed"])
        if "obs" in collect:
            # post-auto-reset obs per transition (vector-layer convention)
            outs["obs"] = jnp.moveaxis(
                _shifted(outs["obs"], flags["obs_eff"]), 1, -1)
        es = unpack(es, carry).replace(key=keys)
        return es, outs

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
    (es', traj dict): per-transition obs/action/reward/aux plus
    terminated/truncated/final_obs for truncation-aware GAE."""
    pack, unpack, step_core, epilogue, draw_eta = _make_step_core(
        env, num_envs, block_envs, interpret, auto_reset)

    def rollout(es: EnvState, policy_params, key, hmap=None):
        hmap = terrain_ops.prep_hmap_arg(env.terrain, hmap)
        keys, eta_seq = draw_eta(es, steps)
        carry0, init = pack(es, hmap)

        def body(carry, xs):
            key_t, eta_t = xs
            # the policy must see the post-reset obs, so the flag/reset math
            # for the pending transition is mirrored here in XLA (cheap
            # fusion); the kernel recomputes it internally for the state rows
            h = _pending_height(env, carry, hmap)
            done, trunc, _ = _flags_from_partials(env, carry[_PF0:_HP],
                                                  carry[_H0 + 17], h)
            ended = done | trunc
            obs_rows = jnp.where(ended[None, :], init[_O0:_D0],
                                 carry[_O0:_D0]) if auto_reset else carry[_O0:_D0]
            obs = obs_rows.T                               # (B, 17)
            actions, aux = policy_fn(policy_params, obs, key_t)
            carry, info = step_core(carry, init, actions.T, eta_t, hmap, h=h)
            outs = {"obs": obs, "action": actions, "reward": info["reward"],
                    "terminated": info["done_prev"],
                    "truncated": info["trunc_prev"],
                    "failed": info["failed_prev"],
                    "succ_step": info["succ_step"],
                    "final_obs": info["final_obs"].T, **aux}
            return carry, outs

        step_keys = jax.random.split(key, steps)
        carry, traj = jax.lax.scan(body, carry0, (step_keys, eta_seq))
        carry, flags = epilogue(carry, init, hmap)
        traj["terminated"] = _shifted(traj["terminated"], flags["done"])
        traj["truncated"] = _shifted(traj["truncated"], flags["truncated"])
        traj["failed"] = _shifted(traj["failed"], flags["failed"])
        es = unpack(es, carry).replace(key=keys)
        return es, traj

    return rollout
