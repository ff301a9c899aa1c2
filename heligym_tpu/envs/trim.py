"""Trim solver: Newton iteration zeroing the normalized state derivatives.

Parity target: /root/reference/heligym/envs/dynamics/helicopter_dynamics.py:491-576.

Two implementations share one residual definition:

* `trim` — host-driven Newton that replicates the reference algorithm step for
  step (same 16 variables and scalings, same central-difference epsilon, same
  backtracking line search including its quirk of discarding an improvement
  found on the final backtrack, lines 532-541). TPU-idiomatic twist: the 32
  perturbed residual evaluations of the Jacobian are ONE vmapped device call
  per iteration instead of 32 sequential ones.

  Deliberate deviation: the reference aborts an unconverged trim after a
  5-second WALL CLOCK (helicopter_dynamics.py:543-544); this solver aborts
  after 200 Newton iterations (`_MAX_NEWTON_ITERS`) instead — an iteration
  cap is deterministic and hardware-independent where a wall clock is not.
  All reference-reachable conditions converge in far fewer iterations either
  way (the golden trim fixtures pin the same fixed points).

* `trim_batched` — fully on-device batched Newton (`lax.while_loop` +
  `jnp.linalg.solve` over a leading batch axis) for vectorized randomized
  resets without host sync. It converges to the same fixed points within
  tolerance but is not bit-identical to the host path.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import eom
from ..ops import terrain as terrain_ops
from ..ops.state import HeliState
from ..utils.constants import EPS

N_VARS = 16
# DELIBERATE DEVIATION: the reference aborts a non-converging trim solve on a
# 5 s WALL-CLOCK timer (helicopter_dynamics.py:543-544); wall-clock inside
# device code is neither reproducible nor jittable, so this build caps Newton
# ITERATIONS instead (same practical effect: the reference does ~10^3+ iters
# in 5 s and a healthy solve needs <30; see CLAUDE.md known deviations).
_MAX_NEWTON_ITERS = 200


@struct.dataclass
class TrimResult:
    state: HeliState
    action: jnp.ndarray   # (4,)
    obs: jnp.ndarray      # (17,)
    dots: HeliState       # derivatives at the trim point (≈ 0 for trimmed vars)


def base_state_from_cond(params, terrain, cond) -> HeliState:
    """Fixed (non-iterated) state fields from the trim condition
    (reference lines 499-505)."""
    s = HeliState.zeros()
    s = s.replace(psi=jnp.float32(cond["yaw"]),
                  psi_mr=jnp.float32(cond["psi_mr"]),
                  psi_tr=jnp.float32(cond["psi_tr"]),
                  x=jnp.float32(cond["xy"][0]),
                  y=jnp.float32(cond["xy"][1]))
    touch = terrain_ops.ground_touching_altitude(params, terrain, s.x, s.y)
    cg_from_bottom = -touch
    s = s.replace(z=cg_from_bottom - np.float32(cond["gr_alt"]))
    return s


def apply_x(params, base: HeliState, x) -> Tuple[HeliState, jnp.ndarray]:
    """Scatter the 16 normalized trim variables into a state + action
    (reference lines 557-565): [vi_mr, vi_tr, betas(2), uvw(3), pqr(3),
    phi, theta, action(4)]."""
    MR, TR = params.MR, params.TR
    state = base.replace(
        vi_mr=x[0] * MR.V_TIP,
        vi_tr=x[1] * TR.V_TIP,
        b0=x[2], b1=x[3],
        u=x[4] * MR.V_TIP, v=x[5] * MR.V_TIP, w=x[6] * MR.V_TIP,
        p=x[7] * MR.OMEGA, q=x[8] * MR.OMEGA, r=x[9] * MR.OMEGA,
        phi=x[10], theta=x[11],
    )
    return state, x[12:16]


def residual_fn(params, terrain, wind_ned, cond):
    """Build the jittable residual y(x): normalized state derivatives
    (reference lines 557-576). The terrain height is sampled once at the base
    state, mirroring the reference's committed-state semantics."""
    base = base_state_from_cond(params, terrain, cond)
    h_ground = terrain_ops.ground_height(terrain, base.x, base.y)

    def residual(x):
        state, action = apply_x(params, base, x)
        dots, _, _ = eom.heli_dynamics(
            params, state, tuple(action[i] for i in range(4)),
            tuple(wind_ned[..., i] for i in range(3)), h_ground)
        return _normalized_dots(params, dots)

    return base, h_ground, residual


def _normalized_dots(params, dots: HeliState) -> jnp.ndarray:
    """16-vector of normalized derivatives, reference order (lines 568-574)."""
    return jnp.stack([
        dots.vi_mr / params.MR.V_TIP,
        dots.vi_tr / params.TR.V_TIP,
        dots.b0, dots.b1,
        dots.u / params.MR.V_TIP, dots.v / params.MR.V_TIP,
        dots.w / params.MR.V_TIP,
        dots.p / params.MR.OMEGA, dots.q / params.MR.OMEGA,
        dots.r / params.MR.OMEGA,
        dots.phi, dots.theta, dots.psi,
        dots.x / params.MR.R, dots.y / params.MR.R, dots.z / params.MR.R,
    ], axis=-1)


def initial_guess(params, cond) -> np.ndarray:
    """Reference lines 509-518."""
    y_target = np.zeros(N_VARS, dtype=np.float32)
    y_target[-4] = cond["yaw_rate"]
    y_target[-3:] = np.array(cond["ned_vel"], dtype=np.float32) / params.MR.R
    uvw0 = np.array(cond["ned_vel"], dtype=np.float32) / params.MR.V_TIP
    x = np.array([0.05, 0.05, 0.0, 0.0,
                  uvw0[-3], uvw0[-2], uvw0[-1],
                  0.0, 0.0, y_target[-4],
                  -0.01, 0.01,
                  0.0, 0.0, 0.0, 0.0], dtype=np.float32)
    return x, y_target


def trim(params, terrain, wind_ned, cond) -> TrimResult:
    """Host-driven Newton trim, algorithmically identical to the reference.

    Jacobian: central differences with eps=1e-4 over all 16 vars, evaluated as
    a single vmapped batch of 32 states on device (lines 525-530).
    Line search: up to 10 halvings, accept first improvement; if none found by
    the last halving the loop aborts (lines 532-541).

    Runs pinned to the host CPU backend: trim is an init-time scalar Newton
    solve with tight host-device coupling — dispatching its many tiny kernels
    to an accelerator would be pure latency (measured ~50x slower via a TPU
    tunnel). The resulting state pytree is transferred to the default device
    once, by the caller's reset.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    terrain_cpu = _cpu_terrain(terrain, cpu)
    with jax.default_device(cpu):
        tr = _trim_on_host(params, terrain_cpu,
                           jax.device_put(wind_ned, cpu), cond)
    import numpy as _np
    amax = float(_np.abs(_np.asarray(tr.action)).max())
    if amax > 1.0:
        import warnings
        warnings.warn(
            f"trim action out of the [-1, 1] control range (max |a|={amax:.2f})"
            f" for cond {cond} — the solution is not flyable. Known cause: "
            f"gr_alt at or below the landing-gear reach "
            f"(~{max(l[2] for l in params.LG.LOC):.1f} ft below the CG) puts "
            "the trim point in ground contact; use a higher start altitude.",
            stacklevel=2)
    return tr


_CPU_TERRAIN_CACHE = {}


def _cpu_terrain(terrain, cpu):
    """CPU-resident copy of the terrain, cached so repeated trims of one env
    reuse the same arrays (and therefore the same compiled residual)."""
    cached = _CPU_TERRAIN_CACHE.get(id(terrain))
    if cached is None:
        cached = dataclasses.replace(
            terrain,
            hmap=jax.device_put(terrain.hmap, cpu),
            normal=jax.device_put(terrain.normal, cpu))
        _CPU_TERRAIN_CACHE[id(terrain)] = cached
    return cached


def _trim_on_host(params, terrain, wind_ned, cond) -> TrimResult:
    base, h_ground, residual = residual_fn(params, terrain, wind_ned, cond)
    res_j = jax.jit(residual)
    res_batch = jax.jit(jax.vmap(residual))

    x, y_target = initial_guess(params, cond)
    y = np.asarray(res_j(jnp.asarray(x)), dtype=np.float32)
    tol = float((y - y_target).T @ (y - y_target))

    iters = 0
    while tol > EPS:
        iters += 1
        if iters > _MAX_NEWTON_ITERS:
            raise RuntimeError("Trim failed to converge; try a better trim condition.")
        # Central-difference Jacobian, one batched device call.
        eye = np.eye(N_VARS, dtype=np.float32) * EPS
        xs = np.concatenate([x[None] + eye, x[None] - eye], axis=0)
        ys = np.asarray(res_batch(jnp.asarray(xs)), dtype=np.float32)
        dydx = (ys[:N_VARS] - ys[N_VARS:]) / (2 * EPS)   # rows: dy/dx_i
        dydx = np.stack(list(dydx), axis=-1)             # (16, 16) like reference
        step_dir = np.linalg.inv(dydx) @ (y - y_target)

        step_size = 1.0
        for j in range(10):
            x_new = x - step_size * step_dir
            y_new = np.asarray(res_j(jnp.asarray(x_new)), dtype=np.float32)
            tol_new = float((y_new - y_target).T @ (y_new - y_target))
            step_size *= 0.5
            if tol_new < tol:
                break
        if j == 9:
            # Reference quirk: aborts without accepting an improvement found
            # on the final halving (line 540).
            break
        x, y, tol = x_new, y_new, tol_new

    state, action = apply_x(params, base, jnp.asarray(x))
    dots, obs_t, _ = jax.jit(
        lambda s, a: eom.heli_dynamics(
            params, s, tuple(a[i] for i in range(4)),
            tuple(wind_ned[..., i] for i in range(3)), h_ground)
    )(state, action)
    return TrimResult(state=state, action=jnp.asarray(action),
                      obs=jnp.stack(obs_t, axis=-1), dots=dots)


def trim_batched(params, terrain, wind_ned, conds, max_iters: int = 50):
    """Fully on-device batched Newton trim.

    `conds` is a dict of batched arrays: yaw, yaw_rate (B,), ned_vel (B, 3),
    gr_alt (B,), xy (B, 2), psi_mr, psi_tr (B,). Returns a TrimResult with a
    leading batch axis. Designed for randomized vectorized resets: no host
    round-trips, `jnp.linalg.solve` on (B, 16, 16) Jacobians, `jacfwd` instead
    of finite differences (exact and cheaper under batching).
    """
    def solve_one(yaw, yaw_rate, ned_vel, gr_alt, xy, psi_mr, psi_tr):
        cond = {"yaw": yaw, "yaw_rate": yaw_rate, "ned_vel": ned_vel,
                "gr_alt": gr_alt, "xy": xy, "psi_mr": psi_mr, "psi_tr": psi_tr}
        # Base state, traced (conds are dynamic here).
        s = HeliState.zeros()
        s = s.replace(psi=yaw, psi_mr=psi_mr, psi_tr=psi_tr, x=xy[0], y=xy[1])
        touch = terrain_ops.ground_touching_altitude(params, terrain, s.x, s.y)
        base = s.replace(z=-touch - gr_alt)
        h_ground = terrain_ops.ground_height(terrain, base.x, base.y)

        def residual(x):
            state, action = apply_x(params, base, x)
            dots, _, _ = eom.heli_dynamics(
                params, state, tuple(action[i] for i in range(4)),
                tuple(wind_ned[..., i] for i in range(3)), h_ground)
            return _normalized_dots(params, dots)

        y_target = jnp.zeros(N_VARS, jnp.float32)
        y_target = y_target.at[-4].set(yaw_rate)
        y_target = y_target.at[-3:].set(ned_vel / params.MR.R)
        uvw0 = ned_vel / params.MR.V_TIP
        x0 = jnp.concatenate([
            jnp.asarray([0.05, 0.05, 0.0, 0.0], jnp.float32), uvw0,
            jnp.asarray([0.0, 0.0], jnp.float32), yaw_rate[None],
            jnp.asarray([-0.01, 0.01, 0.0, 0.0, 0.0, 0.0], jnp.float32)])

        jac = jax.jacfwd(residual)

        def tol_of(x):
            d = residual(x) - y_target
            return jnp.sum(d * d)

        def body(carry):
            x, tol, it = carry
            J = jac(x)
            step_dir = jnp.linalg.solve(J, residual(x) - y_target)
            # Parallel backtracking: evaluate all 10 halvings, take the first
            # improving candidate (equivalent to sequential backtracking).
            scales = 2.0 ** -jnp.arange(10, dtype=jnp.float32)
            cands = x[None] - scales[:, None] * step_dir[None]
            tols = jax.vmap(tol_of)(cands)
            improving = tols < tol
            idx = jnp.argmax(improving)          # first True (or 0 if none)
            any_improve = jnp.any(improving)
            x_new = jnp.where(any_improve, cands[idx], x)
            tol_new = jnp.where(any_improve, tols[idx], -1.0)  # -1 exits loop
            return x_new, tol_new, it + 1

        def cont(carry):
            _, tol, it = carry
            return (tol > EPS) & (it < max_iters)

        x_fin, _, _ = jax.lax.while_loop(cont, body, (x0, tol_of(x0), jnp.int32(0)))
        state, action = apply_x(params, base, x_fin)
        dots, obs_t, _ = eom.heli_dynamics(
            params, state, tuple(action[i] for i in range(4)),
            tuple(wind_ned[..., i] for i in range(3)), h_ground)
        return TrimResult(state=state, action=action,
                          obs=jnp.stack(obs_t, axis=-1), dots=dots)

    return jax.jit(jax.vmap(solve_one))(
        jnp.asarray(conds["yaw"], jnp.float32),
        jnp.asarray(conds["yaw_rate"], jnp.float32),
        jnp.asarray(conds["ned_vel"], jnp.float32),
        jnp.asarray(conds["gr_alt"], jnp.float32),
        jnp.asarray(conds["xy"], jnp.float32),
        jnp.asarray(conds["psi_mr"], jnp.float32),
        jnp.asarray(conds["psi_tr"], jnp.float32))
