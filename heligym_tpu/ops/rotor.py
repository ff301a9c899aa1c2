"""Main- and tail-rotor force/moment terms with inflow and flapping dynamics.

Parity targets:
  main rotor — /root/reference/heligym/envs/dynamics/helicopter_dynamics.py:203-270
  tail rotor — helicopter_dynamics.py:272-300

Branch sites converted to `jnp.where`:
  * the wake function hard step at VTRANS (line 249) — both sides finite,
    so a plain where is exact;
  * CT clamp (line 241) -> jnp.maximum.
sqrt arguments are sums of squares, so the always-evaluated branch is NaN-safe.

All vectors are 3-tuples of (batched) scalars: pure elementwise VPU math,
batch-polymorphic, Pallas-kernel-legal. Params are static Python floats folded
into the compiled graph.
"""
import math

import jax.numpy as jnp


def main_rotor(p, rho, coll, lon, lat, b0, b1, uvw_air, pqr, vi_mr):
    """Returns (force3, moment3, power, b0_dot, b1_dot, vi_mr_dot, psi_mr_dot).
    `uvw_air`/`pqr` are 3-tuples; forces/moments are 3-tuples."""
    MR, HELI = p.MR, p.HELI
    ua, va, wa = uvw_air

    # Flapping coupling coefficients (lines 208-219).
    GAM_OM16 = rho * MR.GAM_OM16_DRO
    KC = (0.75 * MR.OMEGA * MR.E / MR.R / GAM_OM16) + MR.K1
    ITB2_OM = MR.OMEGA / (1.0 + (MR.OMEGA / GAM_OM16) ** 2)
    ITB = ITB2_OM * MR.OMEGA / GAM_OM16
    DL_DB1 = MR.DL_DB1
    DL_DA1 = rho * MR.DL_DA1_DRO

    # Blade-equivalent axial flow and quasi-steady thrust (lines 222-229).
    v_adv_2 = ua * ua + va * va
    wr = wa + (b0 - MR.IS) * ua - b1 * va
    wb = (wr + 0.66667 * MR.V_TIP * (coll + 0.75 * MR.TWST)
          + v_adv_2 / MR.V_TIP * (coll + 0.5 * MR.TWST))
    thrust = (wb - vi_mr) * (rho * MR.COEF_TH)
    vi_mr_dot = 0.75 * math.pi / MR.R * (
        thrust / (2.0 * math.pi * rho * MR.R * MR.R)
        - vi_mr * jnp.sqrt(v_adv_2 + (wr - vi_mr) ** 2))

    # Induced + profile power -> torque (lines 231-237).
    induced_power = thrust * (vi_mr - wr)
    profile_power = 0.5 * rho * (MR.FR / 4.0) * MR.V_TIP * (
        MR.V_TIP * MR.V_TIP + 3.0 * v_adv_2)
    power = induced_power + profile_power
    torque = power / MR.OMEGA

    # Thrust-coefficient dihedral terms (lines 239-245).
    CT = thrust / (rho * math.pi * MR.R * MR.R * MR.V_TIP * MR.V_TIP)
    CT = jnp.maximum(CT, 0.0)
    DB1DV = 2.0 / MR.V_TIP * (8.0 * CT / MR.A_SIGMA + jnp.sqrt(0.5 * CT))
    DA1DU = -DB1DV

    # TPP (flapping) dynamics with the wake step at VTRANS (lines 248-254).
    wake_fn = jnp.where(jnp.abs(ua) > HELI.VTRANS, 1.0, 0.0)
    a_sum = b1 - lat + KC * b0 + DB1DV * va * (1.0 + wake_fn)
    b_sum = b0 + lon - KC * b1 + DA1DU * ua * (1.0 + 2.0 * wake_fn)
    b0_dot = -ITB * b_sum - ITB2_OM * a_sum - pqr[1]
    b1_dot = -ITB * a_sum + ITB2_OM * b_sum - pqr[0]

    psi_mr_dot = jnp.full_like(vi_mr, MR.OMEGA)

    # Force/moment composition incl. hub stiffness moments (lines 260-269).
    X = -thrust * (b0 - MR.IS)
    Y = thrust * b1
    Z = -thrust
    L = Y * MR.H + DL_DB1 * b1 + DL_DA1 * (b0 + lon - MR.K1 * b1)
    M = Z * MR.D - X * MR.H + DL_DB1 * b0 + DL_DA1 * (-b1 + lat - MR.K1 * b0)
    N = torque
    return (X, Y, Z), (L, M, N), power, b0_dot, b1_dot, vi_mr_dot, psi_mr_dot


def tail_rotor(p, rho, pedal, uvw_air, pqr, vi_tr):
    """Returns (force3, moment3, power, vi_tr_dot, psi_tr_dot)."""
    TR = p.TR
    ua, va, wa = uvw_air
    v_adv_2 = (wa + pqr[1] * TR.D) ** 2 + ua ** 2
    vr = -(va - pqr[2] * TR.D + pqr[0] * TR.H)
    vb = (vr + 0.66667 * TR.V_TIP * (pedal + 0.75 * TR.TWST)
          + v_adv_2 / TR.V_TIP * (pedal + 0.5 * TR.TWST))

    thrust = (vb - vi_tr) * rho * TR.COEF_TH
    vi_tr_dot = 0.75 * math.pi / TR.R * (
        thrust / (2.0 * math.pi * rho * TR.R ** 2)
        - vi_tr * jnp.sqrt(v_adv_2 + (vr - vi_tr) ** 2))
    # Inflow dynamics deliberately slowed 2x for numerical stability, matching
    # the reference (line 285).
    vi_tr_dot = vi_tr_dot * 0.5

    psi_tr_dot = jnp.full_like(vi_tr, TR.OMEGA)
    power = thrust * (vi_tr - vr)

    Y = thrust
    L = Y * TR.H
    N = -Y * TR.D
    zero = jnp.zeros_like(Y)
    return (zero, Y, zero), (L, zero, N), power, vi_tr_dot, psi_tr_dot
