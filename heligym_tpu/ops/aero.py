"""Fuselage, empennage and wing aerodynamic force/moment terms.

Parity targets (/root/reference/heligym/envs/dynamics/helicopter_dynamics.py):
  fuselage 302-320, horizontal tail 322-345, vertical tail 347-361, wing 363-383.

Each scalar `if` on state becomes a `jnp.where` evaluated branchlessly; the
stall tests (lines 336, 351, 373), the triangular-downwash window (line 330)
and the wing-disabled short-circuit (line 367, a *static* parameter branch
resolved at trace time) are the branch sites. Divisions whose reference
counterpart can hit 0 are guarded so the untaken where-branch cannot poison
values with NaN; the taken branch matches the reference exactly.

Vectors are 3-tuples of (batched) scalars (see kinematics.py design note).
"""
import math

import jax.numpy as jnp

from ..utils.constants import EPS


def fuselage(p, rho, uvw_air, vi_mr):
    """Returns (force3, moment3, power)."""
    FUS, MR = p.FUS, p.MR
    ua, va, _ = uvw_air
    wa_fus = uvw_air[2] - vi_mr                       # rotor downwash included
    wa_fus = wa_fus + (wa_fus > 0) * EPS              # make it nonzero (line 306)
    # Downwash impingement position; guard the (pathological) wa_fus == 0 case
    # that the reference leaves as an inf/NaN.
    denom = jnp.where(wa_fus == 0.0, -EPS, -wa_fus)
    d_fw = (ua / denom * (MR.H - FUS.H)) - (FUS.D - MR.D)
    d_fw = d_fw * FUS.COR
    rho_half = 0.5 * rho
    X = rho_half * FUS.XUU * jnp.abs(ua) * ua
    Y = rho_half * FUS.YVV * jnp.abs(va) * va
    Z = rho_half * FUS.ZWW * jnp.abs(wa_fus) * wa_fus
    L = Y * FUS.H
    M = Z * d_fw - X * FUS.H
    power = -X * ua - Y * va - Z * wa_fus
    zero = jnp.zeros_like(X)
    return (X, Y, Z), (L, M, zero), power


def horizontal_tail(p, rho, uvw_air, pqr, vi_mr):
    """Returns (force3, moment3)."""
    HT, MR = p.HT, p.MR
    ua, va, wa = uvw_air
    v_dw = jnp.maximum(vi_mr - wa, EPS)
    d_dw = (ua / v_dw * (MR.H - HT.H)) - (HT.D - MR.D - MR.R)
    # Triangular downwash window (lines 330-333).
    eps_ht = jnp.where((d_dw > 0) & (d_dw < MR.R), 2.0 * (1.0 - d_dw / MR.R), 0.0)
    wa_ht = wa - eps_ht * vi_mr + HT.D * pqr[1]
    # Stall branch (lines 336-340); both sides always evaluated, NaN-free.
    vta_ht = jnp.sqrt(ua ** 2 + va ** 2 + wa_ht ** 2)
    Z_stall = 0.5 * rho * HT.ZMAX * jnp.abs(vta_ht) * wa_ht
    Z_lin = 0.5 * rho * (HT.ZUU * jnp.abs(ua) * ua + HT.ZUW * jnp.abs(ua) * wa_ht)
    Z = jnp.where(jnp.abs(wa_ht) > 0.3 * jnp.abs(ua), Z_stall, Z_lin)
    M = Z * HT.D
    zero = jnp.zeros_like(Z)
    return (zero, zero, Z), (zero, M, zero)


def vertical_tail(p, rho, uvw_air, pqr, vi_tr):
    """Returns (force3, moment3)."""
    VT = p.VT
    ua, va, _ = uvw_air
    va_vt = va + vi_tr - VT.D * pqr[2]
    vta_vt = jnp.sqrt(ua ** 2 + va_vt ** 2)
    Y_stall = 0.5 * rho * VT.YMAX * jnp.abs(vta_vt) * va_vt
    Y_lin = 0.5 * rho * (VT.YUU * jnp.abs(ua) * ua + VT.YUV * jnp.abs(ua) * va_vt)
    Y = jnp.where(jnp.abs(va_vt) > 0.3 * jnp.abs(ua), Y_stall, Y_lin)
    L = Y * VT.H
    N = -Y * VT.D
    zero = jnp.zeros_like(Y)
    return (zero, Y, zero), (L, zero, N)


def wing(p, rho, uvw_air, vi_mr):
    """Returns (force3, moment3, power)."""
    WN = p.WN
    zero = jnp.zeros_like(rho)
    if WN.ZUW == 0.0:
        # Static parameter branch (line 367): the wing term vanishes entirely
        # from the compiled graph for wingless aircraft such as the aw109.
        z3 = (zero, zero, zero)
        return z3, z3, zero
    ua, _, wa = uvw_air
    wa_wn = wa - vi_mr
    vta_wn = jnp.sqrt(ua * ua + wa_wn * wa_wn)
    Z_stall = 0.5 * rho * WN.ZMAX * jnp.abs(vta_wn) * wa_wn
    Z_lin = 0.5 * rho * (WN.ZUU * ua ** 2 + WN.ZUW * ua * wa_wn)
    Z = jnp.where(jnp.abs(wa_wn) > 0.3 * jnp.abs(ua), Z_stall, Z_lin)
    # Induced drag (line 378); guard vta == 0 (reference would divide by zero).
    vta2_safe = jnp.where(vta_wn == 0.0, EPS, vta_wn ** 2)
    X = (-0.5 * rho / math.pi / vta2_safe
         * (WN.ZUU * ua * ua + WN.ZUW * ua * wa_wn) ** 2)
    power = jnp.abs(X * ua)
    return (X, zero, Z), (zero, zero, zero), power
