"""6-DOF equations of motion: full helicopter state-derivative assembly.

Parity target: /root/reference/heligym/envs/dynamics/helicopter_dynamics.py:400-489
(control mapping 413-422, kinematics 423-431, force/moment summation 446-455 in
the reference's exact accumulation order, observation 471-488).

Pure function of (params, state, action, wind, committed terrain height); all
batching comes from `jax.vmap`, all time stepping from the integrator.
"""
import jax.numpy as jnp

from ..utils.constants import D2R
from ..utils.math import cross
from . import aero, gear, rotor
from .atmosphere import air_properties
from .kinematics import euler_to_rotmat, matvec, pqr_to_eulerdot_mat, transpose_rows
from .state import HeliState


def control_inputs(p, action):
    """Normalized [-1, 1]^4 action -> (coll, lon, lat, pedal) in radians
    (reference lines 413-422)."""
    H = p.HELI
    coll = D2R * (H.COL_OS + 0.5 * action[0] * (H.COL_H - H.COL_L)
                  + 0.5 * (H.COL_H + H.COL_L))
    lon = D2R * (0.5 * action[1] * (H.LON_H - H.LON_L) + 0.5 * (H.LON_H + H.LON_L))
    lat = D2R * (0.5 * action[2] * (H.LAT_H - H.LAT_L) + 0.5 * (H.LAT_H + H.LAT_L))
    pedal = D2R * (H.PED_OS + 0.5 * action[3] * (H.PED_H - H.PED_L)
                   + 0.5 * (H.PED_H + H.PED_L))
    return coll, lon, lat, pedal


def heli_dynamics(p, state: HeliState, action, wind_ned, h_ground):
    """State derivative + observation.

    Args:
      p: static HeliParams.
      state: HeliState (single env; vmap for batches).
      action: (4,) normalized controls.
      wind_ned: (3,) NED wind velocity [ft/s] applied this step.
      h_ground: terrain height at the *committed* CG position [ft] — constant
        across RK4 stages, mirroring the reference's `self.state` reads.

    Returns:
      (dots: HeliState, obs: (17,) f32, power_total)
    The 17-dim observation is only meaningful when evaluated at the k4 stage
    (reference sets it there); unused outputs are DCE'd by XLA elsewhere.
    """
    coll, lon, lat, pedal = control_inputs(p, action)

    earth2body = euler_to_rotmat(state.euler)
    body2earth = transpose_rows(earth2body)
    euler_dot = matvec(pqr_to_eulerdot_mat(state.euler), state.pqr)
    ned_vel = matvec(body2earth, state.uvw)
    uvw_air = state.uvw - matvec(earth2body, wind_ned)

    power_climb = p.HELI.WT * (-ned_vel[2])
    _, rho = air_properties(p.ENV, -state.xyz[2])

    force_mr, moment_mr, power_mr, betas_dot, vi_mr_dot, psi_mr_dot = rotor.main_rotor(
        p, rho, coll, lon, lat, state.betas, uvw_air, state.pqr, state.vi_mr)
    force_tr, moment_tr, power_tr, vi_tr_dot, psi_tr_dot = rotor.tail_rotor(
        p, rho, pedal, uvw_air, state.pqr, state.vi_tr)
    force_fus, moment_fus, power_fus = aero.fuselage(p, rho, uvw_air, state.vi_mr)
    force_ht, moment_ht = aero.horizontal_tail(p, rho, uvw_air, state.pqr, state.vi_mr)
    force_vt, moment_vt = aero.vertical_tail(p, rho, uvw_air, state.pqr, state.vi_tr)
    force_wn, moment_wn, power_wn = aero.wing(p, rho, uvw_air, state.vi_mr)
    force_lg, moment_lg = gear.landing_gear(
        p, state.xyz, ned_vel, body2earth, state.pqr, h_ground)

    # Climb + fuselage power are charged to main-rotor torque (lines 448-450).
    power_extra_mr = power_climb + power_fus
    extra_mr_torque = power_extra_mr / p.MR.OMEGA
    moment_mr = moment_mr.at[..., 2].add(extra_mr_torque)

    power_total = (power_mr + power_tr + power_extra_mr + power_wn
                   + 550.0 * p.HELI.HP_LOSS)
    wt_vec = jnp.stack([jnp.zeros_like(rho), jnp.zeros_like(rho),
                        jnp.full_like(rho, p.HELI.WT)], axis=-1)
    force_gravity = matvec(earth2body, wt_vec)
    # Accumulation order matches reference lines 454-455 exactly.
    force_total = (force_mr + force_tr + force_fus + force_ht + force_vt
                   + force_wn + force_gravity + force_lg)
    moment_total = (moment_mr + moment_tr + moment_fus + moment_ht + moment_vt
                    + moment_wn + moment_lg)

    body_acc = force_total / p.HELI.M
    uvw_dot = body_acc - cross(state.pqr, state.uvw)
    i_pqr = matvec(p.HELI.I, state.pqr)
    pqr_dot = matvec(p.HELI.IINV, moment_total - cross(state.pqr, i_pqr))
    xyz_dot = ned_vel

    dots = HeliState(vi_mr=vi_mr_dot, vi_tr=vi_tr_dot,
                     psi_mr=psi_mr_dot, psi_tr=psi_tr_dot,
                     betas=betas_dot, uvw=uvw_dot, pqr=pqr_dot,
                     euler=euler_dot, xyz=xyz_dot)

    # Observation (lines 471-488): 17 dims, ground altitude against the
    # committed terrain height.
    power_total_hp = power_total / 550.0
    alt_gr = -state.xyz[2] - h_ground
    obs = jnp.concatenate([
        power_total_hp[..., None],
        uvw_air, ned_vel, state.euler, state.pqr,
        state.xyz[..., 0][..., None], state.xyz[..., 1][..., None],
        (-state.xyz[..., 2])[..., None], alt_gr[..., None],
    ], axis=-1)
    return dots, obs, power_total
