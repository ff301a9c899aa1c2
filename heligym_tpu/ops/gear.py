"""Landing-gear spring-damper ground reaction.

Parity target: /root/reference/heligym/envs/dynamics/helicopter_dynamics.py:385-398.

Two reference quirks reproduced deliberately:
  * the ground height is sampled at the env's *committed* (pre-RK4-stage) CG
    position — `__get_ground_height_from_hmap` reads `self.state`, not the
    stage state — so `h_ground` arrives here as a precomputed constant;
  * each contacting leg's moment uses the cross product with the *running
    accumulated* force, not that leg's own contribution (line 397).

The 3-leg loop is unrolled statically (legs are compile-time constants), and
the contact `if` becomes masked accumulation.
"""
import jax.numpy as jnp

from ..utils.constants import EPS
from ..utils.math import cross
from .kinematics import matvec, transpose_rows


def landing_gear(p, xyz, ned_vel, body2earth, pqr, h_ground):
    """Returns (force(3), moment(3)) in the body frame.

    `h_ground` is the terrain height at the committed CG position [ft].
    """
    LG, HELI = p.LG, p.HELI
    earth2body = transpose_rows(body2earth)
    touch_alt = h_ground + HELI.WL_CG / 12.0

    force = jnp.zeros_like(ned_vel)
    moment = jnp.zeros_like(ned_vel)
    for leg in LG.LOC:
        pos_body = jnp.asarray(leg, dtype=xyz.dtype)
        pos_ned = xyz + matvec(body2earth, pos_body)
        vel_ned = ned_vel + matvec(body2earth, cross(pqr, pos_body))
        contact = (-pos_ned[2]) - touch_alt < 0.0
        cxdot = LG.C * vel_ned[2]
        kx = LG.K * (pos_ned[2] + h_ground)
        f_ned = jnp.stack([jnp.zeros_like(kx), jnp.zeros_like(kx),
                           -(cxdot + kx) + EPS], axis=-1)
        f_body = matvec(earth2body, f_ned)
        force = force + jnp.where(contact, f_body, 0.0)
        # Reference quirk: cross with the accumulated force so far.
        moment = moment + jnp.where(contact, cross(pos_body, force), 0.0)
    return force, moment
