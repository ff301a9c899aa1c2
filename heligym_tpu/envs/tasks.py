"""RL task definitions: reward shaping + per-step success predicates.

Parity targets: /root/reference/heligym/envs/helicopter_with_tasks.py
  HeliHover._calculate_reward        lines 27-52
  HeliForwardFlight._calculate_reward lines 78-115
The oblique-flight task is advertised by the reference README (README.md:54)
but never implemented; it is completed here following the forward-flight
pattern.

Tasks are static dataclasses: targets are compile-time constants. `reward`
receives the post-step state and the k4 state-derivatives (the reference's
`self.heli_dyn.state` / `.state_dots`). The math is scalar-expression-explicit
over (possibly lane-batched) state fields, keeping all reductions in the
reference's sequential order and the whole function Pallas-kernel-legal.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax.numpy as jnp

from ..ops.kinematics import euler_to_rotmat, matvec, transpose_rows
from ..ops.state import HeliState


@dataclasses.dataclass(frozen=True)
class Normalizers:
    """Reward normalizers from rotor radius and gravity (helicopter.py:63-68)."""
    t: float
    x: float
    v: float
    a: float

    @classmethod
    def from_params(cls, p) -> "Normalizers":
        return cls(t=math.sqrt(2.0 * p.MR.R / p.ENV.GRAV),
                   x=2.0 * p.MR.R,
                   v=math.sqrt(2.0 * p.MR.R * p.ENV.GRAV),
                   a=p.ENV.GRAV)


def _shaped(final_reward, terminal_reward):
    return jnp.maximum(final_reward, terminal_reward)


@dataclasses.dataclass(frozen=True)
class Task:
    """Base task: zero reward, never succeeds (helicopter.py:242-243)."""

    def target_dict(self) -> Dict[str, float]:
        return {}

    def with_target(self, **updates) -> "Task":
        return dataclasses.replace(self, **updates)

    def reward(self, norm: Normalizers, state: HeliState, dots: HeliState):
        return jnp.zeros_like(state.vi_mr), jnp.zeros_like(state.vi_mr, dtype=bool)


def _pqr_rewards(norm, state, dots):
    pn, qn, rn = state.p * norm.t, state.q * norm.t, state.r * norm.t
    t2 = norm.t ** 2
    pdn, qdn, rdn = dots.p * t2, dots.q * t2, dots.r * t2
    final = -((pn * pn + qn * qn) + rn * rn)
    terminal = -((jnp.sign(pn) * pdn + jnp.sign(qn) * qdn) + jnp.sign(rn) * rdn)
    return final, terminal


@dataclasses.dataclass(frozen=True)
class HoverTask(Task):
    """Hold position/altitude (helicopter_with_tasks.py:9-13, 27-52)."""
    sea_alt: float = 4000.0
    north_loc: float = 0.0
    east_loc: float = 0.0

    def target_dict(self):
        return {"sea_alt": self.sea_alt, "north_loc": self.north_loc,
                "east_loc": self.east_loc}

    def reward(self, norm, state, dots):
        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        en = state.x / norm.x - jnp.float32(self.north_loc) / norm.x
        ee = state.y / norm.x - jnp.float32(self.east_loc) / norm.x
        ed = state.z / norm.x - jnp.float32(-self.sea_alt) / norm.x
        xyz_final = -((en * en + ee * ee) + ed * ed)
        xdn, ydn, zdn = dots.x / norm.v, dots.y / norm.v, dots.z / norm.v
        xyz_terminal = -((jnp.sign(en) * xdn + jnp.sign(ee) * ydn)
                         + jnp.sign(ed) * zdn)
        xyz_reward = _shaped(xyz_final, xyz_terminal)

        reward = (pqr_reward + xyz_reward) / 2.0
        success = (pqr_final > -1.0) & (xyz_final > -1.0)
        return reward, success


@dataclasses.dataclass(frozen=True)
class ForwardFlightTask(Task):
    """Hold speed/altitude (helicopter_with_tasks.py:59-63, 78-115).

    Note: like the reference, the heading target is carried but not used by
    the reward, and the speed-derivative term divides by the current speed
    (reference line 81) — at zero speed this produces the same inf the
    reference produces.
    """
    sea_alt: float = 4000.0
    heading: float = 0.0
    vel: float = 100.0

    def target_dict(self):
        return {"sea_alt": self.sea_alt, "heading": self.heading, "vel": self.vel}

    def reward(self, norm, state, dots):
        vel = jnp.sqrt((state.u * state.u + state.v * state.v)
                       + state.w * state.w)
        vel_norm = vel / norm.v
        veldot_norm = (((state.u * dots.u + state.v * dots.v) + state.w * dots.w)
                       / vel / norm.a)
        dwn_norm = state.z / norm.x
        dwndot_norm = dots.z / norm.v
        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        vel_target = self.vel / norm.v
        vel_final = -((vel_norm - vel_target) * (vel_norm - vel_target))
        vel_terminal = -(jnp.sign(vel_norm - vel_target) * veldot_norm)
        vel_reward = _shaped(vel_final, vel_terminal)

        dwn_target = -self.sea_alt / norm.x
        dwn_final = -((dwn_norm - dwn_target) * (dwn_norm - dwn_target))
        dwn_terminal = -(jnp.sign(dwn_norm - dwn_target) * dwndot_norm)
        dwn_reward = _shaped(dwn_final, dwn_terminal)

        reward = (pqr_reward + vel_reward + dwn_reward) / 3.0
        success = (pqr_final > -1.0) & (vel_final > -1.0) & (dwn_final > -1.0)
        return reward, success


@dataclasses.dataclass(frozen=True)
class ObliqueFlightTask(Task):
    """Fly at a course offset from the nose heading while holding altitude.

    The reference advertises HeliObliqueFlight-v0 (README.md:54) but ships no
    implementation; this completes it in the house style: the horizontal NED
    velocity must match `vel` along course `heading + azimuth`, with the same
    max(final, terminal) shaping as hover/forward flight.
    """
    sea_alt: float = 4000.0
    heading: float = 0.0
    vel: float = 100.0
    azimuth: float = math.pi / 4.0   # [rad] course offset from heading

    def target_dict(self):
        return {"sea_alt": self.sea_alt, "heading": self.heading,
                "vel": self.vel, "azimuth": self.azimuth}

    def reward(self, norm, state, dots):
        course = self.heading + self.azimuth
        tv_n = jnp.float32(self.vel * math.cos(course)) / norm.v
        tv_e = jnp.float32(self.vel * math.sin(course)) / norm.v
        # dots.{x,y} are the NED velocity; NED acceleration is approximated by
        # rotating the body-frame acceleration (adequate for shaping).
        vn = dots.x / norm.v
        ve = dots.y / norm.v
        body2earth = transpose_rows(euler_to_rotmat(state.phi, state.theta,
                                                    state.psi))
        acc = matvec(body2earth, (dots.u, dots.v, dots.w))
        an, ae = acc[0] / norm.a, acc[1] / norm.a

        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        en, ee = vn - tv_n, ve - tv_e
        vel_final = -(en * en + ee * ee)
        vel_terminal = -(jnp.sign(en) * an + jnp.sign(ee) * ae)
        vel_reward = _shaped(vel_final, vel_terminal)

        dwn_norm = state.z / norm.x
        dwndot_norm = dots.z / norm.v
        dwn_target = -self.sea_alt / norm.x
        dwn_final = -((dwn_norm - dwn_target) * (dwn_norm - dwn_target))
        dwn_terminal = -(jnp.sign(dwn_norm - dwn_target) * dwndot_norm)
        dwn_reward = _shaped(dwn_final, dwn_terminal)

        reward = (pqr_reward + vel_reward + dwn_reward) / 3.0
        success = (pqr_final > -1.0) & (vel_final > -1.0) & (dwn_final > -1.0)
        return reward, success
