"""RL task definitions: reward shaping + per-step success predicates.

Parity targets: /root/reference/heligym/envs/helicopter_with_tasks.py
  HeliHover._calculate_reward        lines 27-52
  HeliForwardFlight._calculate_reward lines 78-115
The oblique-flight task is advertised by the reference README (README.md:54)
but never implemented; it is completed here following the forward-flight
pattern.

Tasks are static dataclasses: targets are compile-time constants. `reward`
receives the post-step state and the k4 state-derivatives (the reference's
`self.heli_dyn.state` / `.state_dots`), is written single-env and is vmapped
by the vector layer.
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
    pqr_norm = state.pqr * norm.t
    pqrdot_norm = dots.pqr * norm.t ** 2
    final = -jnp.sum(pqr_norm * pqr_norm, axis=-1)
    terminal = -jnp.sum(jnp.sign(pqr_norm) * pqrdot_norm, axis=-1)
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
        xyz_norm = state.xyz / norm.x
        xyzdot_norm = dots.xyz / norm.v
        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        target = jnp.asarray(
            [self.north_loc, self.east_loc, -self.sea_alt], dtype=jnp.float32) / norm.x
        err = xyz_norm - target
        xyz_final = -jnp.sum(err * err, axis=-1)
        xyz_terminal = -jnp.sum(jnp.sign(err) * xyzdot_norm, axis=-1)
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
        vel = jnp.sqrt(jnp.sum(state.uvw * state.uvw, axis=-1))
        vel_norm = vel / norm.v
        veldot_norm = jnp.sum(state.uvw * dots.uvw, axis=-1) / vel / norm.a
        dwn_norm = state.xyz[2] / norm.x
        dwndot_norm = dots.xyz[2] / norm.v
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
        vel_target = jnp.asarray(
            [self.vel * math.cos(course), self.vel * math.sin(course)],
            dtype=jnp.float32) / norm.v
        # dots.xyz is the NED velocity; NED acceleration is approximated by
        # rotating the body-frame acceleration (adequate for shaping).
        ned_vel_norm = dots.xyz[..., :2] / norm.v
        body2earth = transpose_rows(euler_to_rotmat(state.euler))
        ned_acc = matvec(body2earth, dots.uvw)
        ned_acc_norm = ned_acc[..., :2] / norm.a

        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        err = ned_vel_norm - vel_target
        vel_final = -jnp.sum(err * err, axis=-1)
        vel_terminal = -jnp.sum(jnp.sign(err) * ned_acc_norm, axis=-1)
        vel_reward = _shaped(vel_final, vel_terminal)

        dwn_norm = state.xyz[2] / norm.x
        dwndot_norm = dots.xyz[2] / norm.v
        dwn_target = -self.sea_alt / norm.x
        dwn_final = -((dwn_norm - dwn_target) * (dwn_norm - dwn_target))
        dwn_terminal = -(jnp.sign(dwn_norm - dwn_target) * dwndot_norm)
        dwn_reward = _shaped(dwn_final, dwn_terminal)

        reward = (pqr_reward + vel_reward + dwn_reward) / 3.0
        success = (pqr_final > -1.0) & (vel_final > -1.0) & (dwn_final > -1.0)
        return reward, success
