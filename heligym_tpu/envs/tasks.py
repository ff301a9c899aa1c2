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
from typing import Dict, Optional

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
    """Base task: zero reward, never succeeds (helicopter.py:242-243).

    `reward(norm, state, dots, task_id=None)` — `task_id` is a per-env i32
    used only by `MixedTask` for task-conditioned batches; plain tasks ignore
    it (the env always threads it through)."""

    def target_dict(self) -> Dict[str, float]:
        return {}

    def with_target(self, **updates) -> "Task":
        return dataclasses.replace(self, **updates)

    def reward(self, norm: Normalizers, state: HeliState, dots: HeliState,
               task_id=None):
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

    def reward(self, norm, state, dots, task_id=None):
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

    def reward(self, norm, state, dots, task_id=None):
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
class TurningFlightTask(Task):
    """Hold a coordinated turn: constant yaw rate at constant speed/altitude.

    From the reference's unimplemented roadmap (README.md TODO: 'turning
    flight task'), built in the house reward style: quadratic final terms with
    derivative-based terminal shaping, max-combined per quantity.
    """
    sea_alt: float = 4000.0
    vel: float = 60.0
    yaw_rate: float = 0.15        # [rad/s]

    def target_dict(self):
        return {"sea_alt": self.sea_alt, "vel": self.vel,
                "yaw_rate": self.yaw_rate}

    def reward(self, norm, state, dots, task_id=None):
        # roll/pitch rates should vanish; yaw rate should match the target
        pn, qn = state.p * norm.t, state.q * norm.t
        rn_err = (state.r - jnp.float32(self.yaw_rate)) * norm.t
        t2 = norm.t ** 2
        pdn, qdn, rdn = dots.p * t2, dots.q * t2, dots.r * t2
        pqr_final = -((pn * pn + qn * qn) + rn_err * rn_err)
        pqr_terminal = -((jnp.sign(pn) * pdn + jnp.sign(qn) * qdn)
                         + jnp.sign(rn_err) * rdn)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        vel = jnp.sqrt((state.u * state.u + state.v * state.v)
                       + state.w * state.w)
        vel_norm = vel / norm.v
        veldot_norm = (((state.u * dots.u + state.v * dots.v) + state.w * dots.w)
                       / jnp.maximum(vel, 1e-3) / norm.a)
        vel_target = self.vel / norm.v
        vel_final = -((vel_norm - vel_target) * (vel_norm - vel_target))
        vel_terminal = -(jnp.sign(vel_norm - vel_target) * veldot_norm)
        vel_reward = _shaped(vel_final, vel_terminal)

        dwn_norm = state.z / norm.x
        dwn_target = -self.sea_alt / norm.x
        dwn_final = -((dwn_norm - dwn_target) * (dwn_norm - dwn_target))
        dwn_terminal = -(jnp.sign(dwn_norm - dwn_target) * (dots.z / norm.v))
        dwn_reward = _shaped(dwn_final, dwn_terminal)

        reward = (pqr_reward + vel_reward + dwn_reward) / 3.0
        success = (pqr_final > -1.0) & (vel_final > -1.0) & (dwn_final > -1.0)
        return reward, success


@dataclasses.dataclass(frozen=True)
class SlalomTask(Task):
    """Weave along a sinusoidal lateral reference while flying north.

    From the reference's unimplemented roadmap (README.md TODO: 'slalom
    maneuver task'): track east-position y_ref(x) = amplitude *
    sin(2 pi x / wavelength) at constant speed and altitude.
    """
    sea_alt: float = 4000.0
    vel: float = 80.0
    amplitude: float = 150.0      # [ft] lateral weave amplitude
    wavelength: float = 2000.0    # [ft] weave period along north

    def target_dict(self):
        return {"sea_alt": self.sea_alt, "vel": self.vel,
                "amplitude": self.amplitude, "wavelength": self.wavelength}

    def reward(self, norm, state, dots, task_id=None):
        two_pi_l = 2.0 * math.pi / self.wavelength
        y_ref = jnp.float32(self.amplitude) * jnp.sin(two_pi_l * state.x)
        ydot_ref = (jnp.float32(self.amplitude) * two_pi_l
                    * jnp.cos(two_pi_l * state.x) * dots.x)
        ey = (state.y - y_ref) / norm.x
        eydot = (dots.y - ydot_ref) / norm.v
        track_final = -(ey * ey)
        track_terminal = -(jnp.sign(ey) * eydot)
        track_reward = _shaped(track_final, track_terminal)

        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        vel_norm = dots.x / norm.v          # northbound ground speed
        vel_target = self.vel / norm.v
        vel_final = -((vel_norm - vel_target) * (vel_norm - vel_target))
        vel_terminal = -(jnp.sign(vel_norm - vel_target) * (dots.u / norm.a))
        vel_reward = _shaped(vel_final, vel_terminal)

        dwn_norm = state.z / norm.x
        dwn_target = -self.sea_alt / norm.x
        dwn_final = -((dwn_norm - dwn_target) * (dwn_norm - dwn_target))
        dwn_terminal = -(jnp.sign(dwn_norm - dwn_target) * (dots.z / norm.v))
        dwn_reward = _shaped(dwn_final, dwn_terminal)

        reward = (pqr_reward + track_reward + vel_reward + dwn_reward) / 4.0
        success = ((pqr_final > -1.0) & (track_final > -1.0)
                   & (vel_final > -1.0) & (dwn_final > -1.0))
        return reward, success


@dataclasses.dataclass(frozen=True)
class LandingTask(Task):
    """Descend to a gentle touchdown at a target pad.

    From the reference's unimplemented roadmap (README.md TODO: 'ground
    task'): minimize ground altitude over the pad with bounded descent rate
    and level attitude; success while settled on the ground (the env's crash
    detection still fails hard/attitude-violating contacts).
    """
    pad_north: float = 0.0
    pad_east: float = 0.0
    max_touch_rate: float = 3.0   # [ft/s] gentle-touchdown descent limit
    # Sea-level altitude of gear contact at the pad; when set, per-step
    # success additionally requires the CG within 5 ft above it, so "settled"
    # means ON the ground, not merely motionless (a trim hover is motionless
    # and level too). None preserves the altitude-agnostic behavior; the
    # train CLI resolves `--target touch_alt=ground` to the terrain's
    # contact altitude at (0, 0).
    touch_alt: Optional[float] = None

    def target_dict(self):
        return {"pad_north": self.pad_north, "pad_east": self.pad_east,
                "max_touch_rate": self.max_touch_rate,
                "touch_alt": self.touch_alt}

    def reward(self, norm, state, dots, task_id=None):
        pqr_final, pqr_terminal = _pqr_rewards(norm, state, dots)
        pqr_reward = _shaped(pqr_final, pqr_terminal)

        en = (state.x - jnp.float32(self.pad_north)) / norm.x
        ee = (state.y - jnp.float32(self.pad_east)) / norm.x
        pad_final = -(en * en + ee * ee)
        pad_terminal = -((jnp.sign(en) * dots.x + jnp.sign(ee) * dots.y)
                         / norm.v)
        pad_reward = _shaped(pad_final, pad_terminal)

        # reward descending toward the ground but punish fast descent near it;
        # state.z is NED down so dots.z > 0 descends
        sink = dots.z / norm.v
        desired_sink = jnp.float32(self.max_touch_rate) / norm.v
        sink_err = sink - desired_sink
        sink_reward = -(sink_err * sink_err)

        reward = (pqr_reward + pad_reward + sink_reward) / 3.0
        # settled: essentially motionless and level (on the ground, the gear
        # spring holds sink near zero)
        speed2 = (state.u * state.u + state.v * state.v) + state.w * state.w
        success = ((speed2 < 4.0) & (jnp.abs(state.phi) < 0.15)
                   & (jnp.abs(state.theta) < 0.15) & (pad_final > -1.0))
        if self.touch_alt is not None:
            # static Python branch: task fields are jit-static
            success = success & ((-state.z)
                                 < jnp.float32(self.touch_alt) + 5.0)
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

    def reward(self, norm, state, dots, task_id=None):
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


@dataclasses.dataclass(frozen=True)
class MixedTask(Task):
    """Task-conditioned multi-task batches (BASELINE.json config #3): each env
    carries an i32 `task_id` in its EnvState selecting one of `tasks`. All
    sub-rewards are computed branchlessly and selected per lane — cheap for
    the handful of tasks involved, fully compatible with the fused Pallas
    step (no control flow)."""
    tasks: tuple = ()

    def target_dict(self):
        return {f"task{i}": t.target_dict() for i, t in enumerate(self.tasks)}

    def reward(self, norm, state, dots, task_id=None):
        assert self.tasks, "MixedTask needs at least one sub-task"
        if task_id is None:
            return self.tasks[0].reward(norm, state, dots)
        reward = jnp.zeros_like(state.vi_mr)
        # Carry the success selection in float and compare once at the end:
        # a bool-operand `where` chain lowers to an i8->i1 vector truncation
        # that Mosaic rejects ("Unsupported target bitwidth for truncation"),
        # while mask->float casts and float selects legalize fine.
        success_f = jnp.zeros_like(state.vi_mr)
        for i, t in enumerate(self.tasks):
            r_i, s_i = t.reward(norm, state, dots)
            sel = task_id == i
            reward = jnp.where(sel, r_i, reward)
            success_f = jnp.where(sel, s_i.astype(reward.dtype), success_f)
        return reward, success_f > 0.5
