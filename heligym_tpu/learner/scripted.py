"""Scripted model-based landing approach controller (expert labeler).

Round-5 landing-100 attack route (b) from docs/TRAINING.md: every learning
route out of the current behavior basin failed because no arrest behavior
exists to amplify — PPO's exploration from 55-100 ft is crash-dominated and
success-conditioned stochastic episodes are heterogeneous flukes. This
module sidesteps learning entirely for the EXPERT: the repo has the exact
plant, so a cascaded PD law around the hover trim can fly the approach by
construction, and the proven expert-label distillation machinery
(tools/distill_multitask.py pattern) can then clone it into the standard
actor network.

The controller is deliberately MEMORYLESS — a pure function obs -> residual
(no integrators, no mode latches) — so it can label arbitrary student-visited
states in DAgger rounds without hidden-state mismatch, and so the MLP student
(also memoryless) can represent it exactly.

Structure (all residuals around the trim action, executed =
clip(act_bias + residual, -1, 1), ppo.py:244-246):

  * collective: track a descent-rate profile vd_ref(agl) =
    clip(k_agl * (agl - agl_td), 0, vmax) — the same safe-approach gradient
    --prof-shaping rewards, here as a feedback law. agl_td sits BELOW the
    gear rest point (CG ~5.04 ft AGL for aw109, gear.py touch geometry), so
    at rest the law still commands a small descent: collective settles below
    hover thrust and the gear spring carries the difference — weight-on-
    wheels holding the frictionless gear (CLAUDE.md gear insight) pinned.
  * cyclics: position hold. NED pad error + velocity -> desired horizontal
    acceleration (heading frame) -> tilt reference about the TRIM attitude
    (hover in the model's ~20 ft/s mean wind banks/pitches nonzero) -> PD
    attitude inner loop. Sign conventions measured by pulse probes on the
    plant: +lon -> pitch-down/forward accel, +lat -> +roll/+east accel.
  * pedal: yaw hold about trim heading; +pedal -> negative yaw rate.

Reference semantics this must respect: gear helicopter_dynamics.py:385-398,
crash tests helicopter.py:226-234, success = settled (<2 ft/s, level,
within 5 ft of touch_alt) for max_time/4 s (envs/tasks.py LandingTask).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ApproachGains:
    """Cascaded-PD gains. Defaults are the tuned values (tools/
    tune_scripted.py sweep, round 5); all fields are jit-static floats."""
    # vertical: collective tracks vd_ref(agl)
    k_w: float = 0.03        # collective residual per ft/s of vd error
    vmax: float = 9.0        # [ft/s] descent-rate cap
    k_agl: float = 0.25      # [1/s] profile slope (arrest time constant)
    agl_td: float = 3.0      # [ft] virtual touchdown AGL (below gear rest)
    # touchdown capture (gear band entry at CG ~8.3 ft AGL for aw109):
    # the gear spring pulls DOWN with ~K*leg_agl (~90,000 lb at the band
    # edge — 17x the weight), so whichever leg enters the band first is
    # yanked down asymmetrically and the airframe rolls over (measured:
    # every slow or trim-banked touchdown flips past +-pi). Counter: enter
    # the band LEVEL (legs engage together; the moments nearly cancel) and
    # BRISKLY (short asymmetry window).
    v_floor: float = 6.0     # [ft/s] minimum commanded sink below floor_agl
    floor_agl: float = 14.0  # [ft] where the sink floor ramps in
    lvl_hi: float = 13.0     # [ft] start blending attitude to level
    lvl_lo: float = 8.5      # [ft] fully level by here (band entry)
    lvl_end: float = 5.2     # [ft] restore hold authority below (on gear)
    lvl_end_w: float = 0.8   # [ft] restore ramp width
    # ground-phase direct velocity->cyclic: on the gear the spring locks
    # the fuselage level (pitch stiffness ~K*x_leg^2 dwarfs cyclic
    # moments), so velocity nulling must TILT THE ROTOR DISK directly —
    # cyclic deflection proportional to ground speed, not attitude error
    k_gv: float = 0.15       # cyclic per ft/s of ground speed, on gear
    gnd_agl: float = 9.0     # [ft] where the ground term ramps in
    # ground collective boost: after first contact the airframe bounces up
    # and hangs on the mains' downward band pull, pitching up into a
    # tail-sit (mains behind the CG) that tips over if sustained; a much
    # stiffer collective response on the gear kills the bounce so the
    # mains reach their rest point and gravity drops the nose back down
    k_w_gnd: float = 0.0     # extra collective gain per ft/s, on gear
    # commit gate: just above the band, only descend while the airframe is
    # QUIET (level, low rates, low lateral speed); otherwise hold — a gust
    # at the instant of entry is what flips the survivors' remaining ~6%.
    # Memoryless: the Dryden gusts decorrelate in ~1-2 s, so the gate just
    # waits out the bad moments and commits crisply on the next calm one.
    gate_hi: float = 15.0    # [ft] gate zone top
    gate_lo: float = 12.0     # [ft] gate zone bottom (band entry)
    gate_phi: float = 0.04  # [rad] roll tolerance
    gate_p: float = 0.12     # [rad/s] roll-rate tolerance
    gate_q: float = 0.20     # [rad/s] pitch-rate tolerance
    gate_vy: float = 1.8     # [ft/s] lateral speed tolerance
    gate_climb: float = 0.5  # [ft/s] climb command while gated
    # capture-zone attitude-gain boost: leveling off the trim bank with
    # the cruise gains takes ~1 s (small error -> small cyclic), but a
    # low start has ~0.4 s before band entry; 3x stiffer attitude loops
    # through the capture zone level it in time (rate gain scales too,
    # keeping the damping ratio)
    lvl_boost: float = 0.0   # extra attitude-gain factor at full w_lvl
    # entry bank bias: every observed capture flip is to the LEFT (the
    # slam's collective/torque transient is laterally asymmetric), so a
    # small preemptive right bank at entry centers the divergence
    phi_td: float = 0.0      # [rad] roll reference offset at full w_lvl
    # horizontal position hold (outer loop -> desired accel, heading frame)
    k_pos: float = 0.04      # [1/s^2] accel per ft of pad error
    k_vel: float = 0.40      # [1/s] accel per ft/s of ground speed
    a_max: float = 6.0       # [ft/s^2] accel clip
    tilt_max: float = 0.12   # [rad] tilt-reference deviation clip
    # attitude inner loop (cyclic residuals)
    k_att: float = 1.5       # cyclic per rad of attitude error
    k_rate: float = 0.40     # cyclic per rad/s of body rate
    # yaw hold
    k_psi: float = 1.2      # pedal per rad of heading error
    k_r: float = 1.2        # pedal per rad/s of yaw rate
    # collective->pedal torque feedforward: main-rotor torque tracks
    # collective, so a collective change yaws the fuselage before the PD
    # loop can react (measured: +0.05 coll -> r +0.092/s, +0.05 ped ->
    # r -0.072/s, ratio ~1.3); cancel it at the source
    k_cp: float = 1.3        # pedal per unit of collective residual
    resid_max: float = 0.5   # final residual clip (keeps executed in-band)


# Observation layout (ops/eom.py:111-116):
#   0 power_hp, 1-3 uvw_air, 4-6 ned_vel, 7-9 phi/theta/psi,
#   10-12 p/q/r, 13-14 x/y, 15 alt_sea, 16 alt_ground

def landing_residual(obs, g: ApproachGains, trim_att):
    """Pure feedback law: raw obs (..., 17) -> action residual (..., 4).

    `trim_att` = (phi, theta, psi) of the act_bias trim point (static
    floats); attitude/heading errors reference it so zero residual
    reproduces the trim hover.
    """
    phi0, theta0, psi0 = (float(a) for a in trim_att)
    vn, ve, vd = obs[..., 4], obs[..., 5], obs[..., 6]
    phi, theta, psi = obs[..., 7], obs[..., 8], obs[..., 9]
    p, q, r = obs[..., 10], obs[..., 11], obs[..., 12]
    x, y, agl = obs[..., 13], obs[..., 14], obs[..., 16]

    # -- vertical: descent-rate profile ---------------------------------
    # brisk-entry floor: never creep into the gear capture band (a slow
    # entry maximizes the single-leg asymmetric-yank window); on the gear
    # the unmet sink command keeps collective below hover -> weight pressed
    # onto the frictionless gear (CLAUDE.md gear insight)
    floor = g.v_floor * jnp.clip((g.floor_agl - agl) / 3.0, 0.0, 1.0)
    vd_ref = jnp.clip(jnp.maximum(g.k_agl * (agl - g.agl_td), floor),
                      0.0, g.vmax)

    c, s = jnp.cos(psi), jnp.sin(psi)
    ex, ey = c * x + s * y, -s * x + c * y          # pad error, body-heading
    vx, vy = c * vn + s * ve, -s * vn + c * ve      # ground vel, body-heading

    # -- commit gate -----------------------------------------------------
    pen = (jnp.abs(phi) / g.gate_phi + jnp.abs(p) / g.gate_p
           + jnp.abs(q) / g.gate_q + jnp.abs(vy) / g.gate_vy)
    gate = jnp.clip(2.0 - pen, 0.0, 1.0)            # 1 = quiet, commit
    w_z = (jnp.clip((g.gate_hi - agl) / (g.gate_hi - g.gate_lo), 0.0, 1.0)
           * jnp.clip((agl - g.gate_lo) / 0.4, 0.0, 1.0))
    hold = w_z * (1.0 - gate)
    vd_ref = (1.0 - hold) * vd_ref - hold * g.gate_climb

    w_gnd = jnp.clip((g.gnd_agl - agl) / 0.8, 0.0, 1.0)
    d_coll = (g.k_w + w_gnd * g.k_w_gnd) * (vd - vd_ref)
    ax = jnp.clip(-(g.k_pos * ex + g.k_vel * vx), -g.a_max, g.a_max)
    ay = jnp.clip(-(g.k_pos * ey + g.k_vel * vy), -g.a_max, g.a_max)
    G = 32.174
    # forward accel needs pitch BELOW trim; east accel needs roll ABOVE
    theta_ref = theta0 + jnp.clip(-ax / G, -g.tilt_max, g.tilt_max)
    phi_ref = phi0 + jnp.clip(ay / G, -g.tilt_max, g.tilt_max)
    # capture-window level blend: references go to 0 attitude through the
    # gear band so all legs engage together; authority returns at rest
    # (the spring is deep in its band there and small tilts are safe —
    # needed to null the frictionless wind-driven ground slide)
    w_lvl = (jnp.clip((g.lvl_hi - agl) / (g.lvl_hi - g.lvl_lo), 0.0, 1.0)
             * jnp.clip((agl - g.lvl_end) / g.lvl_end_w, 0.0, 1.0))
    theta_ref = (1.0 - w_lvl) * theta_ref
    phi_ref = (1.0 - w_lvl) * phi_ref + w_lvl * g.phi_td
    # boost only ABOVE band entry: inside the band the gear yank drives
    # rate spikes that a stiffened loop would slam cyclic against
    w_boost = w_lvl * jnp.clip((agl - g.lvl_lo) / 0.3, 0.0, 1.0)
    boost = 1.0 + g.lvl_boost * w_boost
    k_att, k_rate = g.k_att * boost, g.k_rate * boost
    d_lon = k_att * (theta - theta_ref) + k_rate * q       # +lon pitches down
    d_lat = k_att * (phi_ref - phi) - k_rate * p           # +lat rolls right
    d_lon = d_lon - w_gnd * g.k_gv * vx                    # +lon -> +forward
    d_lat = d_lat - w_gnd * g.k_gv * vy                    # +lat -> +east

    # -- yaw hold --------------------------------------------------------
    dpsi = (psi - psi0 + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    d_ped = g.k_psi * dpsi + g.k_r * r + g.k_cp * d_coll   # +ped -> -r

    resid = jnp.stack([d_coll, d_lon, d_lat, d_ped], axis=-1)
    return jnp.clip(resid, -g.resid_max, g.resid_max)


def make_scripted_policy(env, gains: ApproachGains | None = None):
    """(act_bias, trim_att, fn) where fn(obs) -> residual for this env's
    trim point. Host-side trim solve happens once here."""
    g = gains or ApproachGains()
    tr = env.trim_result()
    trim_att = (float(tr.state.phi), float(tr.state.theta),
                float(tr.state.psi))
    act_bias = jnp.asarray(tr.action, jnp.float32)

    def fn(obs):
        return landing_residual(obs, g, trim_att)

    return act_bias, trim_att, fn
