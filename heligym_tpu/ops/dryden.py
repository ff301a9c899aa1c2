"""Dryden turbulence wind model (MIL-HDBK-1797) as pure jittable functions.

Parity target: /root/reference/heligym/envs/dynamics/wind_dynamics.py.

Differences by design (SURVEY.md §5 RNG):
  * the white-noise input `eta` is an explicit argument — callers draw it from
    `jax.random` (counter-based, per-env reproducible) instead of the global
    unseeded `np.random.randn` (wind_dynamics.py:52). Golden tests inject the
    reference's recorded noise through the same seam.
  * the three altitude regimes (wind_dynamics.py:57-81) are evaluated
    branchlessly and selected with `jnp.where`.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from ..utils.constants import D2R, EPS, SQRT_3, TWO_D_PI
from .lookup import Table, table_lookup_2d
from .state import WindState


def _tep_table() -> Table:
    """Turbulence Exceedence Probability table (wind_dynamics.py:29-37)."""
    t = Table(7, 12)
    t << 500.0 << 1750.0 << 3750.0 << 7500.0 << 15000.0 << 25000.0 << 35000.0 << 45000.0 << 55000.0 << 65000.0 << 75000.0 << 80000.0 \
      << 1 << 3.2 << 2.2 << 1.5 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 \
      << 2 << 4.2 << 3.6 << 3.3 << 1.6 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 \
      << 3 << 6.6 << 6.9 << 7.4 << 6.7 << 4.6 << 2.7 << 0.4 << 0.0 << 0.0 << 0.0 << 0.0 << 0.0 \
      << 4 << 8.6 << 9.6 << 10.6 << 10.1 << 8.0 << 6.6 << 5.0 << 4.2 << 2.7 << 0.0 << 0.0 << 0.0 \
      << 5 << 11.8 << 13.0 << 16.0 << 15.1 << 11.6 << 9.7 << 8.1 << 8.2 << 7.9 << 4.9 << 3.2 << 2.1 \
      << 6 << 15.6 << 17.6 << 23.0 << 23.6 << 22.1 << 20.0 << 16.0 << 15.1 << 12.1 << 7.9 << 6.2 << 5.1 \
      << 7 << 18.7 << 21.5 << 28.4 << 30.2 << 30.7 << 31.0 << 25.2 << 23.1 << 17.5 << 10.7 << 8.4 << 7.2
    return t


_TEP_DATA = np.asarray(_tep_table()._data)


@dataclasses.dataclass(frozen=True)
class WindParams:
    """Static wind/turbulence configuration (from the model's ENV block)."""
    turbulence_level: int
    wind_dir_rad: float
    wind_speed: float
    mean_ned: tuple            # (3,) mean NED wind [ft/s]

    @classmethod
    def from_env(cls, env) -> "WindParams":
        wd = env.WIND_DIR * D2R
        mean = env.WIND_SPD * np.array(
            [np.cos(wd), np.sin(wd), 0.0], dtype=np.float32)
        return cls(turbulence_level=int(env.TURB_LVL), wind_dir_rad=float(wd),
                   wind_speed=float(env.WIND_SPD),
                   mean_ned=tuple(float(x) for x in mean))


def mean_wind(wp: WindParams) -> jnp.ndarray:
    return jnp.asarray(wp.mean_ned, dtype=jnp.float32)


def turbulence_params(wp: WindParams, h_gr, vel_inf_ned):
    """Scale lengths, sigmas and turbulence azimuth for the three MIL-HDBK-1797
    altitude regimes, selected branchlessly (reference lines 54-83)."""
    w20 = wp.turbulence_level / 7.0 * 88.61
    tep = table_lookup_2d(jnp.asarray(_TEP_DATA), float(wp.turbulence_level), h_gr)

    # Low altitude (h <= 1000 ft).
    hg_lo = jnp.maximum(h_gr, 10.0)
    lu_lo = hg_lo / ((0.177 + 0.000823 * hg_lo) ** 1.2)
    lw_lo = 0.5 * hg_lo
    sw_lo = 0.1 * w20
    su_lo = sw_lo / ((0.177 + 0.000823 * hg_lo) ** 0.4)
    az_lo = jnp.full_like(h_gr, wp.wind_dir_rad)

    # High altitude (h >= 2000 ft).
    lu_hi = jnp.full_like(h_gr, 1750.0)
    az_hi = jnp.arctan2(vel_inf_ned[1], vel_inf_ned[0])

    # Medium altitude: interpolation between the two regimes.
    r = (h_gr - 1000.0) / 1000.0
    lu_mid = 1000.0 + r * 750.0
    s_mid = 0.1 * w20 + r * (tep - 0.1 * w20)
    mean = mean_wind(wp)
    az_mid = jnp.arctan2(vel_inf_ned[1] * r + mean[1] * (1.0 - r),
                         vel_inf_ned[0] * r + mean[0] * (1.0 - r))

    low = h_gr <= 1000.0
    high = h_gr >= 2000.0
    lu = jnp.where(low, lu_lo, jnp.where(high, lu_hi, lu_mid))
    lv = 0.5 * lu
    lw = jnp.where(low, lw_lo, jnp.where(high, 0.5 * lu_hi, lu_mid))
    su = jnp.where(low, su_lo, jnp.where(high, tep, s_mid))
    sv = su
    sw = jnp.where(low, sw_lo, jnp.where(high, tep, s_mid))
    az = jnp.where(low, az_lo, jnp.where(high, az_hi, az_mid))
    return lu, lv, lw, su, sv, sw, az


def wind_dynamics(wp: WindParams, state: WindState, action, eta):
    """Dryden filter ODE right-hand side + wind observation.

    `action` = [ned_vel(3), h_gr]; `eta` = (3,) white noise (already scaled by
    1/sqrt(dt)). Returns (dots: WindState, wind_ned_obs: (3,)).
    Mirrors wind_dynamics.py:85-125.
    """
    vel_inf_ned = action[:3] + mean_wind(wp)
    vel_inf = jnp.sqrt(jnp.sum(vel_inf_ned * vel_inf_ned, axis=-1))
    h_gr = action[3]
    lu, lv, lw, su, sv, sw, az = turbulence_params(wp, h_gr, vel_inf_ned)
    t_u = lu / (vel_inf + EPS)
    t_v = lv / (vel_inf + EPS)
    t_w = lw / (vel_inf + EPS)

    usdot = 1.0 / t_u * (eta[0] - state.us)
    vsdot = jnp.stack([
        1.0 / (4.0 * t_v ** 2) * (eta[1] - state.vs[1]) - 1.0 / t_v * state.vs[0],
        state.vs[0]], axis=-1)
    wsdot = jnp.stack([
        1.0 / (4.0 * t_w ** 2) * (eta[2] - state.ws[1]) - 1.0 / t_w * state.ws[0],
        state.ws[0]], axis=-1)
    dots = WindState(us=usdot, vs=vsdot, ws=wsdot)

    k_u = su * jnp.sqrt(TWO_D_PI * t_u)
    k_v = sv * jnp.sqrt(TWO_D_PI * t_v)
    k_w = sw * jnp.sqrt(TWO_D_PI * t_w)
    u_turb = k_u * state.us
    v_turb = k_v * (state.vs[1] + 2.0 * SQRT_3 * state.vs[0])
    w_turb = k_w * (state.ws[1] + 2.0 * SQRT_3 * state.ws[0])
    c, s = jnp.cos(az), jnp.sin(az)
    turb = jnp.stack([c * u_turb - s * v_turb,
                      s * u_turb + c * v_turb,
                      w_turb], axis=-1)
    wind_ned = mean_wind(wp) + turb
    return dots, wind_ned
