"""Simulation state pytrees.

The reference packs 18 scalars into one flat float32 vector with named slices
(/root/reference/heligym/envs/dynamics/dynamics.py:75-128). The TPU-native
equivalent is a frozen dataclass pytree: `jax.vmap`/`lax.scan`/`jax.sharding`
all operate on it directly, and RK4 stage arithmetic is a `tree_map`.

Leaf shapes are per-env ((), (2,), (3,)); batching adds leading axes via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Flattening order of the 18-dim state vector, matching the reference's
# registration order (helicopter_dynamics.py:55-64).
HELI_STATE_FIELDS = ("vi_mr", "vi_tr", "psi_mr", "psi_tr", "betas",
                     "uvw", "pqr", "euler", "xyz")


@struct.dataclass
class HeliState:
    vi_mr: jnp.ndarray   # ()  main-rotor induced inflow [ft/s]
    vi_tr: jnp.ndarray   # ()  tail-rotor induced inflow [ft/s]
    psi_mr: jnp.ndarray  # ()  main-rotor azimuth [rad]
    psi_tr: jnp.ndarray  # ()  tail-rotor azimuth [rad]
    betas: jnp.ndarray   # (2,) TPP tilt angles [rad]
    uvw: jnp.ndarray     # (3,) body-frame velocity [ft/s]
    pqr: jnp.ndarray     # (3,) body rates [rad/s]
    euler: jnp.ndarray   # (3,) roll/pitch/yaw [rad]
    xyz: jnp.ndarray     # (3,) NED position [ft]

    @classmethod
    def zeros(cls, dtype=jnp.float32) -> "HeliState":
        z = lambda *s: jnp.zeros(s, dtype)
        return cls(vi_mr=z(), vi_tr=z(), psi_mr=z(), psi_tr=z(),
                   betas=z(2), uvw=z(3), pqr=z(3), euler=z(3), xyz=z(3))

    # Fields stored as per-env scalars (expanded to width 1 when flattening,
    # batched or not).
    _SCALAR_FIELDS = ("vi_mr", "vi_tr", "psi_mr", "psi_tr")

    def flatten(self) -> jnp.ndarray:
        """(..., 18)-vector in the reference's registration order."""
        parts = []
        for f in HELI_STATE_FIELDS:
            v = jnp.asarray(getattr(self, f))
            parts.append(v[..., None] if f in self._SCALAR_FIELDS else v)
        return jnp.concatenate(parts, axis=-1)

    @classmethod
    def unflatten(cls, vec) -> "HeliState":
        vec = jnp.asarray(vec)
        return cls(vi_mr=vec[..., 0], vi_tr=vec[..., 1],
                   psi_mr=vec[..., 2], psi_tr=vec[..., 3],
                   betas=vec[..., 4:6], uvw=vec[..., 6:9],
                   pqr=vec[..., 9:12], euler=vec[..., 12:15],
                   xyz=vec[..., 15:18])


@struct.dataclass
class WindState:
    """Dryden turbulence filter states (wind_dynamics.py:39-42)."""
    us: jnp.ndarray  # ()  longitudinal filter state
    vs: jnp.ndarray  # (2,) lateral filter states
    ws: jnp.ndarray  # (2,) vertical filter states

    @classmethod
    def zeros(cls, dtype=jnp.float32) -> "WindState":
        return cls(us=jnp.zeros((), dtype), vs=jnp.zeros(2, dtype), ws=jnp.zeros(2, dtype))


def tree_add_scaled(state, dots, h: float):
    """state + dots * h, elementwise over the pytree (RK4 stage arithmetic)."""
    return jax.tree_util.tree_map(lambda s, d: s + d * h, state, dots)


def tree_rk4_combine(state, k1, k2, k3, k4, dt: float):
    """The reference's exact RK4 combination and float op order
    (dynamics.py:168): state + (((k1 + k2*2) + k3*2) + k4) * (1/6 * dt)."""
    c = 0.16666666666666666 * dt
    return jax.tree_util.tree_map(
        lambda s, a, b, cc, d: s + (((a + b * 2.0) + cc * 2.0) + d) * c,
        state, k1, k2, k3, k4)
