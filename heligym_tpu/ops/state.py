"""Simulation state pytrees — fully scalarized for TPU.

The reference packs 18 scalars into one flat float32 vector with named slices
(/root/reference/heligym/envs/dynamics/dynamics.py:75-128). Here every physical
scalar is its own pytree leaf of shape () — batched to (B,) by construction,
NOT by `jax.vmap`:

* every op in the dynamics is elementwise over the batch, so the same code is
  batch-polymorphic for single envs, vectorized envs, and inside Pallas
  kernels (where the batch lives on the 128-wide lane axis);
* XLA sees no size-3 stacks/slices (which previously fragmented the step into
  ~72 small fusions via pad/slice chains);
* RK4 stage arithmetic stays a `tree_map`.

Convenience properties (`uvw`, `pqr`, `euler`, `xyz`, `betas`) provide stacked
views for non-hot consumers (renderers, tests, checkpoint inspection).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# Flattening order of the 18-dim state vector, matching the reference's
# registration order (helicopter_dynamics.py:55-64).
HELI_STATE_FIELDS = ("vi_mr", "vi_tr", "psi_mr", "psi_tr", "b0", "b1",
                     "u", "v", "w", "p", "q", "r",
                     "phi", "theta", "psi", "x", "y", "z")


@struct.dataclass
class HeliState:
    vi_mr: jnp.ndarray   # main-rotor induced inflow [ft/s]
    vi_tr: jnp.ndarray   # tail-rotor induced inflow [ft/s]
    psi_mr: jnp.ndarray  # main-rotor azimuth [rad]
    psi_tr: jnp.ndarray  # tail-rotor azimuth [rad]
    b0: jnp.ndarray      # TPP tilt a (longitudinal flap) [rad]
    b1: jnp.ndarray      # TPP tilt b (lateral flap) [rad]
    u: jnp.ndarray       # body-frame velocities [ft/s]
    v: jnp.ndarray
    w: jnp.ndarray
    p: jnp.ndarray       # body rates [rad/s]
    q: jnp.ndarray
    r: jnp.ndarray
    phi: jnp.ndarray     # Euler angles [rad]
    theta: jnp.ndarray
    psi: jnp.ndarray
    x: jnp.ndarray       # NED position [ft]
    y: jnp.ndarray
    z: jnp.ndarray

    @classmethod
    def zeros(cls, batch=(), dtype=jnp.float32) -> "HeliState":
        zv = jnp.zeros(batch, dtype)
        return cls(**{f: zv for f in HELI_STATE_FIELDS})

    # -- stacked views (non-hot-path convenience) -------------------------
    @property
    def betas(self):
        return jnp.stack([self.b0, self.b1], axis=-1)

    @property
    def uvw(self):
        return jnp.stack([self.u, self.v, self.w], axis=-1)

    @property
    def pqr(self):
        return jnp.stack([self.p, self.q, self.r], axis=-1)

    @property
    def euler(self):
        return jnp.stack([self.phi, self.theta, self.psi], axis=-1)

    @property
    def xyz(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def flatten(self) -> jnp.ndarray:
        """(..., 18)-vector in the reference's registration order."""
        return jnp.stack([getattr(self, f) for f in HELI_STATE_FIELDS], axis=-1)

    @classmethod
    def unflatten(cls, vec) -> "HeliState":
        vec = jnp.asarray(vec)
        return cls(**{f: vec[..., i] for i, f in enumerate(HELI_STATE_FIELDS)})

    def rows(self) -> jnp.ndarray:
        """(18, ...) row-major packing (components on the leading axis),
        the layout the fused Pallas kernel uses."""
        return jnp.stack([getattr(self, f) for f in HELI_STATE_FIELDS], axis=0)

    @classmethod
    def from_rows(cls, rows) -> "HeliState":
        return cls(**{f: rows[i] for i, f in enumerate(HELI_STATE_FIELDS)})


WIND_STATE_FIELDS = ("us", "vs0", "vs1", "ws0", "ws1")


@struct.dataclass
class WindState:
    """Dryden turbulence filter states (wind_dynamics.py:39-42), scalarized."""
    us: jnp.ndarray
    vs0: jnp.ndarray
    vs1: jnp.ndarray
    ws0: jnp.ndarray
    ws1: jnp.ndarray

    @classmethod
    def zeros(cls, batch=(), dtype=jnp.float32) -> "WindState":
        zv = jnp.zeros(batch, dtype)
        return cls(**{f: zv for f in WIND_STATE_FIELDS})

    @property
    def vs(self):
        return jnp.stack([self.vs0, self.vs1], axis=-1)

    @property
    def ws(self):
        return jnp.stack([self.ws0, self.ws1], axis=-1)

    def rows(self) -> jnp.ndarray:
        return jnp.stack([getattr(self, f) for f in WIND_STATE_FIELDS], axis=0)

    @classmethod
    def from_rows(cls, rows) -> "WindState":
        return cls(**{f: rows[i] for i, f in enumerate(WIND_STATE_FIELDS)})


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
