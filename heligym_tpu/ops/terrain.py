"""Terrain heightmap: device-resident array + gather-based planar interpolation.

Parity target: /root/reference/heligym/envs/dynamics/helicopter_dynamics.py:167-201.
The reference's exact clamp/indexing behavior is reproduced, including its two
quirks, because the landing-gear and crash logic are sensitive to them:
  * the y-clamp uses shape[0] (line 182) — harmless on the square 1024^2 map;
  * the interpolation factors use the *decremented* edge indices (lines 189-194).

TPU design: the map lives in HBM as a float32 (H, W) array; each env performs 3
dynamic gathers per call. Under vmap the three gathers become one batched
gather, which XLA lowers efficiently; the map is replicated per device.
"""
from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets")


@dataclasses.dataclass(frozen=True)
class Terrain:
    """Static terrain data. `hmap` is a jnp (H, W) float32 array of heights [ft]."""
    hmap: jnp.ndarray
    normal: jnp.ndarray     # (H, W, 3) float32 unit normals (viewer/analysis use)
    ns_max: float           # [ft] north-south span
    ew_max: float           # [ft] east-west span

    def __hash__(self):            # allow closure capture in jit-static contexts
        return hash((id(self.hmap), self.ns_max, self.ew_max))

    def __eq__(self, other):
        return self is other


def load_terrain(env, asset_dir: str = _ASSET_DIR) -> Terrain:
    """Load the heightmap asset and scale it like the reference does
    (helicopter_dynamics.py:39-44): raw/uint_max * MAX_GR_ALT, computed in
    float64 then narrowed to float32 for the device array."""
    path = os.path.join(asset_dir, env.HMAP_PATH if env.HMAP_PATH.endswith(".npz")
                        else "terrain.npz")
    with np.load(path) as z:
        hmap_raw = z["hmap_raw"]
        nmap_raw = z["nmap_raw"]
    hmap = (hmap_raw / np.iinfo(hmap_raw.dtype).max) * env.MAX_GR_ALT
    nmap = nmap_raw / np.iinfo(nmap_raw.dtype).max
    nmap = nmap / np.sqrt((nmap ** 2 + 1e-4).sum(axis=-1, keepdims=True))
    return Terrain(hmap=jnp.asarray(hmap, dtype=jnp.float32),
                   normal=jnp.asarray(nmap, dtype=jnp.float32),
                   ns_max=env.NS_MAX, ew_max=env.EW_MAX)


def flat_terrain(env, height: float = 0.0, size: int = 64) -> Terrain:
    """Constant-height terrain (for the minimal end-to-end slice and tests)."""
    hmap = jnp.full((size, size), float(height), dtype=jnp.float32)
    normal = jnp.zeros((size, size, 3), dtype=jnp.float32).at[..., 2].set(1.0)
    return Terrain(hmap=hmap, normal=normal, ns_max=env.NS_MAX, ew_max=env.EW_MAX)


def ground_height(terrain: Terrain, x, y) -> jnp.ndarray:
    """Terrain height [ft] under NED position (x, y) — reference lines 167-195.
    Batch-polymorphic: scalar or (B,) coordinates."""
    hmap = terrain.hmap
    h, w = hmap.shape
    x_scale = terrain.ns_max / h     # ft per pixel, north-south
    y_scale = terrain.ew_max / w     # ft per pixel, east-west

    x_loc = x / x_scale + h // 2
    y_loc = y / y_scale + w // 2
    # Clamp into the map. NB: the y-clamp uses shape[0], replicating the
    # reference's quirk at line 182 (equal for square maps).
    x_loc = jnp.clip(x_loc, 0.0, float(h - 1))
    y_loc = jnp.clip(y_loc, 0.0, float(h - 1))

    x_ind = jnp.floor(x_loc).astype(jnp.int32)
    y_ind = jnp.floor(y_loc).astype(jnp.int32)

    middle = hmap[y_ind, x_ind]
    # Edge back-off before sampling the forward neighbors (lines 189-190); the
    # interpolation factors below intentionally use the decremented indices.
    x_ind = jnp.where(x_ind == h - 1, h - 2, x_ind)
    y_ind = jnp.where(y_ind == w - 1, w - 2, y_ind)
    north = hmap[y_ind, x_ind + 1]
    east = hmap[y_ind + 1, x_ind]

    return (middle
            + (north - middle) * (x_loc - x_ind.astype(x_loc.dtype))
            + (east - middle) * (y_loc - y_ind.astype(y_loc.dtype)))


def ground_touching_altitude(params, terrain: Terrain, x, y) -> jnp.ndarray:
    """Sea-level altitude at which the CG touches ground (reference lines 200-201)."""
    return ground_height(terrain, x, y) + params.HELI.WL_CG / 12.0
