"""Terrain heightmap: device-resident array + gather-based planar interpolation.

Parity target: /root/reference/heligym/envs/dynamics/helicopter_dynamics.py:167-201.
The reference's exact clamp/indexing behavior is reproduced, including its two
quirks, because the landing-gear and crash logic are sensitive to them:
  * the y-clamp uses shape[0] (line 182) — harmless on the square 1024^2 map;
  * the interpolation factors use the *decremented* edge indices (lines 189-194).

TPU design: the map lives in HBM as a float32 (H, W) array; each env performs 3
dynamic gathers per call. Under vmap the three gathers become one batched
gather, which XLA lowers efficiently; the map is replicated per device.

PERFORMANCE CRITICAL — pass the map through jit ARGUMENTS, not closures: a
large array captured as a jitted-function constant is re-materialized on every
`lax.scan`/`while_loop` iteration that reads it (measured 106 us/step for a
4 MB map at 4096 envs on v5e — ~500x the cost of the gather itself, which is
0.2 us/step when the same map enters as a jit argument). Every hot-path
function here therefore accepts `hmap=...` explicitly; `terrain.hmap` is only
the fallback for cold paths (reset, trim, tests).
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets")


@dataclasses.dataclass(frozen=True)
class Terrain:
    """Static terrain data. `hmap` is a jnp (H, W) float32 array of heights [ft].

    `packed` is the gather-optimized view: row i = y*W+x holds the exact three
    texels `ground_height` needs at cell (y, x) — (middle, north, east), with
    the reference's edge-decrement quirk pre-applied — so the per-step lookup
    is ONE (1,3)-slice gather instead of three element gathers (2x cheaper on
    v5e; see `ground_height`)."""
    hmap: jnp.ndarray
    normal: jnp.ndarray     # (H, W, 3) float32 unit normals (viewer/analysis use)
    ns_max: float           # [ft] north-south span
    ew_max: float           # [ft] east-west span
    packed: jnp.ndarray = None   # (H*W, 3) float32 texel table

    def __hash__(self):            # allow closure capture in jit-static contexts
        return hash((id(self.hmap), self.ns_max, self.ew_max))

    def __eq__(self, other):
        return self is other


def _pack_texels(hmap_np: np.ndarray) -> np.ndarray:
    """(H*W, 3) float32: per cell the exact (middle, north, east) texels of
    `ground_height`'s sampling pattern, edge-decrement quirk included
    (reference helicopter_dynamics.py:186-194). Bit-exact copies of hmap."""
    h, w = hmap_np.shape
    y, x = np.mgrid[0:h, 0:w]
    # NB: mirrors ground_height exactly — x decrements against h, y against w
    # (the reference's shape[0] quirk; identical on the square maps shipped).
    x_d = np.where(x == h - 1, h - 2, x)
    y_d = np.where(y == w - 1, w - 2, y)
    return np.stack([hmap_np[y, x], hmap_np[y_d, x_d + 1],
                     hmap_np[y_d + 1, x_d]], axis=-1).reshape(h * w, 3)


def device_table(terrain: Terrain) -> jnp.ndarray:
    """The array hot loops must thread through their jit boundary and pass to
    `ground_height(..., hmap=...)` (see module docstring on why closures and
    in-loop reshapes are catastrophic on TPU)."""
    return terrain.packed


def prep_hmap_arg(terrain: Terrain, hmap=None) -> jnp.ndarray:
    """Normalize a caller-supplied heightmap argument for a hot loop: default
    to the packed texel table, and flatten a 2-D (H, W) map ONCE here — i.e.
    OUTSIDE any scan body (an in-loop reshape copies the full map every
    iteration; module docstring)."""
    if hmap is None:
        return terrain.packed
    if hmap.ndim == 2 and hmap.shape[-1] == 3:
        return hmap                   # already the packed texel table
    return hmap.reshape(-1)


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
    hmap32 = np.asarray(hmap, dtype=np.float32)
    return Terrain(hmap=jnp.asarray(hmap32),
                   normal=jnp.asarray(nmap, dtype=jnp.float32),
                   ns_max=env.NS_MAX, ew_max=env.EW_MAX,
                   packed=jnp.asarray(_pack_texels(hmap32)))


def flat_terrain(env, height: float = 0.0, size: int = 64) -> Terrain:
    """Constant-height terrain (for the minimal end-to-end slice and tests)."""
    hmap32 = np.full((size, size), float(height), dtype=np.float32)
    normal = jnp.zeros((size, size, 3), dtype=jnp.float32).at[..., 2].set(1.0)
    return Terrain(hmap=jnp.asarray(hmap32), normal=normal,
                   ns_max=env.NS_MAX, ew_max=env.EW_MAX,
                   packed=jnp.asarray(_pack_texels(hmap32)))


def _take_pib(flat, idx):
    """Single-index element gather, flat table, PROMISE_IN_BOUNDS.

    This exact formulation matters enormously on TPU: 2-D fancy indexing
    (`hmap[y_ind, x_ind]`) lowers to a gather that costs ~70 us per call at
    4096 envs inside a scan, while a pre-flattened index with an in-bounds
    promise lowers to the fast path at <1 us (measured on v5e; the callers'
    clamps guarantee the promise)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(flat, idx[..., None], dnums, slice_sizes=(1,),
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _take_row3(table, idx):
    """One (1, 3)-slice gather from the packed texel table: all three texels
    of a cell in a single op. Measured ~70 us/step at 4096 envs on v5e vs
    ~135 us for three element gathers — the gather count, not the bytes, is
    what the TPU pays for."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(idx.ndim,), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    out = jax.lax.gather(table, idx[..., None], dnums, slice_sizes=(1, 3),
                         mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out[..., 0], out[..., 1], out[..., 2]


def ground_height(terrain: Terrain, x, y, hmap=None) -> jnp.ndarray:
    """Terrain height [ft] under NED position (x, y) — reference lines 167-195.
    Batch-polymorphic: scalar or (B,) coordinates.

    `hmap` overrides `terrain.hmap` with an argument-plumbed device array —
    REQUIRED for hot loops (see module docstring). Accepted forms:
      * `terrain.packed` (H*W, 3) — the fast path: ONE slice gather per env
        (what `device_table()` returns; hot loops should pass this);
      * the (H, W) map or its row-major flattened (H*W,) form — three element
        gathers. A 2-D form must NOT cross into a scan body: reshaping it
        inside the loop copies the full map EVERY iteration (~100 us/step for
        the 4 MB map on v5e)."""
    h, w = terrain.hmap.shape        # static grid geometry
    hmap = terrain.hmap if hmap is None else hmap
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

    # All flat indices below are provably in [0, h*w) given the clamps (and
    # the edge back-off for the neighbor samples), honoring PROMISE_IN_BOUNDS.
    if hmap.ndim == 2 and hmap.shape == (h * w, 3):
        # packed texel table: the edge-decrement quirk is pre-applied per row
        middle, north, east = _take_row3(hmap, y_ind * w + x_ind)
        x_ind = jnp.where(x_ind == h - 1, h - 2, x_ind)
        y_ind = jnp.where(y_ind == w - 1, w - 2, y_ind)
    else:
        flat = hmap.reshape(-1)      # no-op when already flat
        middle = _take_pib(flat, y_ind * w + x_ind)
        # Edge back-off before sampling the forward neighbors (lines 189-190);
        # the interpolation factors below intentionally use the decremented
        # indices.
        x_ind = jnp.where(x_ind == h - 1, h - 2, x_ind)
        y_ind = jnp.where(y_ind == w - 1, w - 2, y_ind)
        north = _take_pib(flat, y_ind * w + (x_ind + 1))
        east = _take_pib(flat, (y_ind + 1) * w + x_ind)

    return (middle
            + (north - middle) * (x_loc - x_ind.astype(x_loc.dtype))
            + (east - middle) * (y_loc - y_ind.astype(y_loc.dtype)))


def ground_touching_altitude(params, terrain: Terrain, x, y, hmap=None) -> jnp.ndarray:
    """Sea-level altitude at which the CG touches ground (reference lines 200-201)."""
    return ground_height(terrain, x, y, hmap=hmap) + params.HELI.WL_CG / 12.0
