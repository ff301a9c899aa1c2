"""Terrain heightmap lookup parity, including the reference's clamp quirks."""
import jax
import numpy as np
import pytest

from heligym_tpu.models import load_params
from heligym_tpu.ops import terrain as T

pytestmark = pytest.mark.quick  # ~2-minute smoke tier: pytest -m quick


def test_ground_height_matches_reference(fixtures):
    f = fixtures("terrain")
    p = load_params("aw109")
    terr = T.load_terrain(p.ENV)
    heights = jax.jit(lambda x, y: T.ground_height(terr, x, y))(
        np.asarray(f["x"], np.float32), np.asarray(f["y"], np.float32))
    # reference computes in float64 from the same uint16 raw data; our float32
    # map is within ~1e-3 ft at 8.8k ft scale
    np.testing.assert_allclose(np.asarray(heights), f["h"], atol=2e-2)


def test_packed_table_bit_exact():
    """The packed-texel fast path (ONE slice gather) must be bit-identical to
    the three-element-gather path over random positions, including the map
    edges and the out-of-map clamp region."""
    p = load_params("aw109")
    terr = T.load_terrain(p.ENV)
    rng = np.random.default_rng(0)
    span = max(terr.ns_max, terr.ew_max)
    x = rng.uniform(-0.7 * span, 0.7 * span, 4096).astype(np.float32)
    y = rng.uniform(-0.7 * span, 0.7 * span, 4096).astype(np.float32)
    # force edge / clamp coverage
    x[:8] = [-span, span, 0.0, span / 2 - 1.0, -span / 2, span / 2, 1e7, -1e7]
    y[:8] = [span, -span, span / 2 - 1.0, 0.0, -span / 2, span / 2, -1e7, 1e7]
    base = jax.jit(lambda x, y, hm: T.ground_height(terr, x, y, hmap=hm))
    h_map = base(x, y, terr.hmap.reshape(-1))
    h_packed = base(x, y, terr.packed)
    np.testing.assert_array_equal(np.asarray(h_map), np.asarray(h_packed))
    # scalar (unbatched) form through the packed path
    h0 = jax.jit(lambda: T.ground_height(terr, x[0], y[0], hmap=terr.packed))()
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h_map)[0])


def test_committed_heights_in_dynamics_fixture(fixtures):
    f = fixtures("dynamics")
    p = load_params("aw109")
    terr = T.load_terrain(p.ENV)
    xyz = f["states"][:, 15:18].astype(np.float32)
    heights = jax.jit(lambda x, y: T.ground_height(terr, x, y))(xyz[:, 0], xyz[:, 1])
    np.testing.assert_allclose(np.asarray(heights), f["heights"], atol=2e-2)
