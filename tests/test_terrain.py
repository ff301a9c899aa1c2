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


def test_committed_heights_in_dynamics_fixture(fixtures):
    f = fixtures("dynamics")
    p = load_params("aw109")
    terr = T.load_terrain(p.ENV)
    xyz = f["states"][:, 15:18].astype(np.float32)
    heights = jax.jit(lambda x, y: T.ground_height(terr, x, y))(xyz[:, 0], xyz[:, 1])
    np.testing.assert_allclose(np.asarray(heights), f["heights"], atol=2e-2)
