"""train.py helper samplers (pure CPU, no training)."""
import jax
import numpy as np
import pytest

from heligym_tpu.learner.train import (make_alt_band_sampler,
                                       make_yaw_band_sampler)


@pytest.mark.quick
def test_yaw_band_sampler():
    s = make_yaw_band_sampler(-3.0, 3.0, alt_band=(50.0, 150.0))
    c = s(jax.random.PRNGKey(0), 64)
    yaw = np.asarray(c["yaw"])
    alt = np.asarray(c["gr_alt"])
    assert (-3.0 <= yaw).all() and (yaw <= 3.0).all()
    assert yaw.std() > 0.5                      # actually spread
    assert (50.0 <= alt).all() and (alt <= 150.0).all()
    # without an alt band the default trim altitude is used
    c2 = make_yaw_band_sampler(0.0, 1.0)(jax.random.PRNGKey(1), 4)
    np.testing.assert_array_equal(np.asarray(c2["gr_alt"]),
                                  np.full(4, 100.0))


@pytest.mark.quick
def test_alt_band_sampler():
    c = make_alt_band_sampler(6.0, 55.0)(jax.random.PRNGKey(2), 64)
    alt = np.asarray(c["gr_alt"])
    assert (6.0 <= alt).all() and (alt <= 55.0).all()
    assert len(np.unique(alt.round(1))) > 10
