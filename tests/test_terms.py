"""Per-force/moment-term parity vs reference `_calc_*_fm` outputs
(SURVEY.md §4 item 2), including stall/wake/downwash branch coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.models import load_params
from heligym_tpu.ops import aero, rotor

pytestmark = pytest.mark.quick  # ~2-minute smoke tier: pytest -m quick

RTOL = 3e-5
ATOL = 2e-2   # forces are O(1e3..1e4) lbf; this is ~1e-6 relative at scale


@pytest.fixture(scope="module")
def p():
    return load_params("aw109")


def _tup(arr):
    """(N, k) fixture array -> k-tuple of (N,) components (the physics'
    batch-polymorphic calling convention — no vmap needed)."""
    arr = jnp.asarray(arr)
    return tuple(arr[:, i] for i in range(arr.shape[1]))


def _stack(t):
    return np.stack([np.asarray(c) for c in t], axis=-1)


def test_main_rotor(fixtures, p):
    f = fixtures("terms")
    betas = jnp.asarray(f["betas"])
    force, moment, power, b0_dot, b1_dot, vi_dot, _ = jax.jit(
        lambda: rotor.main_rotor(
            p, jnp.asarray(f["rho"], jnp.float32),
            jnp.asarray(f["coll"], jnp.float32), jnp.asarray(f["lon"], jnp.float32),
            jnp.asarray(f["lat"], jnp.float32), betas[:, 0], betas[:, 1],
            _tup(f["uvw_air"]), _tup(f["pqr"]), jnp.asarray(f["vi_mr"])))()
    np.testing.assert_allclose(_stack(force), f["mr_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_stack(moment), f["mr_moment"], rtol=RTOL, atol=0.5)
    np.testing.assert_allclose(power, f["mr_power"], rtol=1e-4, atol=50.0)
    np.testing.assert_allclose(_stack((b0_dot, b1_dot)), f["mr_betas_dot"],
                               rtol=RTOL, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vi_dot)[:, None], f["mr_vi_dot"],
                               rtol=RTOL, atol=1e-3)


def test_tail_rotor(fixtures, p):
    f = fixtures("terms")
    force, moment, power, vi_dot, _ = jax.jit(
        lambda: rotor.tail_rotor(
            p, jnp.asarray(f["rho"], jnp.float32),
            jnp.asarray(f["pedal"], jnp.float32),
            _tup(f["uvw_air"]), _tup(f["pqr"]), jnp.asarray(f["vi_tr"])))()
    np.testing.assert_allclose(_stack(force), f["tr_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_stack(moment), f["tr_moment"], rtol=RTOL, atol=0.2)
    np.testing.assert_allclose(power, f["tr_power"], rtol=1e-4, atol=20.0)
    np.testing.assert_allclose(np.asarray(vi_dot)[:, None], f["tr_vi_dot"],
                               rtol=RTOL, atol=1e-3)


def test_fuselage(fixtures, p):
    f = fixtures("terms")
    force, moment, power = jax.jit(
        lambda: aero.fuselage(p, jnp.asarray(f["rho"], jnp.float32),
                              _tup(f["uvw_air"]), jnp.asarray(f["vi_mr"])))()
    np.testing.assert_allclose(_stack(force), f["fus_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_stack(moment), f["fus_moment"], rtol=RTOL, atol=0.5)
    np.testing.assert_allclose(power, f["fus_power"], rtol=1e-4, atol=50.0)


def test_horizontal_tail(fixtures, p):
    f = fixtures("terms")
    force, moment = jax.jit(
        lambda: aero.horizontal_tail(p, jnp.asarray(f["rho"], jnp.float32),
                                     _tup(f["uvw_air"]), _tup(f["pqr"]),
                                     jnp.asarray(f["vi_mr"])))()
    np.testing.assert_allclose(_stack(force), f["ht_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_stack(moment), f["ht_moment"], rtol=RTOL, atol=0.5)


def test_vertical_tail(fixtures, p):
    f = fixtures("terms")
    force, moment = jax.jit(
        lambda: aero.vertical_tail(p, jnp.asarray(f["rho"], jnp.float32),
                                   _tup(f["uvw_air"]), _tup(f["pqr"]),
                                   jnp.asarray(f["vi_tr"])))()
    np.testing.assert_allclose(_stack(force), f["vt_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_stack(moment), f["vt_moment"], rtol=RTOL, atol=0.5)


def test_branch_coverage(fixtures, p):
    """The fixture set must actually exercise both sides of each branch."""
    f = fixtures("terms")
    u = f["uvw_air"][:, 0]
    assert (np.abs(u) > p.HELI.VTRANS).any() and (np.abs(u) <= p.HELI.VTRANS).any()
    # stall branch proxies: enough spread in w and v components
    assert (np.abs(f["uvw_air"][:, 2]) > 0.3 * np.abs(u)).any()
    assert (np.abs(f["uvw_air"][:, 2]) <= 0.3 * np.abs(u)).any()
