"""Per-force/moment-term parity vs reference `_calc_*_fm` outputs
(SURVEY.md §4 item 2), including stall/wake/downwash branch coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.models import load_params
from heligym_tpu.ops import aero, rotor

RTOL = 3e-5
ATOL = 2e-2   # forces are O(1e3..1e4) lbf; this is ~1e-6 relative at scale


@pytest.fixture(scope="module")
def p():
    return load_params("aw109")


def _batch(fn):
    return jax.jit(jax.vmap(fn))


def test_main_rotor(fixtures, p):
    f = fixtures("terms")
    fn = _batch(lambda rho, coll, lon, lat, betas, uvw_air, pqr, vi:
                rotor.main_rotor(p, rho, coll, lon, lat, betas, uvw_air, pqr, vi))
    force, moment, power, betas_dot, vi_dot, _ = fn(
        jnp.asarray(f["rho"], jnp.float32), jnp.asarray(f["coll"], jnp.float32),
        jnp.asarray(f["lon"], jnp.float32), jnp.asarray(f["lat"], jnp.float32),
        jnp.asarray(f["betas"]), jnp.asarray(f["uvw_air"]),
        jnp.asarray(f["pqr"]), jnp.asarray(f["vi_mr"]))
    np.testing.assert_allclose(force, f["mr_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(moment, f["mr_moment"], rtol=RTOL, atol=0.5)
    np.testing.assert_allclose(power, f["mr_power"], rtol=1e-4, atol=50.0)
    np.testing.assert_allclose(betas_dot, f["mr_betas_dot"], rtol=RTOL, atol=1e-3)
    np.testing.assert_allclose(vi_dot[:, None], f["mr_vi_dot"], rtol=RTOL, atol=1e-3)


def test_tail_rotor(fixtures, p):
    f = fixtures("terms")
    fn = _batch(lambda rho, pedal, uvw_air, pqr, vi:
                rotor.tail_rotor(p, rho, pedal, uvw_air, pqr, vi))
    force, moment, power, vi_dot, _ = fn(
        jnp.asarray(f["rho"], jnp.float32), jnp.asarray(f["pedal"], jnp.float32),
        jnp.asarray(f["uvw_air"]), jnp.asarray(f["pqr"]),
        jnp.asarray(f["vi_tr"]))
    np.testing.assert_allclose(force, f["tr_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(moment, f["tr_moment"], rtol=RTOL, atol=0.2)
    np.testing.assert_allclose(power, f["tr_power"], rtol=1e-4, atol=20.0)
    np.testing.assert_allclose(vi_dot[:, None], f["tr_vi_dot"], rtol=RTOL, atol=1e-3)


def test_fuselage(fixtures, p):
    f = fixtures("terms")
    fn = _batch(lambda rho, uvw_air, vi: aero.fuselage(p, rho, uvw_air, vi))
    force, moment, power = fn(jnp.asarray(f["rho"], jnp.float32),
                              jnp.asarray(f["uvw_air"]), jnp.asarray(f["vi_mr"]))
    np.testing.assert_allclose(force, f["fus_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(moment, f["fus_moment"], rtol=RTOL, atol=0.5)
    np.testing.assert_allclose(power, f["fus_power"], rtol=1e-4, atol=50.0)


def test_horizontal_tail(fixtures, p):
    f = fixtures("terms")
    fn = _batch(lambda rho, uvw_air, pqr, vi: aero.horizontal_tail(p, rho, uvw_air, pqr, vi))
    force, moment = fn(jnp.asarray(f["rho"], jnp.float32), jnp.asarray(f["uvw_air"]),
                       jnp.asarray(f["pqr"]), jnp.asarray(f["vi_mr"]))
    np.testing.assert_allclose(force, f["ht_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(moment, f["ht_moment"], rtol=RTOL, atol=0.5)


def test_vertical_tail(fixtures, p):
    f = fixtures("terms")
    fn = _batch(lambda rho, uvw_air, pqr, vi: aero.vertical_tail(p, rho, uvw_air, pqr, vi))
    force, moment = fn(jnp.asarray(f["rho"], jnp.float32), jnp.asarray(f["uvw_air"]),
                       jnp.asarray(f["pqr"]), jnp.asarray(f["vi_tr"]))
    np.testing.assert_allclose(force, f["vt_force"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(moment, f["vt_moment"], rtol=RTOL, atol=0.5)


def test_branch_coverage(fixtures, p):
    """The fixture set must actually exercise both sides of each branch."""
    f = fixtures("terms")
    u = f["uvw_air"][:, 0]
    assert (np.abs(u) > p.HELI.VTRANS).any() and (np.abs(u) <= p.HELI.VTRANS).any()
    # stall branch proxies: enough spread in w and v components
    assert (np.abs(f["uvw_air"][:, 2]) > 0.3 * np.abs(u)).any()
    assert (np.abs(f["uvw_air"][:, 2]) <= 0.3 * np.abs(u)).any()
