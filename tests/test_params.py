"""Derived-parameter parity vs reference precalculations (SURVEY.md §2.3)."""
import numpy as np
import pytest

from heligym_tpu.models import load_params

pytestmark = pytest.mark.quick  # ~2-minute smoke tier: pytest -m quick


@pytest.fixture(scope="module")
def p():
    return load_params("aw109")


def test_main_rotor_derived(fixtures, p):
    f = fixtures("params")
    for key, ours in [("MR.OMEGA", p.MR.OMEGA), ("MR.V_TIP", p.MR.V_TIP),
                      ("MR.FR", p.MR.FR), ("MR.SOL", p.MR.SOL),
                      ("MR.A_SIGMA", p.MR.A_SIGMA),
                      ("MR.GAM_OM16_DRO", p.MR.GAM_OM16_DRO),
                      ("MR.DL_DB1", p.MR.DL_DB1),
                      ("MR.DL_DA1_DRO", p.MR.DL_DA1_DRO),
                      ("MR.COEF_TH", p.MR.COEF_TH),
                      ("MR.H", p.MR.H), ("MR.D", p.MR.D)]:
        np.testing.assert_allclose(ours, float(f[key]), rtol=1e-12, err_msg=key)


def test_tail_rotor_derived(fixtures, p):
    f = fixtures("params")
    for key, ours in [("TR.OMEGA", p.TR.OMEGA), ("TR.V_TIP", p.TR.V_TIP),
                      ("TR.FR", p.TR.FR), ("TR.SOL", p.TR.SOL),
                      ("TR.COEF_TH", p.TR.COEF_TH),
                      ("TR.H", p.TR.H), ("TR.D", p.TR.D)]:
        np.testing.assert_allclose(ours, float(f[key]), rtol=1e-12, err_msg=key)


def test_arms(fixtures, p):
    f = fixtures("params")
    for grp, obj in [("FUS", p.FUS), ("HT", p.HT), ("VT", p.VT), ("WN", p.WN)]:
        np.testing.assert_allclose(obj.H, float(f[f"{grp}.H"]), rtol=1e-12)
        np.testing.assert_allclose(obj.D, float(f[f"{grp}.D"]), rtol=1e-12)


def test_mass_inertia(fixtures, p):
    f = fixtures("params")
    np.testing.assert_allclose(p.HELI.M, float(f["HELI.M"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.HELI.I), f["HELI.I"], rtol=0)
    np.testing.assert_allclose(np.asarray(p.HELI.IINV), f["HELI.IINV"], rtol=0)


def test_gear_positions(fixtures, p):
    f = fixtures("params")
    np.testing.assert_allclose(np.asarray(p.LG.LOC), f["LG.LOC"], rtol=0)
