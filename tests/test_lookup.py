"""JSBSim-style lookup-table parity (stateless vs the reference's cached walk)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heligym_tpu.ops.dryden import _TEP_DATA
from heligym_tpu.ops.lookup import Table, table_lookup_1d, table_lookup_2d

pytestmark = pytest.mark.quick  # ~2-minute smoke tier: pytest -m quick


def test_tep_table_data(fixtures):
    f = fixtures("lookup")
    np.testing.assert_array_equal(_TEP_DATA, f["table"])


def test_tep_2d_values(fixtures):
    f = fixtures("lookup")
    data = jnp.asarray(f["table"])
    fn = jax.jit(lambda r, c: table_lookup_2d(data, r, c))
    for i, r in enumerate(f["rows"]):
        for j, c in enumerate(f["cols"]):
            got = float(fn(jnp.float32(r), jnp.float32(c)))
            np.testing.assert_allclose(got, f["vals"][i, j], rtol=1e-5, atol=1e-5,
                                       err_msg=f"row={r} col={c}")


def test_1d_interp_and_edge_bug():
    # mirror of the reference doc example (lookup.py:19-38)
    t = Table(3)
    t << 5 << 3 << 6 << 4 << 8 << 10
    assert abs(float(table_lookup_1d(t.data, 7.2)) - 7.6) < 1e-5
    # low clamp -> first value
    assert float(table_lookup_1d(t.data, 1.0)) == 3.0
    # high clamp reproduces the reference bug: returns the last KEY (8), not 10
    assert float(table_lookup_1d(t.data, 99.0)) == 8.0
