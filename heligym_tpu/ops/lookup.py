"""JSBSim-style clamped linear-interpolation tables, stateless and jittable.

Parity target: /root/reference/heligym/envs/dynamics/lookup.py. The reference
table keeps a last-index cache (lines 117-183) purely as a CPU optimization;
its bracketing loops converge to the same index regardless of the cached start,
so a stateless searchsorted reproduces the results exactly. The 1D high-end
clamp bug (returning the last *key* instead of the last value, line 125) is
reproduced for behavioral parity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class Table:
    """Dense (nRows+1, nCols+1) table; row 0 holds column keys, column 0 holds
    row keys, cell [0,0] unused. Build with `Table.from_rows` or `<<` fill."""

    def __init__(self, n_rows: int = 1, n_cols: int = 1):
        assert isinstance(n_rows, int) and isinstance(n_cols, int)
        assert n_rows > 0 and n_cols > 0
        self._n_rows, self._n_cols = n_rows, n_cols
        if n_cols == 1:
            self._row_counter, self._col_counter = 1, 0
        else:
            self._row_counter, self._col_counter = 0, 1
        self._data = np.zeros((n_rows + 1, n_cols + 1), dtype=np.float32)

    def __lshift__(self, value):
        assert self._row_counter <= self._n_rows, "table overfull"
        self._data[self._row_counter][self._col_counter] = np.float32(value)
        if self._col_counter >= self._n_cols:
            self._col_counter = 0
            self._row_counter += 1
        else:
            self._col_counter += 1
        return self

    @property
    def data(self) -> jnp.ndarray:
        return jnp.asarray(self._data)

    def get_value_1d(self, key):
        return table_lookup_1d(self.data, key)

    def get_value_2d(self, row_key, col_key):
        return table_lookup_2d(self.data, row_key, col_key)


def _bracket(keys, key, n):
    """Smallest index r in [2, n] (into the padded table) with keys[r] >= key.
    `keys` is the padded column/row of length n+1 whose entries 1..n are real.
    Computed as a mask count (not searchsorted) so it also lowers inside
    Pallas/Mosaic kernels."""
    idx = jnp.sum((keys[1:] < key).astype(jnp.int32)) + 1
    return jnp.clip(idx, 2, n)


def _pick(vec, idx):
    """vec[idx] for a traced scalar idx without a gather op (mask-sum over the
    tiny table dimension) — Mosaic-safe, bit-identical selection."""
    ids = jnp.arange(vec.shape[0])
    return jnp.sum(jnp.where(ids == idx, vec, 0.0))


def table_lookup_1d(data, key):
    n = data.shape[0] - 1
    r = _bracket(data[:, 0], key, n)
    keys_col = data[:, 0]
    vals_col = data[:, 1]
    d_r0, d_r1 = _pick(keys_col, r), _pick(keys_col, r - 1)
    v_r0, v_r1 = _pick(vals_col, r), _pick(vals_col, r - 1)
    span = d_r0 - d_r1
    factor = jnp.where(span != 0.0, (key - d_r1) / jnp.where(span != 0.0, span, 1.0), 1.0)
    factor = jnp.minimum(factor, 1.0)
    value = factor * (v_r0 - v_r1) + v_r1
    # Reference edge handling (lookup.py:120-125), including the high-end bug
    # where the last KEY (column 0) is returned instead of the last value.
    value = jnp.where(key <= data[1, 0], data[1, 1], value)
    value = jnp.where(key >= data[n, 0], data[n, 0], value)
    return value


def table_lookup_2d(data, row_key, col_key):
    n_rows = data.shape[0] - 1
    n_cols = data.shape[1] - 1
    r = _bracket(data[:, 0], row_key, n_rows)
    c = _bracket(data[0, :], col_key, n_cols)
    # mask-based 2D cell selection (Mosaic-safe; identical values to indexing)
    rids = jnp.arange(data.shape[0])[:, None]
    cids = jnp.arange(data.shape[1])[None, :]

    def cell(ri, ci):
        return jnp.sum(jnp.where((rids == ri) & (cids == ci), data, 0.0))

    rk0, rk1 = _pick(data[:, 0], r), _pick(data[:, 0], r - 1)
    ck0, ck1 = _pick(data[0, :], c), _pick(data[0, :], c - 1)
    r_factor = jnp.clip((row_key - rk1) / (rk0 - rk1), 0.0, 1.0)
    c_factor = jnp.clip((col_key - ck1) / (ck0 - ck1), 0.0, 1.0)
    d_rc = cell(r, c)
    d_rc1 = cell(r, c - 1)
    d_r1c = cell(r - 1, c)
    d_r1c1 = cell(r - 1, c - 1)
    col1 = r_factor * (d_rc1 - d_r1c1) + d_r1c1
    col2 = r_factor * (d_rc - d_r1c) + d_r1c
    return col1 + c_factor * (col2 - col1)
