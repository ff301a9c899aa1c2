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
    `keys` is the padded column/row of length n+1 whose entries 1..n are real."""
    idx = jnp.searchsorted(keys[1:], key, side="left") + 1
    return jnp.clip(idx, 2, n)


def table_lookup_1d(data, key):
    n = data.shape[0] - 1
    r = _bracket(data[:, 0], key, n)
    span = data[r, 0] - data[r - 1, 0]
    factor = jnp.where(span != 0.0, (key - data[r - 1, 0]) / jnp.where(span != 0.0, span, 1.0), 1.0)
    factor = jnp.minimum(factor, 1.0)
    value = factor * (data[r, 1] - data[r - 1, 1]) + data[r - 1, 1]
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
    r_factor = jnp.clip((row_key - data[r - 1, 0]) / (data[r, 0] - data[r - 1, 0]), 0.0, 1.0)
    c_factor = jnp.clip((col_key - data[0, c - 1]) / (data[0, c] - data[0, c - 1]), 0.0, 1.0)
    col1 = r_factor * (data[r, c - 1] - data[r - 1, c - 1]) + data[r - 1, c - 1]
    col2 = r_factor * (data[r, c] - data[r - 1, c]) + data[r - 1, c]
    return col1 + c_factor * (col2 - col1)
