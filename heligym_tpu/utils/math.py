"""Small math helpers (jnp, single-env scalar semantics; batch via jax.vmap).

Behavioral parity targets: /root/reference/heligym/envs/dynamics/utils.py
"""
import jax.numpy as jnp
import numpy as np


def pi_bound(x):
    """Wrap angle(s) to (-pi, pi].  Matches reference utils.py:3-4.

    Uses the same `(x + pi) % (2 pi) - pi` formulation; jnp.mod has the same
    sign semantics as numpy's `%`.
    """
    return (x + np.pi) % (2.0 * np.pi) - np.pi


def cross(a, b):
    """3-vector cross product over tuple vectors, component order matching
    reference utils.py:6-14. Returns a 3-tuple of (batched) scalars."""
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )
