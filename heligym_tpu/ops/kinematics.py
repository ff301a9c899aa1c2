"""Rigid-body kinematics as scalar-explicit expressions.

TPU-first design note: the reference materializes 3x3 numpy matrices and
multiplies them (/root/reference/heligym/envs/dynamics/kinematic.py:3-29).
Batched 3x3 matmuls waste the 128x128 MXU (padding 3 -> 128), so here every
rotation is expanded to scalar products that run on the VPU lanes and fuse into
the surrounding elementwise graph under vmap. Matrices are represented as
3-tuples of 3-tuples of (batched) scalars.
"""
import jax.numpy as jnp


def euler_to_rotmat(euler):
    """ZYX Euler angles -> earth-to-body DCM rows.

    Same matrix as reference kinematic.py:3-20 (R = Rx(phi) Ry(theta) Rz(psi)),
    written out symbolically.
    """
    s0, s1, s2 = jnp.sin(euler[0]), jnp.sin(euler[1]), jnp.sin(euler[2])
    c0, c1, c2 = jnp.cos(euler[0]), jnp.cos(euler[1]), jnp.cos(euler[2])
    return (
        (c1 * c2, c1 * s2, -s1),
        (s0 * s1 * c2 - c0 * s2, s0 * s1 * s2 + c0 * c2, s0 * c1),
        (c0 * s1 * c2 + s0 * s2, c0 * s1 * s2 - s0 * c2, c0 * c1),
    )


def transpose_rows(m):
    return (
        (m[0][0], m[1][0], m[2][0]),
        (m[0][1], m[1][1], m[2][1]),
        (m[0][2], m[1][2], m[2][2]),
    )


def matvec(m, v):
    """m @ v with explicit left-to-right accumulation ((a+b)+c), matching
    numpy's small-dot evaluation order, returning a stacked 3-vector."""
    return jnp.stack([
        m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
        m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
        m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2],
    ], axis=-1)


def pqr_to_eulerdot_mat(euler):
    """Body-rate to Euler-rate matrix rows (reference kinematic.py:22-29)."""
    s0, s1 = jnp.sin(euler[0]), jnp.sin(euler[1])
    c0, c1 = jnp.cos(euler[0]), jnp.cos(euler[1])
    one = jnp.ones_like(s0)
    zero = jnp.zeros_like(s0)
    return (
        (one, s0 * s1 / c1, c0 * s1 / c1),
        (zero, c0, -s0),
        (zero, s0 / c1, c0 / c1),
    )
