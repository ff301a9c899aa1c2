"""Rigid-body kinematics as scalar-explicit expressions over tuple vectors.

TPU-first design note: the reference materializes 3x3 numpy matrices and
multiplies them (/root/reference/heligym/envs/dynamics/kinematic.py:3-29).
Batched 3x3 matmuls waste the 128x128 MXU (padding 3 -> 128), and stacked
vec3 arrays fragment XLA fusions with pad/slice chains — so here vectors are
plain 3-tuples of (batched) scalars and matrices are 3x3 nested tuples. Every
operation is elementwise on the VPU lanes, batch-polymorphic, and legal inside
Pallas kernels.
"""
import jax.numpy as jnp


def euler_to_rotmat(phi, theta, psi):
    """ZYX Euler angles -> earth-to-body DCM rows.

    Same matrix as reference kinematic.py:3-20 (R = Rx(phi) Ry(theta) Rz(psi)),
    written out symbolically.
    """
    s0, s1, s2 = jnp.sin(phi), jnp.sin(theta), jnp.sin(psi)
    c0, c1, c2 = jnp.cos(phi), jnp.cos(theta), jnp.cos(psi)
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
    numpy's small-dot evaluation order. Returns a 3-tuple."""
    return (
        m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
        m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
        m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2],
    )


def pqr_to_eulerdot(phi, theta, p, q, r):
    """Euler-angle rates from body rates (reference kinematic.py:22-29 matrix
    applied to pqr), expanded; the zero entries are dropped symbolically."""
    s0, s1 = jnp.sin(phi), jnp.sin(theta)
    c0, c1 = jnp.cos(phi), jnp.cos(theta)
    phi_dot = p + (s0 * s1 / c1) * q + (c0 * s1 / c1) * r
    theta_dot = c0 * q + (-s0) * r
    psi_dot = (s0 / c1) * q + (c0 / c1) * r
    return phi_dot, theta_dot, psi_dot
