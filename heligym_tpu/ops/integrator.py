"""Fixed-step RK4 integrators over state pytrees.

Parity target: /root/reference/heligym/envs/dynamics/dynamics.py:158-171.

Two variants exist on purpose:

* `rk4` — the true RK4 the helicopter dynamics get (the reference deep-copies
  its dots container, helicopter_dynamics.py:402, so its four stage slopes are
  independent).

* `rk4_k4only` — the integrator the *wind* dynamics actually get in the
  reference: `WindDynamics.dynamics` writes into and returns the shared
  `self.state_dots` object (wind_dynamics.py:86), so by the time the RK4
  combination runs, k1..k3 alias k4 and the update degenerates to
  `state += (((k4 + 2 k4) + 2 k4) + k4) * (dt/6)` with k4 evaluated at the
  nested stage point. We reproduce that exact arithmetic (including the
  intermediate float32 roundings of the aliased sum) for trajectory parity.
"""
import jax

from .state import tree_add_scaled, tree_rk4_combine
from ..utils.constants import RK4_SIXTH


def rk4(f, state, dt: float):
    """One true RK4 step.

    `f(state) -> (dots, aux)`; aux is taken from the k4 stage (the reference
    computes observations there, dynamics.py:167).
    Returns (new_state, k4_dots, aux_k4).
    """
    k1, _ = f(state)
    k2, _ = f(tree_add_scaled(state, k1, 0.5 * dt))
    k3, _ = f(tree_add_scaled(state, k2, 0.5 * dt))
    k4, aux = f(tree_add_scaled(state, k3, dt))
    new_state = tree_rk4_combine(state, k1, k2, k3, k4, dt)
    return new_state, k4, aux


def rk4_k4only(f, state, dt: float):
    """The reference wind integrator: RK4 stage nesting, but the combination
    collapses onto k4 because of the dots-aliasing quirk (see module docs)."""
    k1, _ = f(state)
    k2, _ = f(tree_add_scaled(state, k1, 0.5 * dt))
    k3, _ = f(tree_add_scaled(state, k2, 0.5 * dt))
    k4, aux = f(tree_add_scaled(state, k3, dt))
    c = RK4_SIXTH * dt
    new_state = jax.tree_util.tree_map(
        lambda s, d: s + (((d + d * 2.0) + d * 2.0) + d) * c, state, k4)
    return new_state, k4, aux
