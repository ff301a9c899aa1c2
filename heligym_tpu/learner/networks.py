"""Actor-critic networks for continuous helicopter control.

Flax MLPs sized for the 17-dim observation / 4-dim action interface
(reference spaces: helicopter.py:56-57). Observations are scaled by fixed
physical normalizers so the network sees O(1) inputs; the scales derive from
rotor radius/gravity exactly like the reward normalizers (helicopter.py:63-68).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def obs_scales(params) -> np.ndarray:
    """Fixed per-component observation scales (power, velocities, angles,
    rates, positions, altitudes)."""
    v = float(np.sqrt(2.0 * params.MR.R * params.ENV.GRAV))
    x = 2.0 * params.MR.R
    return np.asarray(
        [1000.0,                      # power [hp]
         v, v, v,                     # uvw air
         v, v, v,                     # ned vel
         1.0, 1.0, np.pi,             # euler
         1.0, 1.0, 1.0,               # pqr
         x * 10, x * 10, 5000.0, 5000.0],  # positions/altitudes
        dtype=np.float32)


class ActorCritic(nn.Module):
    """Shared-input, separate-torso Gaussian policy + value function.

    `log_std_init` sets the initial exploration scale: the helicopter is an
    unstable plant, so exp(-0.5)=0.6 full-range control noise destroys the
    trim within a second; hover/landing training uses -1.0 to -1.5 so early
    episodes survive long enough to see the success signal."""
    action_dim: int = 4
    hidden: Sequence[int] = (256, 256)
    log_std_init: float = -0.5

    @nn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = obs
        a = x
        for h in self.hidden:
            a = nn.tanh(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)))(a))
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01))(a)
        log_std = self.param("log_std",
                             nn.initializers.constant(self.log_std_init),
                             (self.action_dim,))
        c = x
        for h in self.hidden:
            c = nn.tanh(nn.Dense(h, kernel_init=nn.initializers.orthogonal(np.sqrt(2)))(c))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(c)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(-0.5 * ((action - mean) ** 2 / var)
                   - log_std - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
