"""Device meshes and sharding helpers for the env farm and learner.

TPU-native distribution design (SURVEY.md §2.4): envs are sharded along an
`env` mesh axis; the step function is purely elementwise over that axis, so
partitioning it is communication-free — XLA inserts collectives only where the
learner reduces across envs (`psum` under `shard_map`, or automatically under
jit with replicated parameters). Multi-host runs use `jax.distributed` +
the same NamedSharding code; single-host tests simulate the mesh with
`--xla_force_host_platform_device_count`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-op when running single-process (the
    common local/test case)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_env_mesh(devices: Optional[Sequence[jax.Device]] = None,
                  axis_name: str = ENV_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, env axis only."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_train_mesh(n_env: Optional[int] = None, n_model: int = 1,
                    devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D (env, model) mesh for learner configurations that additionally
    shard network state; `n_model=1` degenerates to the env-only layout."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_env is None:
        n_env = len(devices) // n_model
    arr = np.asarray(devices).reshape(n_env, n_model)
    return Mesh(arr, (ENV_AXIS, "model"))


def env_sharding(mesh: Mesh, axis_name: str = ENV_AXIS) -> NamedSharding:
    """Sharding that splits the leading (env) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(es, mesh: Mesh, axis_name: str = ENV_AXIS):
    """Place a batched EnvState pytree with its leading axis split over the
    mesh's env axis (all leaves, including the (B, ...) snapshot)."""
    sh = env_sharding(mesh, axis_name)
    return jax.device_put(es, sh)
