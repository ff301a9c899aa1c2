"""Test configuration: force the CPU backend with 8 virtual devices.

Golden tests compare against reference CPU/NumPy fixtures, so they must run on
CPU for matching float behavior; distributed tests simulate an 8-device mesh on
the host (SURVEY.md §4 item 6). Must run before JAX initializes a backend.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def fixtures():
    """Lazy loader for the committed golden fixture archives."""
    cache = {}

    def load(name):
        if name not in cache:
            path = os.path.join(FIXTURE_DIR, name + ".npz")
            if not os.path.exists(path):
                pytest.skip(f"fixture {name}.npz missing; run tools/make_golden.py")
            cache[name] = np.load(path, allow_pickle=False)
        return cache[name]

    return load


@pytest.fixture(scope="session")
def hover_env():
    from heligym_tpu.envs import HeliEnv
    from heligym_tpu.envs.tasks import HoverTask
    return HeliEnv.build("aw109", task=HoverTask())


@pytest.fixture(scope="session")
def hover_trim(hover_env):
    return hover_env.trim_result()
