"""Model registry: named helicopter parameter sets.

The reference resolves `heli_name` to a YAML file at env construction
(/root/reference/heligym/envs/helicopter.py:49-51). Here the registry does the
same lookup against `heligym_tpu/models/*.yaml`, with user-registerable extra
search paths, and returns a fully precalculated frozen `HeliParams`.
"""
from __future__ import annotations

import functools
import os
from typing import List

import yaml

from .schema import HeliParams, precalculate

_MODEL_DIR = os.path.dirname(os.path.abspath(__file__))
_SEARCH_PATHS: List[str] = [_MODEL_DIR]


def register_model_path(path: str) -> None:
    """Add a directory to search for `<name>.yaml` model files."""
    if path not in _SEARCH_PATHS:
        _SEARCH_PATHS.insert(0, path)


def available_models() -> List[str]:
    names = []
    for d in _SEARCH_PATHS:
        if os.path.isdir(d):
            names += [f[:-5] for f in os.listdir(d) if f.endswith(".yaml")]
    return sorted(set(names))


@functools.lru_cache(maxsize=None)
def load_params(name: str = "aw109") -> HeliParams:
    """Load and precalculate the named model's parameters (cached)."""
    for d in _SEARCH_PATHS:
        path = os.path.join(d, name + ".yaml")
        if os.path.isfile(path):
            with open(path) as f:
                raw = yaml.safe_load(f)
            return precalculate(raw, name=name)
    raise FileNotFoundError(
        f"No model named {name!r}; searched {_SEARCH_PATHS}. "
        f"Available: {available_models()}")
