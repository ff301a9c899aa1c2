"""Decoupled rendering: host-side consumers of streamed device state.

The reference couples a C++ OpenGL window into env construction
(/root/reference/heligym/envs/helicopter.py:70-84); here rendering is strictly
optional and outside the step path (SURVEY.md §7 item 7). Backends:

* `NumpyTopDownRenderer` — always-available fallback: shaded top-down view of
  the terrain heightmap with the helicopter pose overlaid (rgb_array mode).
* native C++ rasterizer (`heligym_tpu/render/native`) — loaded when built;
  provides the perspective 3D view and the ctypes API surface mirroring the
  reference renderer (py_api.h:17-90).
"""
from __future__ import annotations

from .topdown import NumpyTopDownRenderer

try:
    from .native_api import NativeRenderer, native_available
except Exception:  # pragma: no cover - native lib not built yet
    NativeRenderer, native_available = None, lambda: False


def get_renderer(core_env, prefer_native: bool = True, **native_kwargs):
    """Renderer factory: native rasterizer when built, numpy fallback otherwise.
    `native_kwargs` (camera_mode=..., width=...) reach the native renderer."""
    if prefer_native and native_available():
        return NativeRenderer(core_env, **native_kwargs)
    return NumpyTopDownRenderer(core_env)
