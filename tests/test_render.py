"""Renderer tests: the native software rasterizer (headless C++) and the
numpy fallback both produce valid frames from EnvState."""
import numpy as np
import pytest

from heligym_tpu.render import get_renderer
from heligym_tpu.render.topdown import NumpyTopDownRenderer


def _reset_state(hover_env, hover_trim):
    import jax
    es, _ = hover_env.reset_from_trim(hover_trim, jax.random.PRNGKey(0))
    return es


def test_topdown_renderer(hover_env, hover_trim):
    es = _reset_state(hover_env, hover_trim)
    r = NumpyTopDownRenderer(hover_env)
    frame = r.render(es)
    assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.uint8
    r.close()


def test_native_renderer(hover_env, hover_trim):
    from heligym_tpu.render.native_api import NativeRenderer, native_available
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    es = _reset_state(hover_env, hover_trim)
    r = NativeRenderer(hover_env, 320, 240)
    frame = r.render(es)
    assert frame.shape == (240, 320, 3)
    # scene content: sky at top, terrain below -> nontrivial color variety
    assert len(np.unique(frame.reshape(-1, 3), axis=0)) > 50
    # HUD text drawn in the top-left corner
    assert (frame[:80, :180] >= 220).all(axis=-1).any()
    # a second render with moved state produces a different frame
    es2 = es.replace(heli=es.heli.replace(
        x=es.heli.x + 500.0, z=es.heli.z - 200.0))
    frame2 = r.render(es2)
    assert (frame != frame2).any()
    r.close()


def test_factory_prefers_native(hover_env):
    r = get_renderer(hover_env)
    assert r is not None
