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


def test_native_shading_and_fog(hover_env, hover_trim):
    """Blinn-Phong + fog actually vary pixel intensity across the terrain
    (terrain_frag.fs:38-62 semantics): slopes facing the light must be
    brighter than slopes facing away, and far terrain must converge to the
    fog color."""
    from heligym_tpu.render.native_api import NativeRenderer, native_available
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    es = _reset_state(hover_env, hover_trim)
    r = NativeRenderer(hover_env, 320, 240)
    frame = r.render(es).astype(np.float32)
    # lower half of the image is terrain; shading + texture must produce a
    # broad luminance distribution, not flat vertex colors
    terrain = frame[140:, :, :]
    lum = terrain.mean(axis=-1)
    assert lum.std() > 10.0, f"terrain luminance too flat: std={lum.std():.2f}"
    # fog: the terrain adjacent to the horizon (far) must be closer to the
    # fog color (0.74, 0.35, 0.51)*255 than the terrain at the bottom (near)
    fog = np.array([0.74, 0.35, 0.51]) * 255.0
    far_err = np.abs(frame[150:160].reshape(-1, 3) - fog).mean()
    near_err = np.abs(frame[-20:].reshape(-1, 3) - fog).mean()
    assert far_err < near_err, (far_err, near_err)
    r.close()


def test_camera_controls(hover_env, hover_trim):
    """Fly-camera surface (reference camera.cpp:39-96): keyboard moves the
    position, mouse changes the view direction, scroll zooms the fov."""
    from heligym_tpu.render.native_api import NativeRenderer, native_available
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    es = _reset_state(hover_env, hover_trim)
    r = NativeRenderer(hover_env, 160, 120)
    frame = r.render(es)
    ren = r.renderer
    p0 = ren.get_camera_pos()
    ren.process_keyboard(ren.CAM_FORWARD, 1.0)
    p1 = ren.get_camera_pos()
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p0)) > 1.0  # 1.5 m/s
    ren.process_mouse(500.0, 0.0)
    ren.process_scroll(10.0)
    assert abs(ren.get_zoom() - 35.0) < 1e-4  # 45 - 10, camera.cpp:88-96
    # the moved camera is overwritten by the chase-cam on the next
    # env render (reference semantics: helicopter.py:175-177)
    frame2 = r.render(es)
    assert frame2.shape == frame.shape
    r.close()


def _pty_pair():
    import pty
    master, slave = pty.openpty()
    return master, slave


def _drain(fd) -> bytes:
    """Read everything currently buffered on a pty master."""
    import os
    import select
    out = b""
    while select.select([fd], [], [], 0.2)[0]:
        out += os.read(fd, 1 << 16)
    return out


def test_terminal_viewer_blit_and_keys(monkeypatch):
    """The human-mode terminal viewer (render/terminal_viewer.py): blits a
    frame as ANSI truecolor half blocks and decodes raw keystrokes — the
    tpu-native stand-in for the reference's GLFW window + mouse callbacks
    (gWindow.cpp:260-309)."""
    import os
    from heligym_tpu.render.terminal_viewer import TerminalViewer
    monkeypatch.setenv("COLUMNS", "40")
    monkeypatch.setenv("LINES", "12")
    master, slave = _pty_pair()
    v = TerminalViewer(out_fd=slave, in_fd=slave, fps=0.0)
    frame = np.zeros((64, 96, 3), np.uint8)
    frame[:32] = (40, 80, 200)   # "sky"
    frame[32:] = (90, 140, 60)   # "ground"
    v.show(frame)
    out = _drain(master)
    assert b"\x1b[38;2;40;80;200" in out          # top-pixel fg color
    assert "▀".encode() in out                     # half-block glyph
    os.write(master, b"w\x1b[Aq")                  # key, arrow-up, quit
    assert v.poll_keys() == ["w", "up", "q"]
    v.close()
    tail = _drain(master)
    assert b"\x1b[?1049l" in tail                  # alt screen restored
    os.close(master), os.close(slave)


def test_terminal_viewer_headless_raises():
    """A declared human mode with no TTY must fail LOUDLY (VERDICT r2 #4),
    not silently degrade to rgb_array."""
    import os
    from heligym_tpu.render.terminal_viewer import TerminalViewer
    r, w = os.pipe()   # a pipe is not a tty
    with pytest.raises(RuntimeError, match="TTY"):
        TerminalViewer(out_fd=w, in_fd=r)
    os.close(r), os.close(w)


def test_native_human_mode(hover_env, hover_trim, monkeypatch):
    """NativeRenderer honors render mode: 'human' pumps keys + blits to the
    viewer and returns None (gymnasium convention); unknown modes raise."""
    import os
    from heligym_tpu.render.native_api import (NativeRenderer, Renderer,
                                               native_available)
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    # pin the TERMINAL viewer path: on a workstation with a display the
    # X11 sink would take precedence (covered by test_x11_sink_*)
    monkeypatch.setattr(Renderer, "display_available", lambda self: False)
    monkeypatch.setenv("COLUMNS", "40")
    monkeypatch.setenv("LINES", "12")
    es = _reset_state(hover_env, hover_trim)
    r = NativeRenderer(hover_env, 160, 120)
    with pytest.raises(ValueError, match="render mode"):
        r.render(es, mode="ansi")
    # headless (pytest's stdout is not a tty): human must raise loudly
    with pytest.raises(RuntimeError, match="TTY"):
        r.render(es, mode="human")
    # with a pty attached: blits, pumps fly-cam keys, returns None
    master, slave = _pty_pair()
    r._ensure_viewer(out_fd=slave, in_fd=slave, fps=0.0)
    assert r.render(es, mode="human") is None
    assert b"\x1b[38;2;" in _drain(master)
    os.write(master, b"w")                  # fly-cam engages on first key
    p0 = r.renderer.get_camera_pos()
    assert r.render(es, mode="human") is None
    assert r._fly_cam
    p1 = r.renderer.get_camera_pos()
    assert np.linalg.norm(np.asarray(p1) - np.asarray(p0)) > 1e-4
    os.write(master, b"q")
    r.render(es, mode="human")
    assert r.viewer_quit
    r.close()
    os.close(master), os.close(slave)


def test_obj_mtl_texture_loading(tmp_path):
    """OBJ loader with MTL materials + diffuse textures (reference
    model.cpp:225-296, mesh.cpp:15-52): a textured quad renders its texture
    colors; the same quad without a material renders the flat default."""
    from heligym_tpu.render.native_api import Renderer, native_available
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    # 2x1 PPM: left texel green, right texel blue
    (tmp_path / "tex.ppm").write_bytes(b"P6\n2 1\n255\n" +
                                       bytes([0, 255, 0, 0, 0, 255]))
    (tmp_path / "quad.mtl").write_text(
        "newmtl skin\nKd 1 1 1\nmap_Kd tex.ppm\n")
    quad = ("v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
            "f 1/1 2/2 3/3 4/4\n")
    (tmp_path / "tex.obj").write_text("mtllib quad.mtl\nusemtl skin\n" + quad)
    (tmp_path / "flat.obj").write_text(quad)

    def render_one(name):
        r = Renderer(96, 96)
        m = r.create_model(abs_path=str(tmp_path / name))
        assert m, f"load_obj failed for {name}"
        r.add_permanent_object_to_window(m)
        r.set_camera_pos(0.0, 2.5, 0.0)   # NED: 2.5 m south of the quad
        r.look_at(0.0, 0.0, 0.0)
        r.render()
        frame = r.get_frame()
        r.terminate()
        return frame

    tex_frame = render_one("tex.obj").astype(int)
    flat_frame = render_one("flat.obj").astype(int)
    quad = (tex_frame != flat_frame).any(axis=-1)   # background is identical
    assert quad.any()
    # texture content on the quad: green-dominant AND blue-dominant pixels
    g = quad & (tex_frame[..., 1] > tex_frame[..., 0] + 40) \
        & (tex_frame[..., 1] > tex_frame[..., 2] + 40)
    b = quad & (tex_frame[..., 2] > tex_frame[..., 0] + 40) \
        & (tex_frame[..., 2] > tex_frame[..., 1] + 40)
    assert g.any() and b.any(), (int(g.sum()), int(b.sum()))
    # the flat quad is the untextured default red, never green-dominant
    fg = quad & (flat_frame[..., 1] > flat_frame[..., 0] + 40)
    assert not fg.any()


def test_procedural_heli_livery(hover_env, hover_trim):
    """The procedural heli goes through the same per-mesh texture path: its
    livery (white cheat line, dark canopy) must produce more distinct body
    colors than a flat-colored body would."""
    from heligym_tpu.render.native_api import NativeRenderer, native_available
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    es = _reset_state(hover_env, hover_trim)
    r = NativeRenderer(hover_env, 320, 240)
    frame = r.render(es)
    # near-white cheat-line pixels exist on screen away from the HUD area
    body = frame[90:, :]
    white = (body > 190).all(axis=-1)
    assert white.any(), "livery cheat line not visible"
    r.close()


@pytest.mark.quick
def test_x11_sink_entry_points(hover_env, hover_trim):
    """The OS-window presentation sink (render/native/x11sink.cpp — the
    reference's GLFW window role, gWindow.cpp:260-309) must always be
    PRESENT in the built library: libX11 is dlopen'd at runtime, so the
    entry points exist and report availability honestly on headless pods
    instead of failing to build/load."""
    from heligym_tpu.render.native_api import NativeRenderer, native_available
    if not native_available():
        pytest.skip("native renderer not built (no compiler?)")
    es = _reset_state(hover_env, hover_trim)
    r = NativeRenderer(hover_env, 160, 120)
    avail = r.renderer.display_available()
    assert avail in (True, False)
    if not avail:
        # headless: opening must fail with a diagnostic code, presenting
        # without a window reports -1, hiding is a no-op
        assert r.renderer.show_native_window() < 0
        assert r.renderer.present_native_window() == -1
        r.renderer.hide_native_window()
    else:
        # a display exists (workstation / Xvfb): full open-present-close
        assert r.renderer.show_native_window() == 0
        r.render(es)
        res = r.renderer.present_native_window()
        assert res >= 0 and not (res & 1)
        r.renderer.hide_native_window()
    r.close()


def test_x11_viewer_selection(hover_env, hover_trim, monkeypatch):
    """Human mode prefers the OS window when a display exists: with the
    native probe faked to succeed, _ensure_viewer must pick the
    _NativeWindowViewer and route camera-input/close flags back into the
    fly-cam handover and viewer_quit latch."""
    from heligym_tpu.render import native_api
    if not native_api.native_available():
        pytest.skip("native renderer not built (no compiler?)")
    monkeypatch.setattr(native_api.Renderer, "display_available",
                        lambda self: True)
    monkeypatch.setattr(native_api.Renderer, "show_native_window",
                        lambda self: 0)
    presents = []
    monkeypatch.setattr(native_api.Renderer, "present_native_window",
                        lambda self: presents.pop(0))
    monkeypatch.setattr(native_api.Renderer, "hide_native_window",
                        lambda self: None)
    es = _reset_state(hover_env, hover_trim)
    r = native_api.NativeRenderer(hover_env, 160, 120)
    presents.extend([0, 2, 1])
    assert r.render(es, mode="human") is None        # plain present
    assert isinstance(r._viewer, native_api._NativeWindowViewer)
    assert not r._fly_cam and not r.viewer_quit
    r.render(es, mode="human")                       # camera input seen
    assert r._fly_cam and not r.viewer_quit
    r.render(es, mode="human")                       # close requested
    assert r.viewer_quit
    r.close()
