"""Live view / memory / callback outputs (reference Qt GUI + pyOutput_t +
memoryIO_t analogs, see core_tpu/gui.py)."""
import urllib.request

import numpy as np

from core_tpu.scenes import cornell_box
from core_tpu.render import render_image, RenderOptions
from core_tpu.gui import MemoryOutput, CallbackOutput, LiveView


def _tiny_scene():
    return cornell_box(resx=16, resy=16, light_samples=1, with_blocks=False)


def test_memory_output_receives_flushes():
    scene = _tiny_scene()
    out = MemoryOutput(16, 16)
    img, _ = render_image(scene, RenderOptions(aa_samples=2, spp_chunk=1),
                          on_flush=out)
    np.testing.assert_array_equal(out.image, np.asarray(img))
    v = out.view(2, 3, 10, 9)
    assert v.shape == (6, 8, 4) and v.base is out.image


def test_callback_output_draw_area():
    scene = _tiny_scene()
    calls = []
    out = CallbackOutput(draw_area=lambda x0, y0, w, h, tile:
                         calls.append((x0, y0, w, h, tile.shape)))
    render_image(scene, RenderOptions(aa_samples=2, spp_chunk=1),
                 on_flush=out)
    assert len(calls) == 2              # one per sample chunk
    assert calls[0][:4] == (0, 0, 16, 16)


def test_liveview_serves_png_and_abort():
    view = LiveView(port=0)
    port = view.start()
    try:
        view(np.zeros((8, 8, 4), np.float32), 0, 1)   # push a frame
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read()
        assert b"frame.png" in page
        # pause toggles the cooperative Y_SIG_PAUSE analog
        urllib.request.urlopen(f"http://127.0.0.1:{port}/pause",
                               timeout=10).read()
        assert view.paused
        urllib.request.urlopen(f"http://127.0.0.1:{port}/pause",
                               timeout=10).read()
        assert not view.paused
        urllib.request.urlopen(f"http://127.0.0.1:{port}/abort",
                               timeout=10).read()
        assert view.aborted
    finally:
        view.stop()


def test_interface_render_with_output():
    from core_tpu.interface import Interface
    yi = Interface()
    yi.params_clear()
    yi.params_set_string("type", "shinydiffusemat")
    yi.params_set_color("color", 0.7, 0.7, 0.7)
    yi.create_material("m")
    yi.start_geometry()
    yi.start_tri_mesh()
    a = yi.add_vertex(-1, -1, 0)
    b = yi.add_vertex(1, -1, 0)
    c = yi.add_vertex(0, 1, 0)
    yi.set_current_material("m")
    yi.add_triangle(a, b, c)
    yi.end_tri_mesh()
    yi.end_geometry()
    yi.params_clear()
    yi.params_set_string("type", "pointlight")
    yi.params_set_point("from", 0, 0, 2)
    yi.params_set_color("color", 1, 1, 1)
    yi.params_set_float("power", 5)
    yi.create_light("l")
    yi.params_clear()
    yi.params_set_string("type", "perspective")
    yi.params_set_point("from", 0, 0, 3)
    yi.params_set_point("to", 0, 0, 0)
    yi.params_set_point("up", 0, 1, 3)
    yi.params_set_int("resx", 12)
    yi.params_set_int("resy", 12)
    yi.create_camera("cam")
    yi.params_clear()
    yi.params_set_string("type", "directlighting")
    yi.create_integrator("surf")
    yi.params_clear()
    yi.params_set_string("type", "none")
    yi.create_integrator("vol")
    yi.setup_render(camera_name="cam", integrator_name="surf",
                    volintegrator_name="vol", AA_minsamples=1,
                    width=12, height=12)
    out = MemoryOutput(12, 12)
    img = yi.render(output=out)
    assert img.shape == (12, 12, 4)
    np.testing.assert_array_equal(out.image, img)
