"""Frontend tests: XML loader (reference schema), CLI, embedding API."""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest


CORNELL_XML = textwrap.dedent("""\
    <?xml version="1.0"?>
    <scene type="triangle">
    <material name="white">
        <type sval="shinydiffusemat"/>
        <color r="0.75" g="0.75" b="0.75"/>
    </material>
    <material name="red">
        <type sval="shinydiffusemat"/>
        <color r="0.63" g="0.06" b="0.05"/>
    </material>
    <material name="lightmat">
        <type sval="light_mat"/>
        <color r="1" g="1" b="1"/>
        <power fval="30"/>
    </material>
    <light name="top">
        <type sval="arealight"/>
        <corner x="343" y="548" z="227"/>
        <point1 x="343" y="548" z="332"/>
        <point2 x="213" y="548" z="227"/>
        <color r="1" g="1" b="1"/>
        <power fval="30"/>
        <samples ival="2"/>
    </light>
    <mesh id="0" vertices="8" faces="4">
        <p x="552.8" y="0" z="0"/>
        <p x="0" y="0" z="0"/>
        <p x="0" y="0" z="559.2"/>
        <p x="549.6" y="0" z="559.2"/>
        <p x="556" y="548.8" z="0"/>
        <p x="556" y="548.8" z="559.2"/>
        <p x="0" y="548.8" z="559.2"/>
        <p x="0" y="548.8" z="0"/>
        <set_material sval="white"/>
        <f a="0" b="1" c="2"/>
        <f a="0" b="2" c="3"/>
        <set_material sval="red"/>
        <f a="4" b="5" c="6"/>
        <f a="4" b="6" c="7"/>
    </mesh>
    <camera name="cam">
        <type sval="perspective"/>
        <from x="278" y="273" z="-800"/>
        <to x="278" y="273" z="0"/>
        <up x="278" y="274" z="-800"/>
        <resx ival="16"/>
        <resy ival="16"/>
        <focal fval="1.4"/>
    </camera>
    <background name="bg">
        <type sval="constant"/>
        <color r="0.1" g="0.1" b="0.15"/>
    </background>
    <integrator name="default">
        <type sval="directlighting"/>
        <raydepth ival="0"/>
    </integrator>
    <render>
        <AA_passes ival="1"/>
        <AA_minsamples ival="2"/>
        <filter_type sval="box"/>
        <gamma fval="1.0"/>
    </render>
    </scene>
""")


@pytest.fixture
def xml_file(tmp_path):
    p = tmp_path / "cornell.xml"
    p.write_text(CORNELL_XML)
    return str(p)


def test_xml_loader_parses_reference_schema(xml_file):
    from core_tpu.io.xml_loader import parse_xml_scene
    scene, opts = parse_xml_scene(xml_file)
    assert scene.geom.n_tris == 4
    assert len(scene.lights) == 1
    assert scene.materials.mtype.shape[0] == 3
    assert scene.camera.resx == 16
    assert opts.integrator == "directlight"
    assert opts.aa_samples == 2
    assert scene.background is not None

    from core_tpu.render import render_image
    img, _ = render_image(scene, opts)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01


def test_cli_renders_png(xml_file, tmp_path):
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env["JAX_PLATFORMS"] = ""   # let the subprocess auto-pick a backend
    r = subprocess.run(
        [sys.executable, "-m", "core_tpu", xml_file, out, "-f", "png",
         "--spp", "1"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out + ".png")
    from core_tpu.io.image import read_png
    img = read_png(out + ".png")
    assert img.shape[0] == 16 and img.shape[1] == 16


def test_embedding_interface():
    from core_tpu.interface import Interface
    yi = Interface()
    yi.params_set_string("type", "shinydiffusemat")
    yi.params_set_color("color", 0.7, 0.7, 0.7)
    yi.create_material("grey")
    yi.params_set_string("type", "pointlight")
    yi.params_set_point("from", 0.0, 2.0, 0.0)
    yi.params_set_color("color", 1, 1, 1)
    yi.params_set_float("power", 20.0)
    yi.create_light("lamp")
    yi.start_tri_mesh()
    yi.set_current_material("grey")
    a = yi.add_vertex(-2, 0, -2)
    b = yi.add_vertex(2, 0, -2)
    c = yi.add_vertex(2, 0, 2)
    d = yi.add_vertex(-2, 0, 2)
    yi.add_triangle(a, b, c)
    yi.add_triangle(a, c, d)
    yi.end_tri_mesh()
    yi.params_set_string("type", "perspective")
    yi.params_set_point("from", 0, 3, -6)
    yi.params_set_point("to", 0, 0, 0)
    yi.params_set_point("up", 0, 4, -6)
    yi.params_set_int("resx", 12)
    yi.params_set_int("resy", 12)
    yi.create_camera("cam")
    yi.setup_render(AA_minsamples=1)
    img = yi.render()
    assert img.shape == (12, 12, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.001   # the lit floor is visible
