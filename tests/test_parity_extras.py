"""Parity extras: strand curves, sphere objects, EXR codec, settings badge.

Reference features covered:
- curve meshes / strands  (scene_t::startCurveMesh/endCurveMesh,
  src/yafraycore/scene.cc:118-230)
- sphere primitive        (src/yafraycore/std_primitives.cc:33-90)
- EXR image I/O           (src/image_handlers/exrHandler.cc)
- render-settings badge   (imageFilm_t::drawRenderSettings,
  src/yafraycore/imagefilm.cc:660-842)
"""
import numpy as np
import pytest

from core_tpu.geometry.mesh import MeshAssembler


def test_curve_tessellation_counts():
    a = MeshAssembler()
    m = a.start_mesh()
    pts = [(0, 0, 0), (0, 0, 1), (0.1, 0, 2), (0.3, 0, 3)]
    a.add_curve(m, pts, mat=0, strand_start=0.05, strand_end=0.01)
    g = a.build()
    n = len(pts)
    # bottom cap + 6 per segment + top cap (reference scene.cc:138-230)
    assert g.n_tris == 1 + 6 * (n - 1) + 1
    assert np.asarray(g.verts).shape[0] == 3 * n


def test_curve_taper_radius():
    """strand_end < strand_start must shrink the extruded cross-section."""
    a = MeshAssembler()
    m = a.start_mesh()
    a.add_curve(m, [(0, 0, 0), (0, 0, 1), (0, 0, 2)], mat=0,
                strand_start=0.2, strand_end=0.02, strand_shape=0.0)
    v = np.asarray(a.build().verts)
    n = 3
    base_r = np.linalg.norm(v[n] - v[0])      # extruded offset at root
    tip_r = np.linalg.norm(v[n + 2 * (n - 1)] - v[n - 1])
    assert tip_r < base_r * 0.5


def test_curve_xml_roundtrip(tmp_path):
    xml = """<?xml version="1.0"?>
<scene type="triangle">
<material name="m"><type sval="shinydiffusemat"/>
  <color r="0.7" g="0.7" b="0.7"/></material>
<curve>
  <p x="0" y="0" z="0"/><p x="0" y="0" z="1"/><p x="0" y="0.2" z="2"/>
  <strand_start fval="0.05"/><strand_end fval="0.01"/>
  <strand_shape fval="0"/>
  <set_material sval="m"/>
</curve>
<light name="l"><type sval="pointlight"/>
  <from x="1" y="1" z="1"/><color r="1" g="1" b="1"/>
  <power fval="10"/></light>
<camera name="cam"><type sval="perspective"/>
  <from x="3" y="0" z="1"/><to x="0" y="0" z="1"/><up x="3" y="1" z="1"/>
  <resx ival="16"/><resy ival="16"/><focal fval="1.0"/></camera>
<integrator name="default"><type sval="directlighting"/></integrator>
<integrator name="volintegr"><type sval="none"/></integrator>
<render><camera_name sval="cam"/><integrator_name sval="default"/>
  <AA_minsamples ival="1"/><width ival="16"/><height ival="16"/>
</render>
</scene>"""
    f = tmp_path / "curve.xml"
    f.write_text(xml)
    from core_tpu.io.xml_loader import parse_xml_scene
    scene, opts = parse_xml_scene(str(f))
    assert scene.geom.n_tris == 1 + 6 * 2 + 1


def test_sphere_object_factory():
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap
    from core_tpu.materials.base import MaterialDef
    b = SceneBuilder()
    b.add_material("m", MaterialDef(name="m"))
    p = ParamMap()
    p["type"] = "sphere"
    p["center"] = (1.0, 2.0, 3.0)
    p["radius"] = 2.0
    p["material"] = "m"
    b.create("object", "ball", p)
    g = b.assembler.build()
    v = np.asarray(g.verts)
    r = np.linalg.norm(v - np.array([1.0, 2.0, 3.0]), axis=1)
    np.testing.assert_allclose(r, 2.0, rtol=1e-5)
    assert g.n_tris > 100
    assert bool(np.asarray(g.smooth).all())


def test_sphere_render_center_hit():
    """Camera ray through the sphere center must hit at distance d-r and
    shade with the analytic normal (-view dir)."""
    import jax.numpy as jnp
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap
    from core_tpu.materials.base import MaterialDef, build_material_table
    from core_tpu import scene as scene_mod
    from core_tpu.types import Rays

    b = SceneBuilder()
    b.add_material("m", MaterialDef(name="m"))
    p = ParamMap()
    p["type"] = "sphere"
    p["center"] = (0.0, 0.0, 5.0)
    p["radius"] = 1.0
    p["material"] = "m"
    b.create("object", "ball", p)
    geom = b.assembler.build()
    from core_tpu.scene import Scene
    sc = Scene(geom=geom, materials=build_material_table([MaterialDef(name="m")]),
               lights=(), camera=None, intersector="brute")
    rays = Rays(o=jnp.array([[0.0, 0, 0]]), d=jnp.array([[0.0, 0, 1]]),
                tmin=jnp.array([0.0]), tmax=jnp.array([-1.0]))
    hits = scene_mod.closest_hit(sc, rays)
    assert hits.prim[0] >= 0
    np.testing.assert_allclose(float(hits.t[0]), 4.0, atol=2e-3)
    sp = scene_mod.surface_points(sc, rays, hits)
    # interpolated vertex normals: error bounded by the tessellation step
    # (~pi/tess_v/2 = 0.05 rad)
    np.testing.assert_allclose(np.asarray(sp.n[0]), [0, 0, -1], atol=0.05)


def test_exr_roundtrip(tmp_path):
    from core_tpu.io.image import write_exr, read_exr
    img = np.random.default_rng(0).random((13, 29, 4)).astype(np.float32)
    f = str(tmp_path / "t.exr")
    write_exr(f, img, alpha=True)
    np.testing.assert_array_equal(read_exr(f), img)
    f3 = str(tmp_path / "t3.exr")
    write_exr(f3, img[..., :3])
    np.testing.assert_array_equal(read_exr(f3), img[..., :3])


def test_exr_via_write_image(tmp_path):
    from core_tpu.io.image import write_image, read_image
    img = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
    f = str(tmp_path / "img.exr")
    write_image(f, img)
    np.testing.assert_array_equal(read_image(f), img)


def test_badge_draws_text():
    from core_tpu.io.badge import draw_badge, badge_lines, text_mask
    img = np.zeros((64, 200, 3), np.float32)
    out = draw_badge(img, badge_lines("0.1.0", "pathtracing",
                                      "AA 1;64;64", 12.3))
    assert out.shape == img.shape
    assert (out[-20:] > 0.5).any()          # text pixels lit
    assert (out[:40] == 0).all()            # image area untouched
    assert text_mask("core_tpu 0.1.0").any()


def test_curve_writer_loader_roundtrip(tmp_path):
    """XmlInterface curve export parses back into the same tessellation."""
    import io
    from core_tpu.io.xml_writer import XmlInterface
    from core_tpu.io.xml_loader import parse_xml_scene
    x = XmlInterface()
    x.params_clear()
    x.params_set_string("type", "shinydiffusemat")
    x.params_set_color("color", 0.7, 0.7, 0.7)
    x.create_material("m")
    x.start_curve_mesh()
    for p in [(0, 0, 0), (0, 0, 1), (0, 0.2, 2)]:
        x.add_vertex(*p)
    x.end_curve_mesh("m", 0.05, 0.01, 0.0)
    x.params_clear()
    x.params_set_string("type", "pointlight")
    x.params_set_point("from", 1, 1, 1)
    x.params_set_color("color", 1, 1, 1)
    x.params_set_float("power", 5)
    x.create_light("l")
    x.params_clear()
    x.params_set_string("type", "perspective")
    x.params_set_point("from", 3, 0, 1)
    x.params_set_point("to", 0, 0, 1)
    x.params_set_point("up", 3, 1, 1)
    x.params_set_int("resx", 8)
    x.params_set_int("resy", 8)
    x.create_camera("cam")
    x.params_clear()
    x.params_set_string("type", "directlighting")
    x.create_integrator("surf")
    x.params_clear()
    x.params_set_string("type", "none")
    x.create_integrator("vol")
    # render-block params (written by render())
    x.params_clear()
    x.params_set_string("camera_name", "cam")
    x.params_set_string("integrator_name", "surf")
    x.params_set_string("volintegrator_name", "vol")
    x.params_set_int("width", 8)
    x.params_set_int("height", 8)
    f = tmp_path / "curve_rt.xml"
    x.render(str(f))
    scene, opts = parse_xml_scene(str(f))
    assert scene.geom.n_tris == 1 + 6 * 2 + 1
