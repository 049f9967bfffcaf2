"""IES light, bg-portal light, SkyVolume, GridVolume factory, XML writer.

Covers the remaining SURVEY §2.7/§2.10/§2.11/§2.13 rows: photometric IES
profiles (iesLight.cc + iesUtils.h), background portals
(bgportallight.cc), atmosphere volume (SkyVolume.cc / SkyIntegrator.cc),
and the XML-writing exporter interface (xmlinterface.cc).
"""
import io

import numpy as np
import jax.numpy as jnp

IES_SAMPLE = """IESNA:LM-63-1995
[TEST] demo
TILT=NONE
1 1000.0 1.0 5 1 1 2 0.0 0.0 0.0
1.0 1.0 100.0
0.0 45.0 90.0 135.0 180.0
0.0
1000.0 800.0 400.0 100.0 0.0
"""


def test_ies_parse_and_light():
    from core_tpu.lights.ies import parse_ies, make_ies_light, illuminate
    v, prof = parse_ies(IES_SAMPLE)
    assert len(v) == 5 and prof[0] == 1.0 and prof[-1] == 0.0
    light = make_ies_light(pos=(0, 0, 2), to=(0, 0, 0),
                           color=(1, 1, 1), power=10.0, ies_text=IES_SAMPLE)
    from core_tpu.types import SurfacePoints
    n = 8
    p = jnp.stack([jnp.linspace(-2, 2, n), jnp.zeros(n), jnp.zeros(n)], -1)
    up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    z = jnp.zeros(n, jnp.int32)
    sp = SurfacePoints(p=p, n=up, ng=up, nu=up, nv=up,
                       uv=jnp.zeros((n, 2)), mat=z, light=z - 1, prim=z,
                       obj=z)
    ls = illuminate(light, sp)
    col = np.asarray(ls.col)
    assert np.all(np.isfinite(col))
    # directly below the light (angle 0) must be brighter than off-axis
    assert col[n // 2].mean() > col[0].mean()


def test_bg_portal_light_samples_background():
    from core_tpu.lights.portal import make_bg_portal_light
    from core_tpu.lights import base as lb
    from core_tpu.backgrounds import make_constant_background
    from core_tpu.types import SurfacePoints
    bg = make_constant_background((2.0, 1.0, 0.5))
    verts = np.array([[0, 0, 2], [1, 0, 2], [1, 1, 2], [0, 1, 2]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    light = make_bg_portal_light(verts, tris, bg, power=1.0)
    n = 4
    p = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (n, 1))
    up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    z = jnp.zeros(n, jnp.int32)
    sp = SurfacePoints(p=p, n=up, ng=up, nu=up, nv=up,
                       uv=jnp.zeros((n, 2)), mat=z, light=z - 1, prim=z,
                       obj=z)
    s1 = jnp.asarray([0.1, 0.4, 0.6, 0.9])
    ls = lb.illum_sample(light, sp, s1, s1)
    col = np.asarray(ls.col)
    assert np.all(np.isfinite(col)) and np.all(np.asarray(ls.valid))
    # portal radiance is the background color
    np.testing.assert_allclose(col[0] / col[0][2], [4.0, 2.0, 1.0], rtol=1e-5)


def test_sky_volume_march():
    from core_tpu.volumes.regions import make_sky_volume, phase_hg
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.volume import VolumeOptions
    import dataclasses
    vol = make_sky_volume(s_ray=0.002, s_mie=0.0005,
                          bmin=(-50, -50, -50), bmax=(600, 600, 600))
    # Rayleigh tint: blue channel scatters strongest
    ss = np.asarray(vol.s_s)
    assert ss[2] > ss[0]
    # phase: Rayleigh-Mie blend integrates positive and is finite
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    ph = phase_hg(vol, d, -d)
    assert np.isfinite(float(ph[0])) and float(ph[0]) > 0
    scene = cornell_box(resx=16, resy=16, light_samples=1,
                        with_blocks=False, intersector="brute")
    scene = dataclasses.replace(scene, volumes=(vol,))
    img, _ = render_image(scene, RenderOptions(
        volume_opts=VolumeOptions(integrator="singlescatter", steps=4)))
    assert np.all(np.isfinite(np.asarray(img)))


def test_xml_writer_roundtrip(tmp_path):
    from core_tpu.io.xml_writer import XmlInterface
    from core_tpu.io.xml_loader import parse_xml_scene
    yi = XmlInterface()
    yi.params_set_string("type", "shinydiffusemat")
    yi.params_set_color("color", 0.7, 0.2, 0.1)
    yi.create_material("red")
    oid = yi.start_tri_mesh(has_uv=False)
    yi.set_current_material("red")
    for v in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]:
        yi.add_vertex(*v)
    yi.add_triangle(0, 1, 2)
    yi.add_triangle(0, 2, 3)
    yi.end_tri_mesh()
    yi.params_clear()
    yi.params_set_string("type", "arealight")
    yi.params_set_point("corner", 0.2, 0.2, 1.0)
    yi.params_set_point("point1", 0.8, 0.2, 1.0)
    yi.params_set_point("point2", 0.2, 0.8, 1.0)
    yi.params_set_float("power", 5.0)
    yi.create_light("lamp")
    # camera + integrator + render block
    yi.params_clear()
    yi.params_set_string("type", "perspective")
    yi.params_set_point("from", 0.5, 0.5, -3.0)
    yi.params_set_point("to", 0.5, 0.5, 0.0)
    yi.params_set_point("up", 0.5, 1.5, -3.0)
    yi.params_set_int("resx", 8)
    yi.params_set_int("resy", 8)
    yi.create_camera("cam")
    yi.params_clear()
    yi.params_set_string("type", "directlighting")
    yi.create_integrator("default")
    yi.params_clear()
    yi.params_set_int("AA_minsamples", 1)
    path = str(tmp_path / "scene.xml")
    text = yi.render(path)
    assert "<mesh" in text and "<material" in text
    # the written file parses back through the SAX loader
    scene, opts = parse_xml_scene(path)
    assert scene.geom.n_tris == 2
    assert len(scene.lights) == 1


def test_zbuffer_depth_ordering():
    from core_tpu.scenes import cornell_box
    from core_tpu.render import render_zbuffer
    scene = cornell_box(resx=16, resy=16, light_samples=1,
                        with_blocks=False, intersector="brute")
    z = np.asarray(render_zbuffer(scene, normalize=False))
    assert z.shape == (16, 16)
    center = z[8, 8]          # back wall (farther)
    edge = z[8, 1]            # side wall (nearer at grazing)
    assert np.isfinite(center) and center > 0
    zn = np.asarray(render_zbuffer(scene, normalize=True))
    assert zn.min() >= 0.0 and zn.max() <= 1.0
