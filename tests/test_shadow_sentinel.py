"""Regression tests for the unbounded-shadow-ray sentinel (dist/t = -1).

BgLight and SunLight samples return dist=-1 meaning "open shadow ray to
infinity" (reference scene_t::isShadowed treats tmax < 0 as infinity).
Round-2 advice found the NEE t-cap gating in integrators/common.py turned
those lanes into dead rays, so sun/environment light leaked through all
geometry.  These tests pin the fix.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from core_tpu.mathutils import SHADOW_BIAS
from core_tpu.integrators.common import _shadow_tcap


def test_shadow_tcap_sentinels():
    valid = jnp.asarray([True, True, True, False, False])
    dist = jnp.asarray([-1.0, 10.0, 0.5 * SHADOW_BIAS, -1.0, 10.0],
                       jnp.float32)
    tcap = np.asarray(_shadow_tcap(valid, dist))
    # valid + dist<0 sentinel -> open ray (tcap <= 0 maps to BIG downstream)
    assert tcap[0] < 0.0
    # valid finite -> dist - bias
    np.testing.assert_allclose(tcap[1], 10.0 - SHADOW_BIAS, rtol=1e-6)
    # valid but closer than bias -> dead (empty interval, 0 < tcap <= bias)
    assert 0.0 < tcap[2] <= SHADOW_BIAS
    # invalid lanes -> dead regardless of dist
    assert 0.0 < tcap[3] <= SHADOW_BIAS
    assert 0.0 < tcap[4] <= SHADOW_BIAS


def _add_quad(a, m, p0, p1, p2, p3, mat):
    i0 = a.add_vertex(m, *p0)
    i1 = a.add_vertex(m, *p1)
    i2 = a.add_vertex(m, *p2)
    i3 = a.add_vertex(m, *p3)
    a.add_triangle(m, i0, i1, i2, mat)
    a.add_triangle(m, i0, i2, i3, mat)


def _sun_slab_scene(resx=24, resy=24):
    """Ground plane with a floating slab, lit only by a sun straight up.

    Camera looks straight down: pixels under the slab must be dark
    (occluded sun), pixels off the slab bright.
    """
    from core_tpu.geometry.mesh import MeshAssembler
    from core_tpu.materials.base import MaterialDef, build_material_table
    from core_tpu.cameras import make_perspective
    from core_tpu.scene import Scene, resolve_intersector
    from core_tpu.lights.sun import make_sun_light

    a = MeshAssembler()
    m = a.start_mesh()
    # ground plane y=0, normal +y
    _add_quad(a, m, (-20, 0, -20), (-20, 0, 20), (20, 0, 20), (20, 0, -20), 0)
    # occluder slab y=5 over the -x half, normal +y (both sides tested anyway)
    _add_quad(a, m, (-12, 5, -12), (-12, 5, 12), (-2, 5, 12), (-2, 5, -12), 0)
    geom = a.build()
    mats = [MaterialDef(name="white", diffuse_color=(0.8, 0.8, 0.8))]
    cam = make_perspective(pos=(0, 15, 0), look=(0, 0, 0), up=(0, 15, 1),
                           resx=resx, resy=resy, focal=1.0)
    sun = make_sun_light(direction=(0, 1, 0), color=(1, 1, 1), power=4.0,
                         angle=0.5, samples=2)
    return Scene(geom=geom, materials=build_material_table(mats),
                 lights=(sun,), camera=cam, background=None, accel=None,
                 has_specular=False, has_transparency=False,
                 mat_types=(0,),
                 intersector=resolve_intersector("auto", geom.n_tris))


def _floor_points(scene, xs):
    """SurfacePoints on the floor (y=0) at the given x coords, z spread."""
    from core_tpu.types import SurfacePoints
    n = len(xs)
    p = jnp.stack([jnp.asarray(xs, jnp.float32),
                   jnp.zeros(n, jnp.float32),
                   jnp.linspace(-1.0, 1.0, n)], axis=-1)
    up = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    return SurfacePoints(
        p=p, n=up, ng=up,
        nu=jnp.tile(jnp.asarray([[1.0, 0, 0]], jnp.float32), (n, 1)),
        nv=jnp.tile(jnp.asarray([[0, 0, 1.0]], jnp.float32), (n, 1)),
        uv=jnp.zeros((n, 2)),
        mat=jnp.zeros((n,), jnp.int32),
        light=jnp.full((n,), -1, jnp.int32),
        prim=jnp.full((n,), 0, jnp.int32),
        obj=jnp.zeros((n,), jnp.int32))


def _direct_at_floor(scene, xs):
    from core_tpu import scene as scene_mod
    from core_tpu.integrators import common

    sp = _floor_points(scene, xs)
    p = scene_mod.material_params(scene, sp)
    wo = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                  (len(xs), 1))
    n = len(xs)
    col = common.estimate_all_direct(
        scene, scene.mat_types, p, sp, wo,
        pixel_sample=jnp.arange(n, dtype=jnp.uint32),
        sampling_offs=np.uint32(0), active=jnp.ones(n, bool))
    return np.asarray(col).mean()


def test_sun_occlusion_under_slab():
    """Floor points under the slab get ~zero sun light; open points get
    full sun.  With the sentinel bug both were equal-bright (shadow rays
    with dist=-1 were dead, never occluded)."""
    scene = _sun_slab_scene()
    shadowed = _direct_at_floor(scene, [-8.0, -7.0, -6.0, -5.0] * 4)
    open_ = _direct_at_floor(scene, [5.0, 6.0, 7.0, 8.0] * 4)
    assert open_ > 0.1, "sun must light the open floor"
    assert shadowed < 0.05 * open_, (
        f"slab shadow missing: shadowed={shadowed:.4f} open={open_:.4f} "
        "(unbounded sun shadow rays are not being traced)")


def test_bg_light_occlusion_under_slab():
    """Environment (bg) light must also be occluded by geometry."""
    from core_tpu.backgrounds import make_constant_background
    from core_tpu.lights.bg import make_bg_light

    scene = _sun_slab_scene()
    bg = make_constant_background((1.0, 1.0, 1.0), power=2.0)
    light = make_bg_light(bg, samples=16, nv=16, nu=32)
    scene = dataclasses.replace(scene, lights=(light,), background=bg)
    shadowed = _direct_at_floor(scene, [-8.0, -7.0, -6.0, -5.0] * 4)
    open_ = _direct_at_floor(scene, [5.0, 6.0, 7.0, 8.0] * 4)
    assert open_ > 0.1
    # under-slab floor still gets grazing sky light, but much less than
    # the open half (equal means environment shadow rays are dead)
    assert shadowed < 0.8 * open_, (
        f"bg-light shadowing missing: shadowed={shadowed:.4f} "
        f"open={open_:.4f}")


def test_transparent_shadows():
    """transpShad (scene_t::isShadowed TS variant, scene.cc:904): light
    through a transparent green pane is attenuated by its filter color
    instead of fully blocked; opaque shadow tests block it entirely."""
    from core_tpu.geometry.mesh import MeshAssembler
    from core_tpu.materials.base import MaterialDef, build_material_table
    from core_tpu.cameras import make_perspective
    from core_tpu.scene import Scene, resolve_intersector
    from core_tpu.lights.point import make_point_light
    from core_tpu import scene as scene_mod
    from core_tpu.integrators import common

    a = MeshAssembler()
    m = a.start_mesh()
    _add_quad(a, m, (-20, 0, -20), (-20, 0, 20), (20, 0, 20),
              (20, 0, -20), 0)                      # floor, white
    _add_quad(a, m, (-12, 5, -12), (-12, 5, 12), (-2, 5, 12),
              (-2, 5, -12), 1)                      # pane over -x half
    geom = a.build()
    mats = [
        MaterialDef(name="white", diffuse_color=(0.8, 0.8, 0.8)),
        MaterialDef(name="pane", diffuse_color=(0.1, 0.9, 0.1),
                    transparency=0.8, transmit_filter=1.0,
                    diffuse_strength=0.2),
    ]
    cam = make_perspective(pos=(0, 15, 0), look=(0, 0, 0), up=(0, 15, 1),
                           resx=8, resy=8, focal=1.0)
    light = make_point_light(pos=(-7, 30, 0), color=(1, 1, 1),
                             power=4000.0)
    scene = Scene(geom=geom, materials=build_material_table(mats),
                  lights=(light,), camera=cam, background=None, accel=None,
                  has_specular=True, has_transparency=True, mat_types=(0,),
                  intersector=resolve_intersector("auto", geom.n_tris))

    def direct(transp_shad):
        xs = [-8.0, -7.0, -6.0, -7.5] * 4           # under the pane
        sp = _floor_points(scene, xs)
        p = scene_mod.material_params(scene, sp)
        wo = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                      (len(xs), 1))
        col = common.estimate_all_direct(
            scene, scene.mat_types, p, sp, wo,
            pixel_sample=jnp.arange(len(xs), dtype=jnp.uint32),
            sampling_offs=np.uint32(0), active=jnp.ones(len(xs), bool),
            transp_shad=transp_shad, shadow_depth=4)
        return np.asarray(col).mean(axis=0)

    blocked = direct(False)
    filtered = direct(True)
    assert blocked.max() < 1e-4, blocked          # opaque: full shadow
    assert filtered[1] > 1e-3, filtered           # TS: green gets through
    # filter color dominates: green >> red/blue
    assert filtered[1] > 3.0 * max(filtered[0], filtered[2]), filtered
