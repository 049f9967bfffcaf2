"""Ray differentials + parametric surface derivatives (round-2 verdict
item 7; reference diffRay_t ray.h:38-57, spDifferentials_t
surface.h:105-118).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from core_tpu.geometry.mesh import MeshAssembler
from core_tpu.materials.base import MaterialDef, build_material_table
from core_tpu.cameras import make_perspective
from core_tpu.scene import Scene, resolve_intersector


def _plane_scene(resx=48, resy=48, tex=None, uv_scale=1.0):
    """Ground plane on y=0 spanning [-50,50]^2 with UVs = (x,z)*uv_scale,
    camera low above it looking out at a grazing angle."""
    a = MeshAssembler()
    m = a.start_mesh()
    pts = [(-50, 0, -10), (-50, 0, 90), (50, 0, 90), (50, 0, -10)]
    ids = [a.add_vertex(m, *p) for p in pts]
    uvids = [a.add_uv(m, p[0] * uv_scale, p[2] * uv_scale) for p in pts]
    a.add_triangle(m, ids[0], ids[1], ids[2], 0,
                   uv_ids=(uvids[0], uvids[1], uvids[2]))
    a.add_triangle(m, ids[0], ids[2], ids[3], 0,
                   uv_ids=(uvids[0], uvids[2], uvids[3]))
    geom = a.build()
    mats = [MaterialDef(name="white", diffuse_color=(0.8, 0.8, 0.8),
                        diffuse_tex=0 if tex is not None else -1)]
    cam = make_perspective(pos=(0, 2.0, -5), look=(0, 0, 30), up=(0, 3.0, -5),
                           resx=resx, resy=resy, focal=1.0)
    from core_tpu.lights.sun import make_sun_light
    sun = make_sun_light(direction=(0.2, 1, -0.3), color=(1, 1, 1),
                         power=3.0, angle=0.5, samples=1)
    ctex = None
    if tex is not None:
        from core_tpu.textures.base import build_texture_set
        ctex = build_texture_set([tex])
    return Scene(geom=geom, materials=build_material_table(mats),
                 lights=(sun,), camera=cam, background=None, accel=None,
                 textures=ctex, has_specular=False, has_transparency=False,
                 mat_types=(0,),
                 intersector=resolve_intersector("auto", geom.n_tris))


def test_surface_dpduv_matches_analytic_plane():
    """UVs = (x, z): dPdU must be the world x axis and dPdV the world z
    axis exactly (the verdict's 'debug dPdU matches analytic plane
    derivatives' criterion)."""
    from core_tpu.differentials import surface_dpduv
    from core_tpu import scene as scene_mod
    from core_tpu.types import Rays

    scene = _plane_scene()
    n = 8
    o = jnp.asarray(np.stack([np.linspace(-20, 20, n),
                              np.full(n, 5.0),
                              np.linspace(0, 40, n)], 1), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
    rays = Rays(o=o, d=d, tmin=jnp.zeros(n), tmax=jnp.full(n, -1.0))
    hits = scene_mod.closest_hit(scene, rays)
    assert bool(hits.valid.all())
    sp = scene_mod.surface_points(scene, rays, hits)
    dpdu, dpdv, ok = surface_dpduv(scene, sp)
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(dpdu),
                               np.tile([[1.0, 0, 0]], (n, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dpdv),
                               np.tile([[0.0, 0, 1.0]], (n, 1)), atol=1e-4)


def test_sp_differentials_footprint_grows_with_grazing():
    """dPdx/dPdy from the +1-pixel rays: the projected footprint on the
    ground grows toward the horizon (grazing angles)."""
    from core_tpu.differentials import camera_diff_dirs, sp_differentials
    from core_tpu import scene as scene_mod
    from core_tpu.types import Rays
    from core_tpu.cameras import shoot_ray

    scene = _plane_scene()
    cam = scene.camera
    px = jnp.asarray([24.0, 24.0], jnp.float32)
    py = jnp.asarray([40.0, 26.0], jnp.float32)   # low row = near, mid = far
    rays, _ = shoot_ray(cam, px, py)
    dxd, dyd = camera_diff_dirs(cam, px, py)
    hits = scene_mod.closest_hit(scene, rays)
    assert bool(hits.valid.all())
    sp = scene_mod.surface_points(scene, rays, hits)
    dpdx, dpdy = sp_differentials(sp.p, sp.ng, rays.o, dxd, dyd)
    ext = np.linalg.norm(np.asarray(dpdy), axis=-1)
    assert ext[1] > 3.0 * ext[0], ext


def test_texture_lod_kills_checker_aliasing():
    """A high-frequency checker image at grazing angle: mip-filtered
    lookups (ray-differential LOD) must converge the far field to the
    checker mean instead of aliasing (verdict item 7 'Done' criterion)."""
    from core_tpu.textures.base import TextureDef, TexType
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions

    checker = (np.indices((64, 64)) // 8).sum(axis=0) % 2
    img = np.repeat(checker[..., None], 3, axis=-1).astype(np.float32)
    tex = TextureDef(ttype=TexType.IMAGE, image=img, interpolate="bilinear",
                     clip_mode="repeat")
    scene = _plane_scene(tex=tex, uv_scale=0.5)
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=0),
                         aa_samples=1)
    out, _ = render_image(scene, opts)
    out = np.asarray(out)[..., :3]
    assert np.isfinite(out).all()
    # far rows (top of the plane region, just below the horizon): texels
    # per pixel >> 1 -> mips average them; per-pixel variation must be
    # far below the near field's checker contrast
    lum = out.mean(axis=-1)
    hor = np.argmax([lum[r].max() > 1e-4 for r in range(lum.shape[0])])
    far_rows = lum[hor + 2: hor + 6]
    near_rows = lum[-6:]
    far_contrast = far_rows.std()
    near_contrast = near_rows.std()
    assert near_contrast > 0.05, near_contrast       # checker is visible
    assert far_contrast < 0.5 * near_contrast, (far_contrast, near_contrast)
