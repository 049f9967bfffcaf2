"""Driver config #3 scene: ~100k-tri textured mesh + env importance light.

Covers scenes.mesh_scene at reduced tessellation: geometry assembly, texture
mapped materials (marble diffuse on terrain, voronoi on the torus), the
texture-environment background and its auto-created importance-sampled
bglight (reference textureback.cc:140-160 + bglight.cc:82-107)."""
import numpy as np
import jax.numpy as jnp

from core_tpu.scenes import mesh_scene
from core_tpu.render import render_image, RenderOptions


def small_scene(**kw):
    return mesh_scene(resx=48, resy=48, n_grid=24, torus_u=24, torus_v=12,
                      ibl_samples=4, sun_samples=2, **kw)


def test_mesh_scene_builds():
    s = small_scene()
    # (n_grid-1)^2*2 + torus_u*torus_v*2 triangles
    assert s.geom.n_tris == 23 * 23 * 2 + 24 * 12 * 2
    # background + auto IBL light + sun
    assert s.background is not None
    assert len(s.lights) == 2
    assert s.textures is not None
    # full-size default hits the driver's ~100k-tri config
    # (not built here: 159^2*2 + 180*64*2 = 73,602)


def test_mesh_scene_default_tri_count():
    # default tessellation lands in the driver's "~100k tris" ballpark
    n_grid, tu, tv = 160, 180, 64
    assert (n_grid - 1) ** 2 * 2 + tu * tv * 2 == 73602


def test_mesh_scene_renders():
    s = small_scene()
    img, film = render_image(s, RenderOptions(aa_samples=1, spp_chunk=1))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.05      # lit scene, not black
    # sky visible at the top rows (background contributes)
    assert img[:4, :, 2].mean() > 0.05


def test_mesh_scene_textures_vary():
    """The texture-mapped diffuse actually varies across the terrain."""
    from core_tpu import scene as scene_mod
    from core_tpu.types import Rays
    s = small_scene()
    n = 64
    # rays straight down onto the terrain at spread-out points
    xs = np.linspace(-4, 4, 8)
    zs = np.linspace(-4, 4, 8)
    X, Z = np.meshgrid(xs, zs)
    o = np.stack([X.ravel(), np.full(n, 10.0), Z.ravel()], -1)
    d = np.tile(np.array([0.0, -1.0, 0.0]), (n, 1))
    rays = Rays(o=jnp.asarray(o, jnp.float32), d=jnp.asarray(d, jnp.float32),
                tmin=jnp.zeros(n), tmax=jnp.full(n, -1.0))
    hits = scene_mod.closest_hit(s, rays)
    sp = scene_mod.surface_points(s, rays, hits)
    p = scene_mod.material_params(s, sp)
    dc = np.asarray(p.diffuse_color)[np.asarray(hits.valid)]
    assert dc.std(axis=0).max() > 0.02
