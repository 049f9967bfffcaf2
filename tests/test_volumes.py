"""Volume regions + volume integrators."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu.volumes import (make_uniform_volume, make_expdensity_volume,
                              make_noise_volume, make_grid_volume,
                              sigma_t, tau, phase_hg)
from core_tpu.integrators import volume as vol_mod
from core_tpu.integrators.volume import VolumeOptions


def _rays_through(n=4):
    o = jnp.tile(jnp.asarray([[-2.0, 0.5, 0.5]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    return Rays(o=o, d=d, tmin=jnp.zeros(n), tmax=jnp.full(n, -1.0))


def test_uniform_tau_analytic():
    vol = make_uniform_volume(sigma_a=0.3, sigma_s=0.2,
                              bmin=(0, 0, 0), bmax=(1, 1, 1))
    rays = _rays_through()
    t = np.asarray(tau(vol, rays))
    np.testing.assert_allclose(t, 0.5, rtol=1e-5)   # 1 unit * (0.3+0.2)
    # ray missing the box
    miss = Rays(o=jnp.asarray([[-2.0, 5.0, 0.5]]),
                d=jnp.asarray([[1.0, 0.0, 0.0]]),
                tmin=jnp.zeros(1), tmax=jnp.full(1, -1.0))
    np.testing.assert_allclose(np.asarray(tau(vol, miss)), 0.0)


def test_expdensity_marched_tau():
    vol = make_expdensity_volume(sigma_a=1.0, sigma_s=0.0, a=1.0, b=2.0,
                                 bmin=(0, 0, 0), bmax=(1, 1, 1))
    # horizontal ray at height h: tau = exp(-2h) * 1
    for h, expect in [(0.0, 1.0), (0.5, np.exp(-1.0))]:
        r = Rays(o=jnp.asarray([[-1.0, 0.5, h + 1e-4]]),
                 d=jnp.asarray([[1.0, 0.0, 0.0]]),
                 tmin=jnp.zeros(1), tmax=jnp.full(1, -1.0))
        t = float(np.asarray(tau(vol, r, n_steps=64))[0, 0])
        assert abs(t - expect) < 0.02, (h, t, expect)


def test_grid_volume_trilinear():
    grid = np.zeros((4, 4, 4), np.float32)
    grid[2:, :, :] = 1.0   # density 1 in x upper half
    vol = make_grid_volume(grid, sigma_a=1.0, sigma_s=0.0,
                           bmin=(0, 0, 0), bmax=(1, 1, 1))
    p = jnp.asarray([[0.9, 0.5, 0.5], [0.1, 0.5, 0.5]], jnp.float32)
    st = np.asarray(sigma_t(vol, p))
    assert st[0, 0] > 0.9 and st[1, 0] < 0.1


def test_phase_normalization():
    vol = make_uniform_volume(g=0.4)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wl = jnp.asarray([[0.0, 0.0, 1.0]] * 20000, jnp.float32)
    ph = np.asarray(phase_hg(vol, wl, jnp.asarray(d, jnp.float32)))
    # integral over the sphere ~ mean * 4pi ~ 1
    np.testing.assert_allclose(ph.mean() * 4 * np.pi, 1.0, rtol=0.05)


def test_render_with_volume():
    """Cornell box filled with thin homogeneous fog renders finite and
    dimmer than without."""
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions

    scene = cornell_box(resx=16, resy=16, light_samples=1)
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=0))
    img0, _ = render_image(scene, opts)

    fog = make_uniform_volume(sigma_a=(0.001, 0.001, 0.001), sigma_s=0.0,
                              bmin=(0, 0, 0), bmax=(556, 548.8, 559.2))
    scene_fog = dataclasses.replace(scene, volumes=(fog,))
    opts_fog = RenderOptions(integrator="directlight",
                             integrator_opts=DirectOptions(raydepth=0),
                             volume_opts=VolumeOptions(integrator="emission",
                                                       steps=8))
    img1, _ = render_image(scene_fog, opts_fog)
    a = np.asarray(img0)[..., :3]
    b = np.asarray(img1)[..., :3]
    assert np.isfinite(b).all()
    assert b.mean() < a.mean()          # absorption dims the image
    assert b.mean() > 0.3 * a.mean()    # but not to black


def test_single_scatter_adds_light():
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions

    scene = cornell_box(resx=12, resy=12, light_samples=1)
    fog = make_uniform_volume(sigma_a=0.0, sigma_s=(0.002, 0.002, 0.002),
                              bmin=(0, 0, 0), bmax=(556, 548.8, 559.2))
    scene = dataclasses.replace(scene, volumes=(fog,))
    opts = RenderOptions(
        integrator="directlight",
        integrator_opts=DirectOptions(raydepth=0),
        volume_opts=VolumeOptions(integrator="singlescatter", steps=8))
    img, _ = render_image(scene, opts)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0.0


def test_nee_shadow_rays_attenuated_by_volume():
    """Round-2 verdict item 4: NEE light samples must be attenuated through
    scene volumes (mcintegrator.cc:96,131,181) — lights must NOT shine
    un-attenuated through smoke.  A point light above the floor with an
    absorbing slab in between dims by exactly exp(-sigma_t * thickness)
    (UniformVolume tau is analytic, so the match is tight)."""
    from tests.test_shadow_sentinel import _floor_points
    from core_tpu import scene as scene_mod
    from core_tpu.integrators import common
    from core_tpu.geometry.mesh import MeshAssembler
    from core_tpu.materials.base import MaterialDef, build_material_table
    from core_tpu.cameras import make_perspective
    from core_tpu.scene import Scene, resolve_intersector
    from core_tpu.lights.point import make_point_light

    a = MeshAssembler()
    m = a.start_mesh()
    for (p0, p1, p2, p3) in [((-20, 0, -20), (-20, 0, 20), (20, 0, 20),
                              (20, 0, -20))]:
        i0 = a.add_vertex(m, *p0)
        i1 = a.add_vertex(m, *p1)
        i2 = a.add_vertex(m, *p2)
        i3 = a.add_vertex(m, *p3)
        a.add_triangle(m, i0, i1, i2, 0)
        a.add_triangle(m, i0, i2, i3, 0)
    geom = a.build()
    mats = [MaterialDef(name="white", diffuse_color=(0.8, 0.8, 0.8))]
    cam = make_perspective(pos=(0, 15, 0), look=(0, 0, 0), up=(0, 15, 1),
                           resx=8, resy=8, focal=1.0)
    light = make_point_light(pos=(0, 10, 0), color=(1, 1, 1), power=500.0)
    base = Scene(geom=geom, materials=build_material_table(mats),
                 lights=(light,), camera=cam, background=None, accel=None,
                 has_specular=False, has_transparency=False, mat_types=(0,),
                 intersector=resolve_intersector("auto", geom.n_tris))

    # absorbing slab y in [4, 6] covering the light-floor corridor
    sigma = 0.35
    fog = make_uniform_volume(sigma_a=sigma, sigma_s=0.0,
                              bmin=(-15, 4.0, -15), bmax=(15, 6.0, 15))
    foggy = dataclasses.replace(base, volumes=(fog,))

    def direct_mean(scene):
        xs = [0.0, 0.5, -0.5, 1.0] * 4
        sp = _floor_points(scene, xs)
        p = scene_mod.material_params(scene, sp)
        wo = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                      (len(xs), 1))
        col = common.estimate_all_direct(
            scene, scene.mat_types, p, sp, wo,
            pixel_sample=jnp.arange(len(xs), dtype=jnp.uint32),
            sampling_offs=np.uint32(0), active=jnp.ones(len(xs), bool))
        return np.asarray(col).mean()

    clear = direct_mean(base)
    dimmed = direct_mean(foggy)
    assert clear > 1e-3
    # floor points sit near x=0 -> shadow rays are near-vertical: path
    # length through the slab ~ 2.0 world units
    expected = np.exp(-sigma * 2.0)
    np.testing.assert_allclose(dimmed / clear, expected, rtol=0.05)


def test_step_size_plumbed_to_march_steps():
    """environment stepSize must influence the static march count
    (round-2 verdict weak #5: it was parsed then discarded)."""
    from core_tpu.environment import volume_march_steps
    assert volume_march_steps(1.0, 32.0) == 32
    assert volume_march_steps(0.1, 10.0) == 100
    assert volume_march_steps(100.0, 10.0) == 4      # clamped low
    assert volume_march_steps(0.001, 1000.0) == 128  # clamped high
    assert volume_march_steps(1.0, None) == 16       # no volumes: default


def test_df3_density_file_loading(tmp_path):
    """POV-Ray df3 voxel grids load with correct dims, order and scaling
    (reference GridVolume.cc:40-125; round-2 verdict weak #6: the XML
    GridVolume path was a ones() stub)."""
    import struct
    from core_tpu.volumes.regions import load_density_grid
    nx, ny, nz = 3, 2, 4
    vox = np.arange(nx * ny * nz, dtype=np.uint8)  # z-major, x fastest
    path = tmp_path / "smoke.df3"
    with open(path, "wb") as f:
        f.write(struct.pack(">HHH", nx, ny, nz))
        f.write(vox.tobytes())
    g = load_density_grid(str(path))
    assert g.shape == (nx, ny, nz)
    # file index (x, y, z) = x + nx*(y + ny*z)
    assert g[1, 0, 0] == np.float32(1 / 255)
    assert g[0, 1, 0] == np.float32(nx / 255)
    assert g[0, 0, 1] == np.float32(nx * ny / 255)
    # 16-bit voxels
    vox16 = (np.arange(nx * ny * nz, dtype=np.uint16) * 1000)
    path2 = tmp_path / "smoke16.df3"
    with open(path2, "wb") as f:
        f.write(struct.pack(">HHH", nx, ny, nz))
        f.write(vox16.astype(">u2").tobytes())
    g2 = load_density_grid(str(path2))
    np.testing.assert_allclose(g2[1, 0, 0], 1000 / 65535, rtol=1e-5)
    # XML wiring: density_file reaches the region
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap
    b = SceneBuilder()
    b.create("volumeregion", "smoke", ParamMap({
        "type": "GridVolume",
        "density_file": str(path), "sigma_a": 0.3, "sigma_s": 0.1,
        "minX": 0.0, "minY": 0.0, "minZ": 0.0,
        "maxX": 1.0, "maxY": 1.0, "maxZ": 1.0}))
    assert len(b.volumes) == 1
    assert b.volumes[0].grid.shape == (nx, ny, nz)


def test_sky_integrator_marcher():
    """The real SkyIntegrator (SkyIntegrator.cc:55-272): analytic
    exponential-atmosphere tau matches a numeric march, the Mie forward
    lobe makes near-sun rays collect more in-scatter, and transmittance
    falls with distance."""
    from core_tpu.integrators.volume import (sky_constants, _sky_tau,
                                             sky_transmittance,
                                             sky_integrate, VolumeOptions)
    from core_tpu.types import Rays

    b_r, b_m, a_r, a_m = sky_constants(alpha=0.5, turbidity=3.0)
    assert b_r > 0 and b_m > 0

    # analytic tau == numeric midpoint integral of beta*exp(-a*(h0+t*cos))
    h0, cos_t, s = 0.3, 0.6, 5.0
    num = sum(b_r * np.exp(-a_r * (h0 + (i + 0.5) * s / 4096 * cos_t))
              * s / 4096 for i in range(4096))
    ana = float(_sky_tau(b_r, a_r, jnp.asarray([h0]), jnp.asarray([cos_t]),
                         jnp.asarray([s]))[0])
    np.testing.assert_allclose(ana, num, rtol=1e-3)

    # scene: sunsky background, ground plane far below
    from tests.test_shadow_sentinel import _sun_slab_scene
    from core_tpu.backgrounds import make_sunsky_background
    sundir = np.array([0.3, 0.9, 0.1])
    sundir = sundir / np.linalg.norm(sundir)
    bg = make_sunsky_background(tuple(sundir), turbidity=3.0)
    scene = dataclasses.replace(_sun_slab_scene(), background=bg)
    opts = VolumeOptions(integrator="sky", steps=16, sky_alpha=0.5,
                        sky_scale=0.02, sky_turbidity=3.0)

    # z-up in the sky model; look along two horizontal-ish directions of
    # equal length, one near the sun azimuth, one opposite
    o = jnp.zeros((2, 3), jnp.float32)
    d_near = sundir.astype(np.float32)
    d_far = np.array([-sundir[0], -sundir[1], sundir[2]], np.float32)
    d_far /= np.linalg.norm(d_far)
    rays = Rays(o=o, d=jnp.asarray([d_near, d_far]),
                tmin=jnp.zeros(2), tmax=jnp.full(2, 50.0))
    tr = np.asarray(sky_transmittance(rays, opts))
    assert (tr > 0).all() and (tr < 1.0).all()
    ins = np.asarray(sky_integrate(scene, rays, jnp.full(2, 50.0), opts))
    assert np.isfinite(ins).all() and (ins >= 0).all()
    # forward Mie lobe: the ray toward the sun's azimuth in-scatters more
    assert ins[0].mean() > ins[1].mean(), ins.mean(axis=-1)

    # transmittance decreases with path length
    rays2 = Rays(o=o, d=jnp.asarray([d_near, d_near]),
                 tmin=jnp.zeros(2), tmax=jnp.asarray([20.0, 200.0]))
    tr2 = np.asarray(sky_transmittance(rays2, opts))
    assert tr2[1].mean() < tr2[0].mean()


def test_sky_integrator_frontend_mapping():
    from core_tpu.params import ParamMap
    from core_tpu.environment import setup_render_options
    o = setup_render_options(ParamMap({}), ParamMap({
        "type": "directlighting"}), ParamMap({
            "type": "SkyIntegrator", "alpha": 0.7, "sigma_t": 0.05,
            "turbidity": 4.0, "stepSize": 2.0}))
    assert o.volume_opts.integrator == "sky"
    assert o.volume_opts.sky_alpha == np.float32(0.7) or \
        abs(o.volume_opts.sky_alpha - 0.7) < 1e-6
    assert abs(o.volume_opts.sky_turbidity - 4.0) < 1e-6


def test_attenuation_grid_matches_direct_march():
    """SingleScatter optimize mode (attenuationGridMap,
    SingleScatterIntegrator.cc:16,494-496): the precomputed per-light
    attenuation grid must reproduce the per-step transmittance march."""
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions

    scene = cornell_box(resx=12, resy=12, light_samples=1,
                        with_blocks=False)
    fog = make_uniform_volume(sigma_a=0.0005, sigma_s=0.0008,
                              bmin=(100, 50, 100), bmax=(450, 400, 450))
    scene = dataclasses.replace(scene, volumes=(fog,))

    def render(optimize):
        vopts = VolumeOptions(integrator="singlescatter", steps=12,
                              optimize=optimize, att_grid_res=24)
        opts = RenderOptions(integrator="directlight",
                             integrator_opts=DirectOptions(raydepth=0),
                             volume_opts=vopts, aa_samples=2, spp_chunk=2)
        img, _ = render_image(scene, opts)
        return np.asarray(img)[..., :3]

    img_march = render(False)
    img_grid = render(True)
    assert np.isfinite(img_grid).all()
    # uniform fog: analytic tau -> the grid interpolation is near-exact
    np.testing.assert_allclose(img_grid, img_march, rtol=0.05, atol=5e-3)
