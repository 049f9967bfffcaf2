"""Light-type tests: sampling validity, pdf conventions, MIS intersect
agreement, and end-to-end renders with each light type in a small box.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from core_tpu.types import Rays, SurfacePoints
from core_tpu.lights import base as lb
from core_tpu.lights.spot import make_spot_light
from core_tpu.lights.sun import make_directional_light, make_sun_light
from core_tpu.lights.sphere import make_sphere_light
from core_tpu.lights.mesh import make_mesh_light
from core_tpu.lights.bg import make_bg_light
from core_tpu.backgrounds import make_gradient_background, eval_background


def _sps(n, z=0.0):
    up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    p = p.at[:, 2].set(z)
    return SurfacePoints(p=p, n=up, ng=up,
                         nu=jnp.tile(jnp.asarray([[1.0, 0, 0]], jnp.float32), (n, 1)),
                         nv=jnp.tile(jnp.asarray([[0, 1.0, 0]], jnp.float32), (n, 1)),
                         uv=jnp.zeros((n, 2)),
                         mat=jnp.zeros((n,), jnp.int32),
                         light=jnp.full((n,), -1, jnp.int32),
                         prim=jnp.zeros((n,), jnp.int32),
                         obj=jnp.zeros((n,), jnp.int32))


def _ss(n, seed=1):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.random(n, np.float32)),
            jnp.asarray(rng.random(n, np.float32)))


def test_spot_cone_and_falloff():
    light = make_spot_light(pos=(0, 0, 5), to=(0, 0, 0), color=(1, 1, 1),
                            power=10.0, cone_angle=30.0, falloff=0.2)
    assert lb.dirac(light)
    sp = _sps(256)
    ls = lb.illuminate(light, sp)
    # points directly under the light are inside the cone
    inside = np.asarray(jnp.abs(sp.p[:, 0]) ** 2 + jnp.abs(sp.p[:, 1]) ** 2) \
        < (5 * np.tan(np.radians(30))) ** 2 * 0.8
    v = np.asarray(ls.valid)
    assert v[inside].all()
    col = np.asarray(ls.col)
    assert np.isfinite(col).all() and (col >= 0).all()


def test_directional_infinite():
    light = make_directional_light(direction=(0, 0, 1), color=(1, 1, 1),
                                   power=2.0)
    assert lb.dirac(light)
    sp = _sps(16)
    ls = lb.illuminate(light, sp)
    assert np.asarray(ls.valid).all()
    np.testing.assert_allclose(np.asarray(ls.wi),
                               [[0, 0, 1]] * 16, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ls.col), 2.0, atol=1e-6)
    assert (np.asarray(ls.dist) < 0).all()  # unbounded shadow rays


def test_sun_cone_sampling_and_mis():
    light = make_sun_light(direction=(0, 0, 1), color=(1, 1, 1), power=3.0,
                           angle=5.0, samples=4)
    assert not lb.dirac(light)
    assert lb.can_intersect(light)
    n = 2048
    sp = _sps(n)
    s1, s2 = _ss(n)
    ls = lb.illum_sample(light, sp, s1, s2)
    wi = np.asarray(ls.wi)
    cosangle = wi[:, 2]
    assert (cosangle >= np.cos(np.radians(5.0)) - 1e-5).all()
    # intersect: rays inside the cone hit, outside miss
    rays = Rays(o=jnp.zeros((2, 3)), d=jnp.asarray([[0, 0, 1.0],
                                                    [0, 1.0, 0.0]]),
                tmin=jnp.zeros(2), tmax=jnp.full(2, -1.0))
    lh = lb.intersect_light(light, rays)
    assert bool(lh.valid[0]) and not bool(lh.valid[1])
    # ipdf * pdf == 1 for cone directions
    np.testing.assert_allclose(float(lh.ipdf[0]) * float(ls.pdf[0]), 1.0,
                               rtol=1e-5)


def test_sphere_light_solid_angle():
    light = make_sphere_light(center=(0, 0, 4), radius=1.0, color=(1, 1, 1),
                              power=5.0, samples=4)
    n = 4096
    sp = _sps(n)
    s1, s2 = _ss(n, 2)
    ls = lb.illum_sample(light, sp, s1, s2)
    ok = np.asarray(ls.valid)
    assert ok.mean() > 0.95
    # all sampled rays must actually hit the sphere: |p + t*wi - c| ~ r
    p = np.asarray(sp.p)[ok]
    wi = np.asarray(ls.wi)[ok]
    t = np.asarray(ls.dist)[ok]
    hit = p + wi * t[:, None]
    d = np.linalg.norm(hit - np.array([0, 0, 4.0]), axis=1)
    np.testing.assert_allclose(d, 1.0, atol=5e-3)


def test_mesh_light_sampling():
    # single quad (two triangles) at z=3 facing -z
    verts = np.array([[-1, -1, 3], [1, -1, 3], [1, 1, 3], [-1, 1, 3]],
                     np.float32)
    tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)  # normals point -z
    light = make_mesh_light(verts, tris, color=(1, 1, 1), power=4.0,
                            samples=4)
    assert float(light.area) == pytest.approx(4.0, rel=1e-5)
    n = 4096
    sp = _sps(n)
    s1, s2 = _ss(n, 3)
    ls = lb.illum_sample(light, sp, s1, s2)
    ok = np.asarray(ls.valid)
    assert ok.mean() > 0.95
    # sampled points lie on the quad: p + t*wi has z == 3, |x|,|y| <= 1
    p = np.asarray(sp.p)[ok]
    wi = np.asarray(ls.wi)[ok]
    t = np.asarray(ls.dist)[ok]
    hit = p + wi * t[:, None]
    np.testing.assert_allclose(hit[:, 2], 3.0, atol=1e-3)
    assert (np.abs(hit[:, :2]) <= 1.0 + 1e-4).all()
    # MIS intersect on a ray straight up
    rays = Rays(o=jnp.zeros((1, 3)), d=jnp.asarray([[0, 0, 1.0]]),
                tmin=jnp.zeros(1), tmax=jnp.full(1, -1.0))
    lh = lb.intersect_light(light, rays)
    assert bool(lh.valid[0])
    np.testing.assert_allclose(float(lh.t[0]), 3.0, atol=1e-4)


def test_bg_light_pdf_consistency():
    bg = make_gradient_background(horizon=(0.8, 0.7, 0.6),
                                  zenith=(0.2, 0.3, 0.8), power=2.0)
    light = make_bg_light(bg, samples=8, nv=64, nu=128)
    n = 4096
    sp = _sps(n)
    s1, s2 = _ss(n, 4)
    ls = lb.illum_sample(light, sp, s1, s2)
    wi = np.asarray(ls.wi)
    np.testing.assert_allclose(np.linalg.norm(wi, axis=-1), 1.0, atol=1e-4)
    # sampled color equals background eval
    np.testing.assert_allclose(np.asarray(ls.col),
                               np.asarray(eval_background(bg, ls.wi)),
                               rtol=1e-5)
    # pdf from intersect matches sampled pdf (same direction)
    rays = Rays(o=jnp.zeros_like(ls.wi), d=ls.wi,
                tmin=jnp.zeros(n), tmax=jnp.full(n, -1.0))
    lh = lb.intersect_light(light, rays)
    np.testing.assert_allclose(np.asarray(lh.ipdf) * np.asarray(ls.pdf),
                               1.0, rtol=5e-2)
    # Monte-Carlo estimate of mean radiance: E[col/pdf]/(4pi) ~ average bg
    est = (np.asarray(ls.col) / np.asarray(ls.pdf)[:, None]).mean(axis=0) \
        / (4.0 * np.pi)
    rng = np.random.default_rng(5)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = np.asarray(eval_background(bg, jnp.asarray(d, jnp.float32))).mean(axis=0)
    np.testing.assert_allclose(est, ref, rtol=0.08)


def test_render_with_point_and_spot():
    """End-to-end: Cornell geometry lit by a spot + point light."""
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions
    import dataclasses

    scene = cornell_box(resx=16, resy=16, light_samples=1)
    spot = make_spot_light(pos=(278, 500, 279.5), to=(278, 0, 279.5),
                           color=(1, 1, 1), power=200000.0, cone_angle=40.0)
    from core_tpu.lights.point import make_point_light
    point = make_point_light(pos=(278, 300, 100), color=(1, 0.9, 0.8),
                             power=100000.0)
    scene = dataclasses.replace(scene, lights=(spot, point))
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=0))
    img, _ = render_image(scene, opts)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01


def test_bglight_cdf_inversion_gather_free():
    """The gather-free 2-D CDF inversion (one-hot matmul row fetch +
    compare-reduce searches) matches the straightforward gather/
    searchsorted formulation exactly."""
    import jax.numpy as jnp
    from core_tpu import backgrounds as bgm
    from core_tpu.lights import bg as B

    bg = bgm.make_sunsky_background((0.3, 0.2, 0.8), turbidity=3.0)
    L = B.make_bg_light(bg, samples=4, nv=32, nu=64)
    rng = np.random.default_rng(3)
    s1 = jnp.asarray(rng.random(1024), jnp.float32)
    s2 = jnp.asarray(rng.random(1024), jnp.float32)
    u, v, pu, pv = B._sample_uv(L, s1, s2)

    vc = np.asarray(L.v_cdf)
    vp = np.asarray(L.v_pdf)
    uc = np.asarray(L.u_cdf)
    up = np.asarray(L.u_pdf)
    s1n, s2n = np.asarray(s1), np.asarray(s2)
    nv, nu = vc.shape[0], uc.shape[1]
    iv = np.clip(np.searchsorted(vc, s2n, side="left"), 0, nv - 1)
    cdf_lo = np.where(iv > 0, vc[np.maximum(iv - 1, 0)], 0.0)
    dv = np.maximum(vc[iv] - cdf_lo, 1e-12)
    v_ref = (iv + np.clip((s2n - cdf_lo) / dv, 0, 1)) / nv
    rows = uc[iv]
    iu = np.clip(np.array([np.searchsorted(rows[i], s1n[i], side="left")
                           for i in range(len(s1n))]), 0, nu - 1)
    lo_u = np.where(iu > 0, rows[np.arange(len(iu)),
                                 np.maximum(iu - 1, 0)], 0.0)
    du = np.maximum(rows[np.arange(len(iu)), iu] - lo_u, 1e-12)
    u_ref = (iu + np.clip((s1n - lo_u) / du, 0, 1)) / nu
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pu), up[iv, iu], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pv), vp[iv], atol=1e-6)
