"""Light image (density buffer): bidir t=1 camera splats.

Reference: bidirpath.cc:239-262 (connectPathE -> addDensitySample),
imagefilm.cc:566-614 (density splat), imagefilm.cc:402,411 (flush merge
scaled by w*h/n_paths)."""
import numpy as np
import jax.numpy as jnp

from core_tpu import film as film_mod
from core_tpu.film import make_film
from core_tpu.scenes import cornell_box
from core_tpu.render import RenderOptions, render_image
from core_tpu.integrators.bidir import BidirOptions


def test_density_splat_and_flush_merge():
    film = make_film(4, 4)
    x = jnp.asarray([1.2, 2.9, -1.0, 3.5])
    y = jnp.asarray([0.5, 3.1, 1.0, 5.0])
    col = jnp.ones((4, 3), jnp.float32)
    film = film_mod.add_density_samples(film, x, y, col,
                                        jnp.asarray(8.0, jnp.float32))
    d = np.asarray(film.density)
    assert d[0, 1].sum() == 3.0          # (1.2, 0.5) -> pixel (1,0)
    assert d[3, 2].sum() == 3.0
    assert d.sum() == 6.0                # two out-of-bounds dropped
    assert float(film.n_density) == 8.0
    # flush merges density * (w*h/n) on top of the (empty) rgba film
    img = np.asarray(film_mod.flush(film))
    assert abs(img[0, 1, 0] - 16.0 / 8.0) < 1e-5
    assert img[0, 0, 0] == 0.0


def test_camera_project_inverts_shoot_ray():
    from core_tpu.cameras import make_perspective, shoot_ray, project
    cam = make_perspective(pos=(1, -3, 2), look=(0, 0, 0.5), up=(1, -3, 3),
                           resx=64, resy=48, focal=1.4)
    px = jnp.asarray([3.2, 17.9, 60.5, 32.0])
    py = jnp.asarray([5.5, 40.1, 2.0, 24.0])
    rays, _ = shoot_ray(cam, px, py)
    qx, qy, cos_e, ok = project(cam, rays.d)
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(qx), np.asarray(px), atol=2e-2)
    np.testing.assert_allclose(np.asarray(qy), np.asarray(py), atol=2e-2)
    assert float(cos_e.min()) > 0.0
    # a direction behind the camera projects invalid
    _, _, _, ok2 = project(cam, -rays.d[:1])
    assert not bool(ok2[0])


def test_bidir_light_image_fills_and_conserves_energy():
    scene = cornell_box(resx=20, resy=20, light_samples=2,
                        with_blocks=False, intersector="brute")
    img_on, film_on = render_image(scene, RenderOptions(
        integrator="bidirectional",
        integrator_opts=BidirOptions(eye_depth=2, light_depth=2,
                                     do_light_image=True),
        aa_samples=2, spp_chunk=2))
    img_off, film_off = render_image(scene, RenderOptions(
        integrator="bidirectional",
        integrator_opts=BidirOptions(eye_depth=2, light_depth=2,
                                     do_light_image=False),
        aa_samples=2, spp_chunk=2))
    # the light image actually accumulated something
    assert float(jnp.sum(film_on.density)) > 0.0
    assert float(film_on.n_density) == 20 * 20 * 2
    assert float(film_off.n_density) == 0.0
    # both estimators target the same image: mean brightness within 35%
    m_on = float(jnp.mean(img_on[..., :3]))
    m_off = float(jnp.mean(img_off[..., :3]))
    assert abs(m_on - m_off) / m_off < 0.35, (m_on, m_off)
