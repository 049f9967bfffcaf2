"""Spectral dispersion (spectrum.cc / glass dispersive branch)."""
import numpy as np
import jax.numpy as jnp

from core_tpu.sampling import spectrum


def test_cauchy_anchor_and_spread():
    a, b = spectrum.cauchy_coefficients(1.55, 0.05)
    # anchored at the d-line
    nd = spectrum.cauchy_ior((0.5893 - spectrum.WL_MIN)
                             / (spectrum.WL_MAX - spectrum.WL_MIN), a, b)
    assert abs(float(nd) - 1.55) < 1e-5
    # blue refracts stronger than red, spread == dispersion power
    n_blue = spectrum.cauchy_ior(0.0, a, b)
    n_red = spectrum.cauchy_ior(1.0, a, b)
    assert float(n_blue) > float(n_red)
    assert abs(float(n_blue - n_red) - 0.05) < 1e-5


def test_wl2rgb_energy_neutral():
    w = jnp.linspace(0.0, 1.0, 256)
    rgb = spectrum.wl2rgb(w)
    mean = np.asarray(jnp.mean(rgb, axis=0))
    np.testing.assert_allclose(mean, 1.0, atol=0.02)
    assert np.all(np.asarray(rgb) >= 0)


def test_dispersive_glass_renders():
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions
    import dataclasses
    scene = cornell_box(resx=24, resy=24, light_samples=1,
                        block_materials=("glass", "white"),
                        intersector="brute")
    # turn on dispersion for the glass material
    disp = np.asarray(scene.materials.dispersion).copy()
    glass_rows = np.asarray(scene.materials.mtype) == 3
    disp[glass_rows] = 0.1
    scene_d = dataclasses.replace(
        scene, materials=scene.materials._replace(
            dispersion=jnp.asarray(disp)))
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=3))
    img_plain, _ = render_image(scene, opts)
    img_disp, _ = render_image(scene_d, opts)
    assert np.all(np.isfinite(np.asarray(img_disp)))
    # dispersion changes the refracted image
    assert float(jnp.max(jnp.abs(img_disp - img_plain))) > 1e-4
