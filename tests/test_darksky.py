"""DarkSky background (reference src/backgrounds/darksky.cc), the spectral
sun color (sunspectrum.cc) and ColorConv color spaces (ColorConv.h)."""
import numpy as np
import jax.numpy as jnp

from core_tpu.backgrounds import (make_darksky_background, darksky_sun_color,
                                  eval_background)
from core_tpu.sampling.sunspectrum import attenuated_sun_xyz, cie_xyz_fit
from core_tpu.utils.colorconv import XYZ_TO_RGB, xyz_to_rgb, xyy_to_xyz


def _dirs(n=256, seed=1):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


def test_cie_fit_shape():
    # the CIE 1931 ybar peaks at 555nm with value ~1; xbar is bimodal
    wl = np.arange(380.0, 750.0, 1.0)
    cmf = cie_xyz_fit(wl)
    assert abs(wl[cmf[:, 1].argmax()] - 555.0) < 5.0
    assert abs(cmf[:, 1].max() - 1.0) < 0.02
    # zbar is blue-concentrated: peak below 460nm, tiny above 550nm
    assert wl[cmf[:, 2].argmax()] < 460.0
    assert cmf[wl > 550.0, 2].max() < 0.02


def test_sun_reddens_toward_horizon():
    hi = attenuated_sun_xyz(0.9, 2.0)
    lo = attenuated_sun_xyz(0.02, 2.0)
    # more air mass kills blue (Z) much faster than red-heavy X
    assert lo[0] / hi[0] < 0.2                 # strongly attenuated overall
    assert (lo[2] / lo[0]) < 0.3 * (hi[2] / hi[0])   # blue fraction collapses


def test_colorconv_roundtrip_and_spaces():
    xyz = xyy_to_xyz(np.float64(0.3127), np.float64(0.3290),
                     np.float64(0.5), exposure=0.0)
    # D65 white chromaticity through the sRGB(D65) matrix -> R=G=B
    rgb = xyz_to_rgb(xyz, XYZ_TO_RGB["sRGB (D65)"])
    assert abs(rgb[0] - rgb[1]) < 0.01 and abs(rgb[1] - rgb[2]) < 0.01
    # exposure curve: exp(Y*e)-1 grows Y
    xyz_e = xyy_to_xyz(np.float64(0.3127), np.float64(0.3290),
                       np.float64(0.5), exposure=1.0)
    assert xyz_e[1] > xyz[1]
    # clamp + gamma
    big = np.array([5.0, 5.0, 5.0])
    out = xyz_to_rgb(big, XYZ_TO_RGB["CIE (E)"], clamp=True,
                     gamma_encode=True)
    assert out.max() <= 1.0


def test_darksky_sky_shape():
    sun = np.array([0.4, 0.2, 0.7])
    bg = make_darksky_background(sun, turbidity=3.0)
    d = _dirs()
    c = np.asarray(eval_background(bg, d))
    assert np.isfinite(c).all() and (c >= 0).all()
    # default clamp+gamma output lands in [0,1] (darksky defaults:
    # clamp=true, gammaEnc=true, darksky.cc:261-266)
    assert c.max() <= 1.0 + 1e-5
    # brightest direction is near the sun
    sunn = sun / np.linalg.norm(sun)
    bright = c.mean(axis=1).argmax()
    assert np.dot(np.asarray(d)[bright], sunn) > 0.6


def test_darksky_night_mode():
    sun = (0.4, 0.2, 0.7)
    day = make_darksky_background(sun, turbidity=3.0)
    night = make_darksky_background(sun, turbidity=3.0, night=True)
    d = _dirs(64)
    cd = np.asarray(eval_background(day, d))
    cn = np.asarray(eval_background(night, d))
    assert cn.mean() < 0.1 * cd.mean()
    # blue-shifted: B/R ratio rises
    assert cn[:, 2].mean() / max(cn[:, 0].mean(), 1e-9) \
        > cd[:, 2].mean() / cd[:, 0].mean()


def test_darksky_altitude_shifts_sun():
    # altitude raises the effective sun: sky at the old sun direction dims
    lowsun = np.array([1.0, 0.0, 0.15])
    bg0 = make_darksky_background(lowsun, turbidity=3.0, gamma_enc=False,
                                  clamp_rgb=False)
    bg1 = make_darksky_background(lowsun, turbidity=3.0, altitude=0.8,
                                  gamma_enc=False, clamp_rgb=False)
    assert float(np.asarray(bg1.sun_dir)[2]) > float(np.asarray(bg0.sun_dir)[2])


def test_darksky_factory_add_sun():
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap
    b = SceneBuilder()
    p = ParamMap({"type": "darksky", "from": (0.3, 0.3, 0.9),
                  "turbidity": 2.5, "add_sun": True, "sun_power": 2.0,
                  "night": False})
    b.create("background", "world", p)
    assert b.background is not None
    assert len(b.lights) == 1           # the auto 'Real Sun'
    sun = b.lights[0]
    col = np.asarray(sun.col_pdf)
    assert np.isfinite(col).all()
