"""Background models: constant/gradient (round-0), sunsky Preetham model,
texture-mapped environment."""
import numpy as np
import jax.numpy as jnp

from core_tpu.backgrounds import (make_constant_background,
                                  make_gradient_background,
                                  make_sunsky_background,
                                  make_texture_background, eval_background)
from core_tpu.textures.base import TexType, TextureDef, build_texture_set


def _dirs(n=512, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


def test_sunsky_physical_shape():
    bg = make_sunsky_background(sun_dir=(0.3, 0.2, 0.8), turbidity=3.0)
    d = _dirs()
    c = np.asarray(eval_background(bg, d))
    assert np.isfinite(c).all() and (c >= 0).all()
    up = np.asarray(d)[:, 2] > 0.1
    assert c[up].mean() > 0.05                       # sky is lit
    # brightest direction is near the sun
    sun = np.array([0.3, 0.2, 0.8])
    sun /= np.linalg.norm(sun)
    bright = c.mean(axis=1).argmax()
    assert np.dot(np.asarray(d)[bright], sun) > 0.7
    # below horizon the reference stretches the horizon color with a
    # smoothstep fade to black (sunsky.cc:125-131): near straight down ~ 0
    down = np.asarray(d)[:, 2] < -0.95
    if down.any():
        assert c[down].max() < 0.1
    # and darker than the upward sky on average
    assert c[np.asarray(d)[:, 2] < -0.5].mean() < c[up].mean()


def test_texture_background_sphere_mapping():
    img = np.zeros((8, 16, 3), np.float32)
    # image ROW 0 is the TOP of the picture = the up pole (v~1): the
    # reference flips V on every image lookup (imagetex.cc:133; round-5
    # mesh+IBL golden anchored the convention, textures/base.py)
    img[:4] = (0, 1, 0)     # image top = up hemisphere, green
    img[4:] = (1, 0, 0)     # image bottom = down hemisphere, red
    ctex = build_texture_set([TextureDef(ttype=TexType.IMAGE, image=img,
                                         clip_mode="repeat")])
    bg = make_texture_background(ctex, tex_id=0, power=2.0)
    # off-pole so v doesn't hit the exact 1.0 repeat seam
    d = jnp.asarray([[0.2, 0, 0.98], [0.2, 0, -0.98]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(eval_background(bg, d))
    # v = 1 - theta/pi: up => v~1 (image top, green), down => red; power 2
    assert c[0, 1] > 1.5 and c[0, 0] < 0.5
    assert c[1, 0] > 1.5 and c[1, 1] < 0.5


def test_constant_and_gradient_still_work():
    cb = make_constant_background((0.5, 0.25, 0.125), power=2.0)
    d = _dirs(8)
    np.testing.assert_allclose(np.asarray(eval_background(cb, d)),
                               np.tile([[1.0, 0.5, 0.25]], (8, 1)), atol=1e-6)
    gb = make_gradient_background(horizon=(1, 1, 1), zenith=(0, 0, 1))
    c = np.asarray(eval_background(gb, jnp.asarray([[0, 0, 1.0]])))
    np.testing.assert_allclose(c, [[0, 0, 1.0]], atol=1e-6)
