"""Texture subsystem tests: noise statistics, formula sanity, image lookup,
and an end-to-end textured render (BASELINE config #3 shape).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from core_tpu.textures import noise as nz
from core_tpu.textures.base import (TexType, TextureDef, build_texture_set,
                                    eval_texture, MusgraveType)


def _pts(n, scale=10.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, (n, 3)), np.float32)


def test_perlin_range_and_continuity():
    p = _pts(8192)
    v = np.asarray(nz.new_perlin(p))
    assert v.min() >= -0.05 and v.max() <= 1.05
    assert 0.35 < v.mean() < 0.65
    # continuity: tiny step changes value only a little
    v2 = np.asarray(nz.new_perlin(p + 1e-4))
    assert np.abs(v2 - v).max() < 5e-3


def test_cell_noise_is_cell_constant():
    p = jnp.asarray([[0.2, 0.3, 0.4], [0.8, 0.9, 0.7],
                     [1.2, 0.3, 0.4]], np.float32)
    v = np.asarray(nz.cell_noise(p))
    assert v[0] == v[1]          # same integer cell
    assert v[0] != v[2]          # different cell
    assert (v >= 0).all() and (v <= 1).all()


def test_voronoi_f1_leq_f2():
    p = _pts(2048, 4.0)
    da, pa = nz.voronoi_features(p)
    da = np.asarray(da)
    assert (np.diff(da, axis=-1) >= -1e-6).all()      # sorted F1<=F2<=F3<=F4
    assert (da[:, 0] <= np.sqrt(3.0) + 1e-3).all()    # within cell radius
    # feature points are near the query (within the 3x3x3 neighborhood)
    d0 = np.linalg.norm(np.asarray(pa)[:, 0] - np.asarray(p), axis=-1)
    np.testing.assert_allclose(d0, da[:, 0], atol=1e-4)


def test_turbulence_and_musgrave_finite():
    p = _pts(1024, 3.0)
    t = np.asarray(nz.turbulence(nz.new_perlin, p, 4, 1.0, False))
    assert np.isfinite(t).all() and t.min() >= -0.05 and t.max() <= 1.05
    for fn in [
        lambda: nz.fbm(nz.new_perlin, p, 1.0, 2.0, 4.0),
        lambda: nz.multifractal(nz.new_perlin, p, 1.0, 2.0, 4.0),
        lambda: nz.hetero_terrain(nz.new_perlin, p, 1.0, 2.0, 4.0, 1.0),
        lambda: nz.hybrid_mfractal(nz.new_perlin, p, 1.0, 2.0, 4.0, 1.0, 1.0),
        lambda: nz.ridged_mfractal(nz.new_perlin, p, 1.0, 2.0, 4.0, 1.0, 2.0),
    ]:
        v = np.asarray(fn())
        assert np.isfinite(v).all()


def test_procedural_textures_eval():
    defs = [
        TextureDef(ttype=TexType.CLOUDS, color1=(0, 0, 0), color2=(1, 1, 1)),
        TextureDef(ttype=TexType.MARBLE, turb=5.0, sharpness=2.0),
        TextureDef(ttype=TexType.WOOD, rings=True, turb=3.0),
        TextureDef(ttype=TexType.MUSGRAVE, mus_type=MusgraveType.FBM),
        TextureDef(ttype=TexType.RGB_CUBE),
        TextureDef(ttype=TexType.BLEND, blend_type="sphere"),
        TextureDef(ttype=TexType.VORONOI, vor_type=nz.V_F2F1),
        TextureDef(ttype=TexType.DISTORTED, distort=2.0),
    ]
    ctex = build_texture_set(defs)
    n = 512
    p = _pts(n, 2.0)
    uv = jnp.asarray(np.random.default_rng(1).random((n, 2)), np.float32)
    for i in range(len(defs)):
        tid = jnp.full((n,), i, jnp.int32)
        rgba = np.asarray(eval_texture(ctex, tid, p, uv))
        assert np.isfinite(rgba).all(), defs[i].ttype
    # -1 => white
    rgba = np.asarray(eval_texture(ctex, jnp.full((n,), -1, jnp.int32), p, uv))
    np.testing.assert_allclose(rgba, 1.0)


def test_image_texture_bilinear():
    img = np.zeros((4, 8, 3), np.float32)
    img[:, 4:, 0] = 1.0      # right half red
    d = TextureDef(ttype=TexType.IMAGE, image=img, clip_mode="extend")
    ctex = build_texture_set([d])
    uv = jnp.asarray([[0.1, 0.5], [0.9, 0.5], [0.5, 0.5]], np.float32)
    tid = jnp.zeros((3,), jnp.int32)
    rgba = np.asarray(eval_texture(ctex, tid, jnp.zeros((3, 3)), uv))
    assert rgba[0, 0] < 0.1          # left: black
    assert rgba[1, 0] > 0.9          # right: red
    assert 0.2 < rgba[2, 0] < 0.8    # middle: blend


def test_textured_render_with_env_light():
    """Config #3 shape: textured mesh + env importance light."""
    import dataclasses
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions
    from core_tpu.backgrounds import make_gradient_background
    from core_tpu.lights.bg import make_bg_light

    scene = cornell_box(resx=16, resy=16, light_samples=2)
    checker = np.indices((8, 8)).sum(axis=0) % 2
    img = np.repeat(checker[..., None], 3, axis=-1).astype(np.float32)
    ctex = build_texture_set([
        TextureDef(ttype=TexType.IMAGE, image=img),
        TextureDef(ttype=TexType.MARBLE, turb=5.0),
    ])
    mats = scene.materials._replace(
        diffuse_tex=scene.materials.diffuse_tex.at[0].set(1))
    bg = make_gradient_background(horizon=(1.0, 0.9, 0.8),
                                  zenith=(0.3, 0.5, 1.0), power=0.5)
    bglight = make_bg_light(bg, samples=4, nv=32, nu=64)
    scene = dataclasses.replace(scene, textures=ctex, materials=mats,
                                background=bg,
                                lights=scene.lights + (bglight,))
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=0))
    image, _ = render_image(scene, opts)
    image = np.asarray(image)
    assert np.isfinite(image).all()
    assert image[..., :3].std() > 0.01   # texture creates variation
