"""Golden parity for the textured-mesh + IBL scene (BASELINE config #3;
round-4 verdict missing #2: the texture stack and bglight importance
CDFs had zero external numerical evidence).

Goldens: tests/golden/ms_*.npz rendered by refgold/driver_ms.cc — torus
+ ground with a checker.tga diffuse through texture_mapper(texco=uv)
nodes, lit ONLY by a sky.tga textureback with ibl=true (the reference's
auto-created bglight 2-D luminance CDF, bglight.cc:82-107).
core_tpu renders the identical scene (scenes.golden_mesh_scene).

What this anchors externally for the first time:
- image-texture lookup (TGA decode, V flip, repeat wrap, bilinear
  centers — the round-5 fix in textures/base.py came from this golden),
- UV mesh interpolation + smoothMesh normals at golden tolerance,
- spheremap background eval (sky region matches to ~0.01%),
- bglight importance sampling energy (hit region inherits the known
  reference self-shadow deficit: core_tpu BRIGHTER by the documented
  margin, same direction as the Cornell goldens).

Establishing it caught TWO real core_tpu bugs: the missing image V flip
and the pixel-center convention (u*(w-1) vs w*u-0.5).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.golden

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    return np.load(os.path.join(GOLDEN_DIR, name + ".npz"))["img"]


def _render(integrator, **kw):
    from core_tpu.scenes import golden_mesh_scene
    from core_tpu.render import render_image, RenderOptions
    from core_tpu.film import FilterType
    scene = golden_mesh_scene(resx=128, resy=128, ibl_samples=8)
    opts = RenderOptions(integrator=integrator, aa_samples=16, spp_chunk=2,
                         filter_size=1.0, filter_type=FilterType.BOX, **kw)
    img, _ = render_image(scene, opts)
    return np.asarray(img)


@pytest.fixture(scope="module")
def ms_dl_pair():
    from core_tpu.integrators.direct import DirectOptions
    ref = _load("ms_dl_128x128_16spp_ibl8")
    img = _render("directlight",
                  integrator_opts=DirectOptions(raydepth=3))
    return img[2:-2, 2:-2], ref[2:-2, 2:-2]


def test_ms_sky_region_matches(ms_dl_pair):
    """Directly-visible background: pure texture+spheremap eval, no MC
    noise — matches to a fraction of a percent."""
    img, ref = ms_dl_pair
    sky = ref[..., 3] < 0.5
    assert sky.sum() > 500
    m = img[sky][:, :3]
    r = ref[sky][:, :3]
    rel = abs(m.mean() - r.mean()) / r.mean()
    assert rel < 0.005, rel
    assert np.abs(m - r).mean() / r.mean() < 0.01


def test_ms_directlight_geometry_energy(ms_dl_pair):
    """Textured surfaces under IBL: core_tpu is known-BRIGHTER by the
    reference's grazing self-shadow deficit (refgold/README.md, same
    band as the Cornell pt golden: measured +9.0% here)."""
    img, ref = ms_dl_pair
    hit = ref[..., 3] > 0.5
    m = img[hit][:, :3]
    r = ref[hit][:, :3]
    rel = (m.mean() - r.mean()) / r.mean()
    assert 0.0 <= rel <= 0.15, rel


def test_ms_directlight_structure(ms_dl_pair):
    """Checker mapping + torus shading structure: block Pearson."""
    img, ref = ms_dl_pair
    bm = img[:120, :120, :3].reshape(12, 10, 12, 10, 3).mean((1, 3, 4))
    br = ref[:120, :120, :3].reshape(12, 10, 12, 10, 3).mean((1, 3, 4))
    rr = np.corrcoef(bm.ravel(), br.ravel())[0, 1]
    assert rr > 0.998, rr


def test_ms_pathtracing_matches():
    """Path-traced variant (indirect texture bleeding + IBL bounces)."""
    from core_tpu.integrators.path import PathOptions
    ref = _load("ms_pt_128x128_16spp_ps4_b2")
    img = _render("pathtracing",
                  integrator_opts=PathOptions(path_samples=4, bounces=2,
                                              raydepth=3))
    img, ref = img[2:-2, 2:-2], ref[2:-2, 2:-2]
    hit = ref[..., 3] > 0.5
    rel = (img[hit][:, :3].mean() - ref[hit][:, :3].mean()) \
        / ref[hit][:, :3].mean()
    assert 0.0 <= rel <= 0.18, rel
    bm = img[:120, :120, :3].reshape(12, 10, 12, 10, 3).mean((1, 3, 4))
    br = ref[:120, :120, :3].reshape(12, 10, 12, 10, 3).mean((1, 3, 4))
    rr = np.corrcoef(bm.ravel(), br.ravel())[0, 1]
    assert rr > 0.995, rr
