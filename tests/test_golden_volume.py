"""Golden parity for the volume subsystem (round-4 verdict missing #4:
SingleScatter + UniformVolume had internal tests only).

Golden: tests/golden/vol_ss_128x128_16spp.npz rendered by
refgold/driver_vol.cc (statically linked SingleScatterIntegrator.cc +
UniformVolume.cc + spotlight.cc): a 30-degree spotlight shaft through a
uniform fog box over a gray ground plane.

Establishing it caught TWO core_tpu/reference convention mismatches:
- the reference's single-scatter applies NO phase function (getInScatter
  is sum(lightTr*lcol/pdf); core's physically-normalized HG/(4pi) factor
  measured 12.6x darker than the oracle), and
- the reference CLAMPS the in-scatter to [0,1] before returning
  (SingleScatterIntegrator.cc:484 "povman test" clampRGBA01) — bright
  shafts saturate at exactly 1.0 in the golden.
Both are now mirrored (documented in integrators/volume.py).

The reference's optimize=1 (attenuation grid) mode is NOT golden-
anchored: on this box it segfaults at 64^2 and produces NaNs at 128^2
(races/uninitialized cells in its attenuationGridMap precompute), so
core_tpu's optimize mode is instead checked against its own
non-optimized marcher (the grid is a cache of the same transmittance).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.golden

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _render(optimize=False, res=128, spp=16):
    from core_tpu.scenes import golden_volume_scene
    from core_tpu.render import render_image, RenderOptions
    from core_tpu.film import FilterType
    from core_tpu.integrators.direct import DirectOptions
    from core_tpu.integrators.volume import VolumeOptions
    scene = golden_volume_scene(resx=res, resy=res)
    img, _ = render_image(scene, RenderOptions(
        aa_samples=spp, spp_chunk=2, filter_size=1.0,
        filter_type=FilterType.BOX,
        integrator_opts=DirectOptions(raydepth=1),
        volume_opts=VolumeOptions(integrator="singlescatter", steps=24,
                                  optimize=optimize)))
    return np.asarray(img)


@pytest.fixture(scope="module")
def vol_pair():
    ref = np.load(os.path.join(GOLDEN_DIR,
                               "vol_ss_128x128_16spp.npz"))["img"]
    img = _render()
    return img[2:-2, 2:-2], ref[2:-2, 2:-2]


def test_volume_shaft_matches_reference(vol_pair):
    """In-scatter (air) region: deterministic march vs the oracle."""
    img, ref = vol_pair
    air = ref[..., 3] < 0.5
    m = img[air][:, :3]
    r = ref[air][:, :3]
    assert abs(m.mean() - r.mean()) / max(r.mean(), 1e-6) < 0.02
    assert np.abs(m - r).mean() / max(r.mean(), 1e-6) < 0.04


def test_volume_ground_matches_reference(vol_pair):
    """Surface through fog: transmittance * direct + in-scatter."""
    img, ref = vol_pair
    hit = ref[..., 3] > 0.5
    m = img[hit][:, :3]
    r = ref[hit][:, :3]
    assert abs(m.mean() - r.mean()) / r.mean() < 0.02
    bm = img[:120, :120, :3].reshape(12, 10, 12, 10, 3).mean((1, 3, 4))
    br = ref[:120, :120, :3].reshape(12, 10, 12, 10, 3).mean((1, 3, 4))
    rr = np.corrcoef(bm.ravel(), br.ravel())[0, 1]
    assert rr > 0.999, rr


def test_volume_attenuation_grid_consistent():
    """optimize=True (per-light attenuation grids) vs the direct march —
    self-consistency since the reference's own optimize mode crashes."""
    a = _render(optimize=False, res=64, spp=4)
    b = _render(optimize=True, res=64, spp=4)
    rel = abs(b[..., :3].mean() - a[..., :3].mean()) \
        / max(a[..., :3].mean(), 1e-6)
    assert rel < 0.03, rel
