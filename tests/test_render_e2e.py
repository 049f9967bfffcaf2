"""End-to-end render tests: Cornell box with the direct-lighting integrator."""
import numpy as np
import pytest

from core_tpu.scenes import cornell_box
from core_tpu.render import render_image, RenderOptions


@pytest.fixture(scope="module")
def cornell_img():
    scene = cornell_box(resx=64, resy=64, light_samples=4, with_blocks=True)
    opts = RenderOptions(aa_samples=2, spp_chunk=2)
    img, film = render_image(scene, opts)
    return np.asarray(img)


def test_no_nans_and_finite(cornell_img):
    assert np.isfinite(cornell_img).all()


def test_alpha_is_one(cornell_img):
    # closed box: every camera ray hits geometry
    assert np.all(cornell_img[..., 3] > 0.999)


def test_wall_colors(cornell_img):
    left = cornell_img[28:36, 2:8, :3].mean(axis=(0, 1))
    right = cornell_img[28:36, -8:-2, :3].mean(axis=(0, 1))
    # left wall red-dominant, right wall green-dominant
    assert left[0] > 1.5 * left[1] and left[0] > 1.5 * left[2]
    assert right[1] > 1.2 * right[0] and right[1] > 1.2 * right[2]


def test_light_visible(cornell_img):
    # emissive quad on the ceiling is the brightest region
    top = cornell_img[4:14, 20:44, :3].max()
    assert top > 5.0
    assert top == cornell_img[..., :3].max()


def test_energy_reasonable(cornell_img):
    mean = cornell_img[..., :3].mean()
    assert 0.05 < mean < 2.0


def test_deterministic():
    scene = cornell_box(resx=32, resy=32, light_samples=2, with_blocks=False)
    opts = RenderOptions(aa_samples=1, spp_chunk=1)
    img1, _ = render_image(scene, opts)
    img2, _ = render_image(scene, opts)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
