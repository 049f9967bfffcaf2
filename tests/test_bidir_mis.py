"""BDPT pdf-ratio MIS (bidirpath.cc pathWeight, maximum heuristic).

Round-2 verdict item 2: replace uniform 1/n_k technique weighting with
the reference's pdf-ratio weighting.  Tests: technique weights partition
unity per path (exactly one winner), and the caustic capability the
weighting exists for — light-subpath connections carry energy through a
glass block that an equal-budget path tracer cannot find.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from core_tpu.integrators.bidir import _path_weight


def _synthetic_path(k, seed, n=64):
    """Random positive per-vertex pdfs/Gs for a length-k unified path."""
    rng = np.random.default_rng(seed)

    def arr():
        return jnp.asarray(rng.uniform(0.2, 5.0, n).astype(np.float32))

    pdf_f = [arr() for _ in range(k + 1)]
    pdf_b = [arr() for _ in range(k + 1)]
    G = [arr() for _ in range(k + 1)]
    spec = [None] * (k + 1)
    # make technique 0 (emission-position sampling) never win so the
    # s=1..k sweep partitions unity: p[0] = p[1]*pdf_b[1]*G[1]/pdf_A_0,
    # so a LARGE area pdf drives technique 0's relative pdf to ~0
    pdf_A_0 = jnp.full(n, 1e9, jnp.float32)
    return pdf_f, pdf_b, G, spec, pdf_A_0


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_max_heuristic_weights_partition_unity(k):
    """For one fixed path, the technique pdfs p[1..k] are shared ratios:
    exactly ONE technique s must get weight 1 (ties are measure-zero with
    random pdfs), so summing the weight over s gives 1 per lane."""
    pdf_f, pdf_b, G, spec, pdf_A_0 = _synthetic_path(k, seed=k)
    ones = jnp.ones_like(pdf_A_0)
    total = jnp.zeros_like(pdf_A_0)
    for s in range(1, k + 1):
        w = _path_weight(pdf_f, pdf_b, G, spec, pdf_A_0, s, k,
                         light_image=True, singular_l=jnp.zeros_like(
                             pdf_A_0, bool),
                         pdf_illum=ones, pdf_emit=ones)
        total = total + w
    np.testing.assert_array_equal(np.asarray(total), 1.0)


@pytest.mark.parametrize("k", [3, 4])
def test_specular_vertices_zero_adjacent_techniques(k):
    """A specular scatter at vertex i forbids connecting through it:
    techniques i and i+1 must get weight 0 on those lanes."""
    pdf_f, pdf_b, G, spec, pdf_A_0 = _synthetic_path(k, seed=10 + k)
    n = pdf_A_0.shape[0]
    ones = jnp.ones(n, jnp.float32)
    spec = list(spec)
    spec_mask = jnp.asarray(np.arange(n) % 2 == 0)
    i_spec = 1
    spec[i_spec] = spec_mask
    for s in (i_spec, i_spec + 1):
        if s < 1 or s > k:
            continue
        w = _path_weight(pdf_f, pdf_b, G, spec, pdf_A_0, s, k,
                         light_image=True,
                         singular_l=jnp.zeros(n, bool),
                         pdf_illum=ones, pdf_emit=ones)
        w = np.asarray(w)
        assert (w[np.asarray(spec_mask)] == 0.0).all()


def test_bdpt_finds_glass_caustics_pt_cannot():
    """Light subpaths refract through the glass block and connect to eye
    vertices on the floor: at equal (tiny) sample budgets BDPT deposits
    caustic energy under the block where the bounces=1 path tracer's
    path-caustic sampling finds essentially none
    (the scenario pdf-ratio BDPT exists for; uniform weighting drowned
    it in connection noise)."""
    from core_tpu.scenes import cornell_box
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.bidir import BidirOptions
    from core_tpu.integrators.path import PathOptions

    scene = cornell_box(resx=16, resy=16, light_samples=2,
                        block_materials=("glass", "white"),
                        intersector="brute")
    img_bd, _ = render_image(scene, RenderOptions(
        integrator="bidirectional",
        integrator_opts=BidirOptions(eye_depth=3, light_depth=3,
                                     do_light_image=False),
        aa_samples=2, spp_chunk=2))
    img_pt, _ = render_image(scene, RenderOptions(
        integrator="pathtracing",
        integrator_opts=PathOptions(path_samples=6, bounces=1, raydepth=3,
                                    caustic_type="path"),
        aa_samples=2, spp_chunk=2))
    img_bd = np.asarray(img_bd)[..., :3]
    img_pt = np.asarray(img_pt)[..., :3]
    assert np.isfinite(img_bd).all() and np.isfinite(img_pt).all()
    # floor region in front of the short (glass) block: rows near the
    # bottom of the image, left half (camera at -z looking at +z)
    region_bd = img_bd[12:16, 2:8].mean()
    region_pt = img_pt[12:16, 2:8].mean()
    assert region_bd > 0.01
    # BDPT light-path transport reaches the region with refracted energy;
    # the crippled PT (bounces=1) only gets direct light there
    assert region_bd > region_pt * 1.05, (region_bd, region_pt)
