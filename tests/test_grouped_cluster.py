"""Grouped (conditional-DMA) cluster kernels == flat cluster sweep.

The grouped v2/v3 kernels (cluster_intersect.py: _grouped_kernel,
_grouped_any_kernel) normally engage only above GROUPED_MIN_CLUSTERS
(~260k tris); here grouping is forced onto a small mesh scene (group=8,
one octet per group) so the CPU CI covers the conditional-DMA code paths
in interpret mode against the flat sweep, which is itself covered against
the brute Pallas kernel elsewhere (test_cluster_intersect.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from core_tpu import vec


@pytest.fixture(scope="module")
def grouped_pair():
    from core_tpu.scenes import mesh_scene
    from core_tpu.geometry import cluster_intersect as ck

    sc = mesh_scene(resx=8, resy=8, n_grid=40, torus_u=24, torus_v=12,
                    ibl_samples=2, sun_samples=1)
    cl = ck.build_clusters(np.asarray(sc.geom.verts),
                           np.asarray(sc.geom.tri_vidx))
    assert cl.grouped is None      # below the auto-group threshold
    clg = cl._replace(grouped=ck.group_clusters(
        cl, group=8, sort_origin=np.asarray(sc.camera.pos)))
    return cl, clg


def _wavefront(n=2048, seed=1):
    rng = np.random.default_rng(seed)
    o = vec.V3(jnp.asarray(rng.uniform(-3, 3, n).astype(np.float32)),
               jnp.asarray(rng.uniform(0.2, 3.0, n).astype(np.float32)),
               jnp.asarray(rng.uniform(-3, 3, n).astype(np.float32)))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, vec.v3(jnp.asarray(d)), n


def test_grouped_closest_hit_matches_flat(grouped_pair):
    from core_tpu.geometry import cluster_intersect as ck
    cl, clg = grouped_pair
    o, d3, n = _wavefront()
    rays = vec.RaysS(o=o, d=d3, tmin=jnp.full(n, 5e-4),
                     tmax=jnp.full(n, -1.0))
    hf = ck.closest_hit_clusters_s(cl, rays, interpret=True)
    hg = ck.closest_hit_grouped_s(clg, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(hf.prim), np.asarray(hg.prim))
    np.testing.assert_allclose(np.asarray(hf.t), np.asarray(hg.t),
                               rtol=1e-6)
    assert float((hf.prim >= 0).mean()) > 0.3    # scene actually hit


def test_grouped_any_hit_matches_flat(grouped_pair):
    from core_tpu.geometry import cluster_intersect as ck
    cl, clg = grouped_pair
    o, d3, n = _wavefront(seed=2)
    rays = vec.RaysS(o=o, d=d3, tmin=jnp.full(n, 5e-4),
                     tmax=jnp.full(n, 4.0))
    af = ck.any_hit_clusters_s(cl, rays, interpret=True)
    ag = ck.any_hit_clusters_s(clg, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(af), np.asarray(ag))


def test_grouped_nee_bundle_matches_flat(grouped_pair):
    """Grouped NEE = K per-direction exact-slab sweeps (the union-slab
    bundle collapses at scale; see _grouped_any_kernel docstring) — must
    equal the flat bundle kernel bit-for-bit, mixed caps included."""
    from core_tpu.geometry import cluster_intersect as ck
    cl, clg = grouped_pair
    o, _, n = _wavefront(seed=3)
    rng = np.random.default_rng(4)
    K = 3
    dirs, tcaps = [], []
    for cap in (50.0, -1.0, 3.0):
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs.append(vec.v3(jnp.asarray(d)))
        tcaps.append(jnp.full(n, cap))
    tmin = jnp.full(n, 5e-4)
    nf = ck.any_hit_nee_clusters_s(cl, o, tmin, dirs, tcaps, interpret=True)
    ng = ck.any_hit_nee_clusters_s(clg, o, tmin, dirs, tcaps,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(nf), np.asarray(ng))


def test_blocked_adaptive_resample_matches_brute():
    """Adaptive-AA passes on a cluster scene exercise the BLOCKED
    resample-mask path (render.py _block_from_raster2d): the blocked
    pixel permutation must agree with the mask layout, or resampled
    pixels land in the wrong blocks.  Brute rendering of the same scene
    is the oracle (identical QMC streams -> identical images)."""
    import dataclasses
    import numpy as np
    from core_tpu.scenes import mesh_scene
    from core_tpu.render import RenderOptions, render_image
    from core_tpu.integrators.direct import DirectOptions
    from core_tpu.geometry.cluster_intersect import build_clusters

    sc = mesh_scene(resx=64, resy=64, n_grid=24, torus_u=16, torus_v=8,
                    ibl_samples=1, sun_samples=1)
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=1),
                         aa_passes=2, aa_samples=2, aa_inc_samples=2,
                         aa_threshold=0.01)
    accel = build_clusters(np.asarray(sc.geom.verts),
                           np.asarray(sc.geom.tri_vidx),
                           sort_origin=np.asarray(sc.camera.pos))
    sc_c = dataclasses.replace(sc, intersector="cluster", accel=accel)
    sc_b = dataclasses.replace(sc, intersector="brute", accel=None)
    img_c, _ = render_image(sc_c, opts)
    img_b, _ = render_image(sc_b, opts)
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_b),
                               atol=5e-5)
