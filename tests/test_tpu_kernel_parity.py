"""TPU-compiled Pallas kernels == interpret mode (round-2 verdict weak #10).

The CPU suite covers the kernels in interpret mode only; this tier
asserts the COMPILED TPU kernels produce identical results on a fixed
wavefront.  Skipped unless a TPU backend is reachable (the CPU CI
conftest forces JAX_PLATFORMS=cpu, so these only run on TPU hosts —
`python tests/test_tpu_kernel_parity.py` runs them standalone there).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tpu_device():
    try:
        devs = jax.devices("tpu")
        return devs[0] if devs else None
    except RuntimeError:
        return None


pytestmark = pytest.mark.skipif(_tpu_device() is None,
                                reason="needs a TPU backend")


def _wavefront(n=1024, seed=3):
    from core_tpu import vec
    rng = np.random.default_rng(seed)
    o = np.array([278.0, 273.0, -500.0], np.float32) \
        + rng.normal(0, 40, (n, 3)).astype(np.float32)
    tgt = np.stack([rng.uniform(50, 500, n), rng.uniform(50, 500, n),
                    rng.uniform(50, 500, n)], 1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return vec.v3(jnp.asarray(o)), vec.v3(jnp.asarray(d))


def test_pallas_brute_any_hit_compiled_matches_interpret():
    from core_tpu.scenes import cornell_box
    from core_tpu.geometry import pallas_intersect as pk
    from core_tpu import vec

    scene = cornell_box(resx=8, resy=8, light_samples=1)
    o3, d3 = _wavefront()
    n = o3.x.shape[0]
    tmin = jnp.full(n, 5e-4)
    tcap = jnp.full(n, -1.0)        # open rays
    rays = vec.RaysS(o=o3, d=d3, tmin=tmin, tmax=tcap)
    got_c = pk.any_hit_pallas_s(scene.geom, rays)
    got_i = pk.any_hit_pallas_s(scene.geom, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(got_i))


def test_pallas_closest_hit_compiled_matches_interpret():
    from core_tpu.scenes import cornell_box
    from core_tpu.geometry import pallas_intersect as pk
    from core_tpu import vec

    scene = cornell_box(resx=8, resy=8, light_samples=1)
    o3, d3 = _wavefront(seed=5)
    n = o3.x.shape[0]
    rays = vec.RaysS(o=o3, d=d3, tmin=jnp.full(n, 5e-4),
                     tmax=jnp.full(n, -1.0))
    hc = pk.closest_hit_pallas_s(scene.geom, rays)
    hi = pk.closest_hit_pallas_s(scene.geom, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(hc.prim), np.asarray(hi.prim))
    np.testing.assert_allclose(np.asarray(hc.t), np.asarray(hi.t),
                               rtol=1e-6)


def test_cluster_any_hit_nee_compiled_matches_interpret():
    from core_tpu.scenes import mesh_scene
    from core_tpu.geometry import cluster_intersect as ck
    from core_tpu import vec

    scene = mesh_scene(resx=8, resy=8)
    accel = scene.accel
    if accel is None:
        from core_tpu.geometry.cluster_intersect import build_clusters
        accel = build_clusters(np.asarray(scene.geom.verts),
                               np.asarray(scene.geom.tri_vidx))
    o3, d3 = _wavefront(seed=7)
    n = o3.x.shape[0]
    # scale the wavefront into the mesh scene's world (terrain around 0)
    o3 = vec.V3(o3.x * 0.01, o3.y * 0.01 + 2.0, o3.z * 0.01)
    tmin = jnp.full(n, 5e-4)
    tcaps = [jnp.full(n, 50.0), jnp.full(n, -1.0)]
    dirs = [d3, vec.V3(-d3.x, -d3.y, -d3.z)]
    got_c = ck.any_hit_nee_clusters_s(accel, o3, tmin, dirs, tcaps)
    got_i = ck.any_hit_nee_clusters_s(accel, o3, tmin, dirs, tcaps,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(got_i))


def test_grouped_compiled_matches_interpret():
    """Grouped conditional-DMA kernels (closest + NEE sweeps), compiled
    vs interpret on TPU — grouping forced onto the small mesh scene
    exactly like the CPU tier (tests/test_grouped_cluster.py)."""
    from core_tpu.scenes import mesh_scene
    from core_tpu.geometry import cluster_intersect as ck
    from core_tpu import vec

    sc = mesh_scene(resx=8, resy=8, n_grid=40, torus_u=24, torus_v=12,
                    ibl_samples=2, sun_samples=1)
    cl = ck.build_clusters(np.asarray(sc.geom.verts),
                           np.asarray(sc.geom.tri_vidx))
    clg = cl._replace(grouped=ck.group_clusters(
        cl, group=8, sort_origin=np.asarray(sc.camera.pos)))
    rng = np.random.default_rng(11)
    n = 2048
    o = vec.V3(jnp.asarray(rng.uniform(-3, 3, n).astype(np.float32)),
               jnp.asarray(rng.uniform(0.2, 3.0, n).astype(np.float32)),
               jnp.asarray(rng.uniform(-3, 3, n).astype(np.float32)))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = vec.RaysS(o=o, d=vec.v3(jnp.asarray(d)),
                     tmin=jnp.full(n, 5e-4), tmax=jnp.full(n, -1.0))
    hc = ck.closest_hit_grouped_s(clg, rays, interpret=False)
    hi = ck.closest_hit_grouped_s(clg, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(hc.prim), np.asarray(hi.prim))

    dirs, tcaps = [], []
    for cap in (50.0, -1.0, 3.0):
        dd = rng.normal(size=(n, 3)).astype(np.float32)
        dd /= np.linalg.norm(dd, axis=1, keepdims=True)
        dirs.append(vec.v3(jnp.asarray(dd)))
        tcaps.append(jnp.full(n, cap))
    nc = ck.any_hit_nee_clusters_s(clg, o, jnp.full(n, 5e-4), dirs, tcaps,
                                   interpret=False)
    ni = ck.any_hit_nee_clusters_s(clg, o, jnp.full(n, 5e-4), dirs, tcaps,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(nc), np.asarray(ni))


if __name__ == "__main__":
    # standalone TPU runner (bypasses the CPU-forcing conftest)
    for t in (test_pallas_brute_any_hit_compiled_matches_interpret,
              test_pallas_closest_hit_compiled_matches_interpret,
              test_cluster_any_hit_nee_compiled_matches_interpret,
              test_grouped_compiled_matches_interpret):
        t()
        print(f"{t.__name__}: ok")
