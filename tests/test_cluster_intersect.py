"""Two-level cluster intersection kernel (geometry/cluster_intersect.py)
vs the brute-force reference, in pallas interpret mode on CPU."""
import numpy as np
import jax.numpy as jnp

from core_tpu.scenes import cornell_box
from core_tpu.geometry import intersect as isect
from core_tpu.geometry import cluster_intersect as ck
from core_tpu.types import Rays
from core_tpu.vec import RaysS, V3


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(50, 500, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = np.full(n, 5e-4, np.float32)
    tmax = rng.uniform(10, 800, n).astype(np.float32)
    return o, d, tmin, tmax


def _soa(o, d, tmin, tmax):
    return RaysS(o=V3(*[jnp.asarray(o[:, i]) for i in range(3)]),
                 d=V3(*[jnp.asarray(d[:, i]) for i in range(3)]),
                 tmin=jnp.asarray(tmin), tmax=jnp.asarray(tmax))


def test_build_clusters_partition():
    g = cornell_box(resx=8, resy=8, light_samples=1).geom
    cl = ck.build_clusters(np.asarray(g.verts), np.asarray(g.tri_vidx),
                           max_leaf=8)
    ids = np.asarray(cl.tris[..., 9]).astype(np.int64).ravel()
    ids = ids[ids >= 0]
    # exact partition of all triangles
    assert sorted(ids.tolist()) == list(range(g.n_tris))
    # AABBs contain their triangles
    v = np.asarray(g.verts)
    f = np.asarray(g.tri_vidx)
    for c in range(cl.n_clusters):
        tid = np.asarray(cl.tris[c, :, 9]).astype(np.int64)
        tid = tid[tid >= 0]
        pts = v[f[tid]].reshape(-1, 3)
        assert (pts >= np.asarray(cl.aabb[c, 0:3]) - 1e-4).all()
        assert (pts <= np.asarray(cl.aabb[c, 3:6]) + 1e-4).all()


def test_cluster_closest_matches_brute():
    g = cornell_box(resx=8, resy=8, light_samples=1).geom
    cl = ck.build_clusters(np.asarray(g.verts), np.asarray(g.tri_vidx),
                           max_leaf=8)
    o, d, tmin, tmax = _rays(2048)
    hits_b = isect.closest_hit_brute(
        g, Rays(o=jnp.asarray(o), d=jnp.asarray(d), tmin=jnp.asarray(tmin),
                tmax=jnp.asarray(tmax)))
    hits_c = ck.closest_hit_clusters_s(cl, _soa(o, d, tmin, tmax),
                                       interpret=True)
    pb, pc = np.asarray(hits_b.prim), np.asarray(hits_c.prim)
    tb, tc = np.asarray(hits_b.t), np.asarray(hits_c.t)
    # same hit/miss classification and same nearest t everywhere; prim may
    # differ only on exact-t ties (rays through shared edges — the two
    # kernels visit triangles in different orders)
    np.testing.assert_array_equal(pb >= 0, pc >= 0)
    ok = tb > 0
    np.testing.assert_allclose(tc[ok], tb[ok], rtol=1e-5, atol=1e-4)
    diff = ok & (pb != pc)
    assert diff.mean() < 0.01
    np.testing.assert_allclose(tc[diff], tb[diff], rtol=1e-6, atol=1e-6)


def test_cluster_any_hit_matches_brute():
    g = cornell_box(resx=8, resy=8, light_samples=1).geom
    cl = ck.build_clusters(np.asarray(g.verts), np.asarray(g.tri_vidx),
                           max_leaf=8)
    o, d, tmin, tmax = _rays(2048, seed=3)
    a_b = isect.any_hit_brute(
        g, Rays(o=jnp.asarray(o), d=jnp.asarray(d), tmin=jnp.asarray(tmin),
                tmax=jnp.asarray(tmax)))
    a_c = ck.any_hit_clusters_s(cl, _soa(o, d, tmin, tmax), interpret=True)
    np.testing.assert_array_equal(np.asarray(a_b), np.asarray(a_c))


def test_cluster_exclude_prim():
    g = cornell_box(resx=8, resy=8, light_samples=1).geom
    cl = ck.build_clusters(np.asarray(g.verts), np.asarray(g.tri_vidx),
                           max_leaf=8)
    o, d, tmin, tmax = _rays(512, seed=5)
    hits = ck.closest_hit_clusters_s(cl, _soa(o, d, tmin, tmax),
                                     interpret=True)
    excl = jnp.asarray(np.asarray(hits.prim))
    hits2 = ck.closest_hit_clusters_s(cl, _soa(o, d, tmin, tmax),
                                      exclude_prim=excl, interpret=True)
    valid = np.asarray(hits.prim) >= 0
    assert (np.asarray(hits2.prim)[valid]
            != np.asarray(hits.prim)[valid]).all()


def test_cluster_any_hit_nee_bundle_matches_brute():
    """Shared-origin NEE bundle over the cluster accel vs concat brute."""
    import jax.numpy as jnp
    from core_tpu import vec
    from core_tpu.geometry import intersect as isect
    from core_tpu.types import Rays

    geom = cornell_box(resx=8, resy=8, light_samples=1).geom
    cl = ck.build_clusters(np.asarray(geom.verts),
                           np.asarray(geom.tri_vidx), max_leaf=8)
    rng = np.random.default_rng(11)
    N, K = 1280, 5
    o = rng.uniform([50, 50, 50], [500, 500, 500], (N, 3)).astype(np.float32)
    dirs, tcaps, cat_d, cat_t = [], [], [], []
    for _ in range(K):
        d = rng.normal(size=(N, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t = rng.uniform(10, 800, N).astype(np.float32)
        dirs.append(vec.v3(jnp.asarray(d)))
        tcaps.append(jnp.asarray(t))
        cat_d.append(d)
        cat_t.append(t)
    ex = rng.integers(0, geom.tri_vidx.shape[0], N).astype(np.int32)
    got = ck.any_hit_nee_clusters_s(
        cl, vec.v3(jnp.asarray(o)), jnp.full(N, 1e-4), dirs, tcaps,
        exclude_prim=jnp.asarray(ex), interpret=True)
    rays = Rays(o=jnp.asarray(np.tile(o, (K, 1))),
                d=jnp.asarray(np.concatenate(cat_d)),
                tmin=jnp.full(K * N, 1e-4),
                tmax=jnp.asarray(np.concatenate(cat_t)))
    want = isect.any_hit_brute(geom, rays,
                               exclude_prim=jnp.asarray(np.tile(ex, K)))
    assert (np.asarray(got) == np.asarray(want)).all()
