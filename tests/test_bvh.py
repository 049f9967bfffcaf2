"""BVH: numpy and native C++ builders agree with brute-force traversal."""
import numpy as np
import jax.numpy as jnp
import pytest

from core_tpu.types import Rays
from core_tpu.geometry import bvh as bvh_mod
from core_tpu.geometry import intersect as isect
from core_tpu.scenes import cornell_box


def _random_rays(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(o=o, d=d, tmin=jnp.zeros(n), tmax=jnp.full(n, -1.0))


@pytest.mark.parametrize("native", [False, True], ids=["numpy", "cpp"])
def test_bvh_matches_brute_force(native):
    scene = cornell_box(resx=8, resy=8, light_samples=1,
                        intersector="brute")
    g = scene.geom
    if native:
        from core_tpu import native as native_mod
        if not native_mod.available():
            pytest.skip("native toolchain unavailable")
    bvh = bvh_mod.build_bvh(np.asarray(g.verts), np.asarray(g.tri_vidx),
                            force_native=native)
    rays = _random_rays(512, 50, 500)
    ref = isect.closest_hit_brute(g, rays)
    got = bvh_mod.closest_hit_bvh(g, bvh, rays)
    match = (np.asarray(ref.prim) == np.asarray(got.prim))
    assert match.mean() > 0.995   # coplanar-overlap ties may differ
    ok = (np.asarray(ref.prim) >= 0) & match
    np.testing.assert_allclose(np.asarray(ref.t)[ok], np.asarray(got.t)[ok],
                               rtol=1e-4)


def test_native_builder_large_mesh():
    from core_tpu import native as native_mod
    if not native_mod.available():
        pytest.skip("native toolchain unavailable")
    # random triangle soup, 30k tris
    rng = np.random.default_rng(1)
    T = 30000
    base = rng.uniform(0, 100, (T, 3)).astype(np.float32)
    verts = np.concatenate([base, base + rng.uniform(0.1, 1.0, (T, 3)),
                            base + rng.uniform(0.1, 1.0, (T, 3))], axis=0)
    tris = np.stack([np.arange(T), np.arange(T) + T, np.arange(T) + 2 * T],
                    axis=1).astype(np.int32)
    nmin, nmax, left, count, order = native_mod.build_bvh_native(verts, tris)
    assert sorted(order.tolist()) == list(range(T))   # permutation
    # leaves cover all triangles exactly once
    leaves = left < 0
    total = count[leaves].sum()
    assert total == T
    # parent boxes contain children
    inner = ~leaves
    li = left[inner]
    assert (nmin[inner] <= nmin[li] + 1e-4).all()
    assert (nmax[inner] >= nmax[li] - 1e-4).all()


def test_any_hit_nee_bundle_matches_brute():
    """Shared-origin NEE kernel (K rays per lane) vs concatenated brute."""
    import jax.numpy as jnp
    from core_tpu.scenes import cornell_box
    from core_tpu.geometry import pallas_intersect as pk
    from core_tpu.geometry import intersect as isect
    from core_tpu.types import Rays
    from core_tpu import vec

    s = cornell_box(resx=8, resy=8, light_samples=1)
    rng = np.random.default_rng(7)
    N, K = 1536, 6
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
    ex = rng.integers(0, s.geom.n_tris, N).astype(np.int32)
    got = pk.any_hit_nee_pallas_s(
        s.geom, vec.v3(jnp.asarray(o)), jnp.full(N, 5e-4), dirs, tcaps,
        exclude_prim=jnp.asarray(ex), interpret=True)
    co = np.tile(o, (K, 1))
    rays = Rays(o=jnp.asarray(co), d=jnp.asarray(np.concatenate(cat_d)),
                tmin=jnp.full(K * N, 5e-4),
                tmax=jnp.asarray(np.concatenate(cat_t)))
    want = isect.any_hit_brute(s.geom, rays,
                               exclude_prim=jnp.asarray(np.tile(ex, K)))
    assert (np.asarray(got) == np.asarray(want)).all()


def test_any_hit_nee_dead_and_coherent_bundles():
    """NEE bundle kernel on coherent floor-to-light bundles plus dead
    rays (0 < tcap <= tmin, the masked-invalid-MIS-lane encoding used by
    integrators/common.py) — dead rays must never report occlusion."""
    import jax.numpy as jnp
    from core_tpu.scenes import cornell_box
    from core_tpu.geometry import pallas_intersect as pk
    from core_tpu.geometry import intersect as isect
    from core_tpu.types import Rays
    from core_tpu import vec

    s = cornell_box(resx=8, resy=8, light_samples=1)
    rng = np.random.default_rng(11)
    N, K = 640, 4
    # origins on the floor, targets near the ceiling light (a coherent
    # upward NEE bundle, the common wavefront case)
    o = np.stack([rng.uniform(10, 540, N), np.full(N, 1.0),
                  rng.uniform(10, 540, N)], 1).astype(np.float32)
    tgt = np.stack([rng.uniform(213, 343, (K, N)),
                    np.full((K, N), 548.0),
                    rng.uniform(227, 332, (K, N))], -1).astype(np.float32)
    dirs, tcaps, cat_d, cat_t = [], [], [], []
    for k in range(K):
        d = tgt[k] - o
        t = np.linalg.norm(d, axis=1).astype(np.float32)
        d = (d / t[:, None]).astype(np.float32)
        t = t - 0.5   # back off the target surface (as NEE's shadow bias
        # does) so t ~= tcap boundary rounding can't differ between the
        # division-free kernel and the brute reference
        if k == K - 1:
            t = np.full(N, 2.5e-4, np.float32)   # dead rays: tcap < tmin
        dirs.append(vec.v3(jnp.asarray(d)))
        tcaps.append(jnp.asarray(t))
        cat_d.append(d)
        cat_t.append(t)
    got = pk.any_hit_nee_pallas_s(
        s.geom, vec.v3(jnp.asarray(o)), jnp.full(N, 5e-4), dirs, tcaps,
        interpret=True)
    rays = Rays(o=jnp.asarray(np.tile(o, (K, 1))),
                d=jnp.asarray(np.concatenate(cat_d)),
                tmin=jnp.full(K * N, 5e-4),
                tmax=jnp.asarray(np.concatenate(cat_t)))
    want = isect.any_hit_brute(s.geom, rays)
    assert (np.asarray(got) == np.asarray(want)).all()
    assert not np.asarray(got)[(K - 1) * N:].any()          # dead rays
    assert np.asarray(got)[:N].any()                        # blocks occlude
