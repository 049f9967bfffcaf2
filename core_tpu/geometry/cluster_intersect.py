"""Two-level clustered intersection for large scenes (Pallas TPU).

The reference's SAH kd-tree traversal (triKdTree_t::Intersect,
src/yafraycore/kdtree.cc) is per-ray pointer chasing — on TPU any
per-lane node walk is gather-bound (the scalar unit serves ~1 gathered
element/cycle; a 524k-lane wavefront pays ~3 ms per traversal STEP, and a
pure-jnp stack walk also streams an [N, depth] stack through HBM every
iteration — measured 19 s/chunk at 143k triangles).

TPU-native replacement: a shallow two-level scheme with NO per-lane
gathers or stacks —
  host:   triangles are partitioned into axis-median clusters of <= 256,
          padded to exactly CLUSTER tris ([C, 256, 9] table).
  device: grid (ray_tile, cluster); the cluster's triangle block is
          DMA'd into SMEM by BlockSpec streaming (double-buffered, 9 KB);
          every tile slab-tests the cluster AABB for all 1024 lanes and
          skips the 256-triangle Möller-Trumbore loop with @pl.when when
          no lane's interval overlaps — packet culling at tile
          granularity.  Output blocks stay VMEM-resident across the
          cluster sweep (grid iterates clusters innermost).

Ray inputs are ten separate [rows, 128] refs (see pallas_intersect.py:
stacked [3, rows, 128] inputs cost a full HBM copy per component per
launch; [N] -> [rows, 128] reshapes are free).

The any-hit (shadow) variant is a dedicated kernel: division-free
sign-folded Möller-Trumbore (no per-triangle reciprocal), a single i32
occlusion carry instead of t/prim/u/v, and tiles whose lanes are all
occluded skip every remaining cluster's triangle loop (the AABB gate
drops lanes that already hit).

Cost model: DMA = C x 10 KB per 1024-ray tile (fully overlapped); compute
= (clusters AABB-hit by the tile) x 256 MT tests.  Coherent tiles
(camera rays, shadow rays toward one light) touch a handful of clusters.

Measured (v5e, 143k-tri scene, 256x256 direct-light chunk = 65k primary
+ 524k shadow lanes): 2.07 s/chunk vs 19.4 s for the per-ray jnp BVH
walk (9.4x) with identical images; host cluster build 0.5 s for 143k
tris.

Multi-million-triangle scenes use the GROUPED path (v2-v4, second half
of this file): clusters grouped 64-at-a-time, triangle blocks HBM-
resident and DMA'd only on a passing gate (pltpu.make_async_copy),
octet-union AABBs so one slab + one scalar reduce gates 8 clusters,
a scalar-prefetched PER-TILE group visit order (each ray tile sweeps
near-origin groups first — the lockstep-grid answer to kd-tree
front-to-back), and per-lane direction RANK PACKING for NEE bundles
(grazing shadow rays concentrate into the last sweeps).  Ray tiles
must be spatially coherent to gate well: render.py orders camera
wavefronts in 32x32 pixel blocks (one block = one Pallas tile).

Measured (v5e, 1.017M-tri big_scene, 1024^2 direct-light chunk,
ibl 4 + sun 2): camera closest-hit 130 ms (8.1 Mrays/s), full chunk
58.3 -> 14.5 s across round 4 (kernel v4 38.6, + dead caps for masked
NEE lanes 24.3, + gather-free noise 14.5), 14.5 -> 9.6 s in round 5
(v5 global NEE re-bucketing + per-tile done flag; profile: occlusion
sweeps 8.3 s, closest-hit 0.47 s, sorts 0.29 s, shading ~0.5 s).

Round-5 structural finding (measured, gate-count diagnostics over the
captured 8.4M-lane IBL bundle): after re-bucketing, a tile's mean gated
clusters is 158.8 (p99 1364) — ~20x the per-ray ideal (~8).  The gap is
POPULATION-LIMITED, not key-limited: tiles of 1024 lanes can only be as
coherent as 8.4M rays spread over (direction x origin) allow; every
finer direction binning tried (16x16, 32x32, interleaved, origin-major)
measured WORSE total gate counts, and 32-tri sub-AABB gating only cut
MT tests 166M -> 128M (dud).  Lockstep tiling pays ~(tile spread /
cluster size) x corridor length; closing the remaining gap needs more
rays per launch (amortizes bucket population), not a better sort key.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from core_tpu.types import Hits

BIG = 3.0e38
SUB = 8
LANES = 128
TILE = SUB * LANES
CLUSTER = 256           # triangles per cluster (padded)


class ClusterData(NamedTuple):
    aabb: jnp.ndarray       # [C, 8] f32: bmin(3), bmax(3), pad
    tris: jnp.ndarray       # [C, CLUSTER, 10] f32: v0, e1, e2, tri_id
                            # (id stored as f32 -- exact below 2^24 tris;
                            # a 2-D i32 side table would violate the
                            # pallas (8,128)-divisibility block rule)
    grouped: "GroupedData" = None   # v2 two-level data for big scenes

    @property
    def n_clusters(self) -> int:
        return self.aabb.shape[0]


GROUPED_MIN_CLUSTERS = 1024     # flat sweep below this (~260k tris)

# global NEE re-bucketing across tiles (v5) — see any_hit_nee_clusters_s;
# env knob for A/B measurement only
NEE_REBUCKET = os.environ.get("CORE_TPU_NEE_REBUCKET", "1") != "0"


def _resolve_interpret(interpret):
    """interpret=None -> interpret off on TPU, on elsewhere: compiled
    Pallas TPU kernels cannot lower on the CPU backend, and the CPU CI
    exercises the cluster paths through the plain scene API (which has
    no interpret plumbing)."""
    if interpret is not None:
        return interpret
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def build_clusters(verts: np.ndarray, tri_vidx: np.ndarray,
                   max_leaf: int | None = None,
                   sort_origin=None) -> ClusterData:
    """Axis-median recursive partition into <=max_leaf-tri clusters.
    Above GROUPED_MIN_CLUSTERS the two-level grouped data (v2 kernel,
    conditional DMA) is attached and used automatically; sort_origin
    (usually the camera position) orders it front-to-back.

    max_leaf None = auto: 256 for flat-sweep scenes, 128 at grouped
    scale — tighter boxes halve the Möller-Trumbore work per gated
    cluster, which dominates big-scene sweeps (gate diagnostics put
    the per-tile cluster union at ~200 for spread NEE directions);
    128 is also the Pallas lane-dim floor for the SMEM triangle block."""
    verts = np.asarray(verts, np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)
    if max_leaf is None:
        max_leaf = 128 if tri_vidx.shape[0] >= GROUPED_MIN_CLUSTERS * CLUSTER \
            else CLUSTER
    v0 = verts[tri_vidx[:, 0]]
    v1 = verts[tri_vidx[:, 1]]
    v2 = verts[tri_vidx[:, 2]]
    cent = (v0 + v1 + v2) / 3.0
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    T = tri_vidx.shape[0]
    order = np.arange(T)
    clusters = []
    stack = [(0, T)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo <= max_leaf:
            clusters.append(order[lo:hi].copy())
            continue
        ids = order[lo:hi]
        c = cent[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        mid = (lo + hi) // 2
        part = np.argpartition(c[:, axis], mid - lo)
        order[lo:hi] = ids[part]
        stack.append((lo, mid))
        stack.append((mid, hi))

    C = len(clusters)
    aabb = np.zeros((C, 8), np.float32)
    tris = np.zeros((C, max_leaf, 10), np.float32)
    tris[:, :, 9] = -1.0
    for ci, ids in enumerate(clusters):
        aabb[ci, 0:3] = tmin[ids].min(0)
        aabb[ci, 3:6] = tmax[ids].max(0)
        k = len(ids)
        tris[ci, :k, 0:3] = v0[ids]
        tris[ci, :k, 3:6] = v1[ids] - v0[ids]
        tris[ci, :k, 6:9] = v2[ids] - v0[ids]
        tris[ci, :k, 9] = ids.astype(np.float32)
    cl = ClusterData(aabb=jnp.asarray(aabb), tris=jnp.asarray(tris))
    if C >= GROUPED_MIN_CLUSTERS:
        cl = cl._replace(grouped=group_clusters(cl,
                                                sort_origin=sort_origin))
    return cl


def _slab_test(aabb_ref, c, ox, oy, oz, dx, dy, dz, tmin, tcap):
    """Per-lane ray/AABB interval overlap for cluster c (SMEM scalars)."""
    eps = 1e-20

    def axis_int(o, d, b0, b1):
        inv = 1.0 / jnp.where(jnp.abs(d) < eps,
                              jnp.where(d < 0, -eps, eps), d)
        q0 = (b0 - o) * inv
        q1 = (b1 - o) * inv
        return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

    nx, fx = axis_int(ox, dx, aabb_ref[c, 0], aabb_ref[c, 3])
    ny, fy = axis_int(oy, dy, aabb_ref[c, 1], aabb_ref[c, 4])
    nz, fz = axis_int(oz, dz, aabb_ref[c, 2], aabb_ref[c, 5])
    tn = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, tmin))
    tf = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, tcap))
    return tn <= tf


def _kernel(csize: int,
            aabb_ref, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
            dz_ref, tmin_ref, tcap_ref, ex0_ref, ex1_ref,
            t_ref, prim_ref, u_ref, v_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        t_ref[...] = jnp.full((SUB, LANES), BIG, jnp.float32)
        prim_ref[...] = jnp.full((SUB, LANES), -1, jnp.int32)
        u_ref[...] = jnp.zeros((SUB, LANES), jnp.float32)
        v_ref[...] = jnp.zeros((SUB, LANES), jnp.float32)

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    tmin = tmin_ref[...]
    tcap = jnp.minimum(tcap_ref[...], t_ref[...])

    box_hit = _slab_test(aabb_ref, c, ox, oy, oz, dx, dy, dz, tmin, tcap)

    @pl.when(jnp.any(box_hit))
    def _cluster_body():
        ex0 = ex0_ref[...]
        ex1 = ex1_ref[...]
        tlim = tcap_ref[...]

        def body(k, carry):
            bt, bp, bu, bv = carry
            v0x = tri_ref[0, k, 0]
            v0y = tri_ref[0, k, 1]
            v0z = tri_ref[0, k, 2]
            e1x = tri_ref[0, k, 3]
            e1y = tri_ref[0, k, 4]
            e1z = tri_ref[0, k, 5]
            e2x = tri_ref[0, k, 6]
            e2y = tri_ref[0, k, 7]
            e2z = tri_ref[0, k, 8]
            tid = tri_ref[0, k, 9].astype(jnp.int32)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            det_ok = jnp.abs(det) > 1e-12
            inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                & (u + v <= 1.0) & (t > tmin) & (t < tlim) \
                & (t < bt) & (tid != ex0) & (tid != ex1) & (tid >= 0) \
                & box_hit
            bt = jnp.where(ok, t, bt)
            bp = jnp.where(ok, tid, bp)
            bu = jnp.where(ok, u, bu)
            bv = jnp.where(ok, v, bv)
            return bt, bp, bu, bv

        init = (t_ref[...], prim_ref[...], u_ref[...], v_ref[...])
        bt, bp, bu, bv = jax.lax.fori_loop(0, csize, body, init)
        t_ref[...] = bt
        prim_ref[...] = bp
        u_ref[...] = bu
        v_ref[...] = bv


def _any_kernel(csize: int,
                aabb_ref, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                dz_ref, tmin_ref, tcap_ref, ex0_ref, ex1_ref, hit_ref):
    """Shadow-ray cluster sweep: division-free sign-folded MT, a single
    occlusion carry, and already-occluded lanes drop out of the AABB gate
    so fully-occluded tiles skip all remaining clusters' triangle loops."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        hit_ref[...] = jnp.zeros((SUB, LANES), jnp.int32)

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    tmin = tmin_ref[...]
    tcap = tcap_ref[...]

    box_hit = _slab_test(aabb_ref, c, ox, oy, oz, dx, dy, dz, tmin, tcap)
    box_hit = box_hit & (hit_ref[...] == 0)

    @pl.when(jnp.any(box_hit))
    def _cluster_body():
        ex0 = ex0_ref[...]
        ex1 = ex1_ref[...]

        def body(k, hit):
            v0x = tri_ref[0, k, 0]
            v0y = tri_ref[0, k, 1]
            v0z = tri_ref[0, k, 2]
            e1x = tri_ref[0, k, 3]
            e1y = tri_ref[0, k, 4]
            e1z = tri_ref[0, k, 5]
            e2x = tri_ref[0, k, 6]
            e2y = tri_ref[0, k, 7]
            e2z = tri_ref[0, k, 8]
            tid = tri_ref[0, k, 9].astype(jnp.int32)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            s = jnp.where(det < 0.0, -1.0, 1.0)
            dd = jnp.abs(det)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            un = (tx * px + ty * py + tz * pz) * s
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vn = (dx * qx + dy * qy + dz * qz) * s
            tn = (e2x * qx + e2y * qy + e2z * qz) * s
            ok = (dd > 1e-12) & (un >= 0.0) & (vn >= 0.0) \
                & (un + vn <= dd) & (tn > tmin * dd) & (tn < tcap * dd) \
                & (tid != ex0) & (tid != ex1) & (tid >= 0) & box_hit
            return hit | ok.astype(jnp.int32)

        hit_ref[...] = jax.lax.fori_loop(0, csize, body, hit_ref[...])


def _any_nee_kernel(csize: int, K: int, aabb_ref, tri_ref, ox_ref, oy_ref,
                    oz_ref, tmin_ref, ex0_ref, ex1_ref, *rest):
    """Cluster sweep for K shadow rays per lane sharing one origin (the
    NEE bundle; see pallas_intersect._any_hit_nee_kernel for the math).
    The AABB gate ORs the per-direction slab tests and drops lanes whose
    ray k already hit, so fully-occluded tiles skip remaining clusters.

    Trade-off vs the concatenated per-direction sweep: shared-origin MT
    terms save ~35% of the per-test math, but the OR'd gate opens for the
    union of the K frusta, so incoherent bundles (BSDF-side MIS rays, IBL
    samples) cull less than per-direction tiles would.  Measured ~neutral
    on the 73.6k-tri mesh scene (5-6.5 s/chunk either way) and strictly
    fewer launches; the small-scene brute path, which has no culling to
    lose, gets the full +35% (bench 356.5 -> 482.4 Mrays/s)."""
    dxs = rest[0:K]
    dys = rest[K:2 * K]
    dzs = rest[2 * K:3 * K]
    tcaps = rest[3 * K:4 * K]
    hit_refs = rest[4 * K:5 * K]
    c = pl.program_id(1)

    for k in range(K):
        @pl.when(c == 0)
        def _init(k=k):
            hit_refs[k][...] = jnp.zeros((SUB, LANES), jnp.int32)

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    tmin = tmin_ref[...]
    d = [(dxs[k][...], dys[k][...], dzs[k][...]) for k in range(K)]
    tc = [tcaps[k][...] for k in range(K)]
    live = [hit_refs[k][...] == 0 for k in range(K)]

    box_any = None
    box_k = []
    for k in range(K):
        bh = _slab_test(aabb_ref, c, ox, oy, oz, d[k][0], d[k][1], d[k][2],
                        tmin, tc[k]) & live[k]
        box_k.append(bh)
        box_any = bh if box_any is None else (box_any | bh)

    @pl.when(jnp.any(box_any))
    def _cluster_body():
        ex0 = ex0_ref[...]
        ex1 = ex1_ref[...]

        def body(i, hits):
            v0x = tri_ref[0, i, 0]
            v0y = tri_ref[0, i, 1]
            v0z = tri_ref[0, i, 2]
            e1x = tri_ref[0, i, 3]
            e1y = tri_ref[0, i, 4]
            e1z = tri_ref[0, i, 5]
            e2x = tri_ref[0, i, 6]
            e2y = tri_ref[0, i, 7]
            e2z = tri_ref[0, i, 8]
            tid = tri_ref[0, i, 9].astype(jnp.int32)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            m1x = e2y * e1z - e2z * e1y
            m1y = e2z * e1x - e2x * e1z
            m1z = e2x * e1y - e2y * e1x
            wx = e2y * tz - e2z * ty
            wy = e2z * tx - e2x * tz
            wz = e2x * ty - e2y * tx
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            tnum = e2x * qx + e2y * qy + e2z * qz
            not_excl = (tid != ex0) & (tid != ex1) & (tid >= 0)

            out = []
            for k in range(K):
                dx, dy, dz = d[k]
                det = dx * m1x + dy * m1y + dz * m1z
                s = jnp.where(det < 0.0, -1.0, 1.0)
                dd = jnp.abs(det)
                un = (dx * wx + dy * wy + dz * wz) * s
                vn = (dx * qx + dy * qy + dz * qz) * s
                tn = tnum * s
                ok = (dd > 1e-12) & (un >= 0.0) & (vn >= 0.0) \
                    & (un + vn <= dd) & (tn > tmin * dd) \
                    & (tn < tc[k] * dd) & not_excl & box_k[k]
                out.append(hits[k] | ok.astype(jnp.int32))
            return tuple(out)

        hits = jax.lax.fori_loop(
            0, csize, body, tuple(hit_refs[k][...] for k in range(K)))
        for k in range(K):
            hit_refs[k][...] = hits[k]


@functools.partial(jax.jit,
                   static_argnames=("n_clusters", "K", "interpret"))
def _run_clusters_any_nee(aabb, tris, shared, dirs_flat, tcaps,
                          n_clusters: int, K: int, interpret: bool = False):
    csize = tris.shape[1]
    nrows = shared[0].shape[0]
    return pl.pallas_call(
        functools.partial(_any_nee_kernel, csize, K),
        grid=(nrows // SUB, n_clusters),
        in_specs=_ray_specs(6 + 4 * K, csize),
        out_specs=[_OUT_SPEC] * K,
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)] * K,
        interpret=interpret,
    )(aabb, tris, *shared, *dirs_flat, *tcaps)


def _spread3(x):
    """Spread a 5-bit int so its bits land at positions 0,3,6,9,12
    (Morton interleave helper; the standard 10-bit spread constants)."""
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _nee_bucket_key(ox, oy, oz, dx, dy, dz, tcap, tmin, g_aabb):
    """Sort key for cross-tile NEE re-bucketing: direction bin (6 bits,
    8x8 octahedral map) major, origin Morton cell (15 bits, 32^3 over
    the scene bounds) minor.  Grazing rays — the tile-union poison —
    land in the octahedral horizon bins together; within a bin Morton
    order keeps each 1024-lane tile's origins in one compact cell.
    Dead lanes (0 < tcap <= tmin, the masked-NEE convention from
    common.py:_shadow_tcap) get the max key and sink into all-dead
    trailing tiles."""
    lo0 = jnp.min(g_aabb[:, 0])
    lo1 = jnp.min(g_aabb[:, 1])
    lo2 = jnp.min(g_aabb[:, 2])
    inv0 = 32.0 / jnp.maximum(jnp.max(g_aabb[:, 3]) - lo0, 1e-6)
    inv1 = 32.0 / jnp.maximum(jnp.max(g_aabb[:, 4]) - lo1, 1e-6)
    inv2 = 32.0 / jnp.maximum(jnp.max(g_aabb[:, 5]) - lo2, 1e-6)
    # octahedral map: (dx, dz) / l1-norm, lower hemisphere folded
    s = jnp.maximum(jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz), 1e-20)
    u = dx / s
    v = dz / s
    su = jnp.where(u >= 0, 1.0, -1.0)
    sv = jnp.where(v >= 0, 1.0, -1.0)
    neg = dy < 0
    uo = jnp.where(neg, (1.0 - jnp.abs(v)) * su, u)
    vo = jnp.where(neg, (1.0 - jnp.abs(u)) * sv, v)
    bu = jnp.clip(((uo * 0.5 + 0.5) * 8.0).astype(jnp.int32), 0, 7)
    bv = jnp.clip(((vo * 0.5 + 0.5) * 8.0).astype(jnp.int32), 0, 7)
    dbin = bu * 8 + bv
    qx = jnp.clip(((ox - lo0) * inv0).astype(jnp.int32), 0, 31)
    qy = jnp.clip(((oy - lo1) * inv1).astype(jnp.int32), 0, 31)
    qz = jnp.clip(((oz - lo2) * inv2).astype(jnp.int32), 0, 31)
    morton = _spread3(qx) | (_spread3(qy) << 1) | (_spread3(qz) << 2)
    key = (dbin << 15) | morton
    dead = (tcap > 0) & (tcap <= tmin)
    return jnp.where(dead, jnp.int32(1 << 24), key)


def _rebucketed_any_nee(gd: "GroupedData", o3, tmin, dirs, tcaps,
                        ex0, ex1, interpret):
    """One occlusion sweep over all n*K NEE rays, re-bucketed across
    tiles by _nee_bucket_key via a single 12-operand lax.sort (values
    ride the sort; no lane gathers).  Output layout matches the K-sweep
    path: K-major concatenation [K*n]."""
    K = len(dirs)
    n = tmin.shape[0]
    nK = n * K
    oxf = jnp.tile(o3.x, K)
    oyf = jnp.tile(o3.y, K)
    ozf = jnp.tile(o3.z, K)
    dxf = jnp.concatenate([v.x for v in dirs])
    dyf = jnp.concatenate([v.y for v in dirs])
    dzf = jnp.concatenate([v.z for v in dirs])
    tcf = jnp.concatenate(list(tcaps))
    tmf = jnp.tile(tmin, K)
    ex0f = jnp.tile(ex0.astype(jnp.int32), K)
    ex1f = jnp.tile(ex1.astype(jnp.int32), K)
    key = _nee_bucket_key(oxf, oyf, ozf, dxf, dyf, dzf, tcf, tmf,
                          gd.g_aabb)
    idx = jnp.arange(nK, dtype=jnp.int32)
    (_, oxs, oys, ozs, dxs, dys, dzs, tcs, tms, e0s, e1s, idxs) = \
        jax.lax.sort((key, oxf, oyf, ozf, dxf, dyf, dzf, tcf, tmf,
                      ex0f, ex1f, idx), num_keys=1)
    pad = (-nK) % TILE
    npad = nK + pad

    def rows(a, fill=0.0):
        return jnp.pad(a, ((0, pad),), constant_values=fill) \
            .reshape(npad // LANES, LANES)

    def rows_edge(a):
        return jnp.pad(a, ((0, pad),), mode="edge") \
            .reshape(npad // LANES, LANES)

    comps = (rows_edge(oxs), rows_edge(oys), rows_edge(ozs),
             rows(dxs, fill=1.0), rows(dys), rows(dzs),
             rows(tms, fill=BIG),
             rows(jnp.where(tcs > 0, tcs, BIG), fill=-1.0),
             rows(e0s, fill=-2), rows(e1s, fill=-2))
    if os.environ.get("CORE_TPU_NEE_CAPTURE"):
        # diagnostics only: dump the sorted NEE ray arrays to host
        import itertools
        cap_dir = os.environ["CORE_TPU_NEE_CAPTURE"]
        cnt = getattr(_rebucketed_any_nee, "_cap_counter", None)
        if cnt is None:
            cnt = itertools.count()
            _rebucketed_any_nee._cap_counter = cnt

        def _save(*arrs):
            import numpy as _np
            i = next(cnt)
            _np.savez(f"{cap_dir}/nee_capture_{i}.npz",
                      ox=arrs[0], oy=arrs[1], oz=arrs[2], dx=arrs[3],
                      dy=arrs[4], dz=arrs[5], tc=arrs[6], tm=arrs[7])
        jax.debug.callback(_save, oxs, oys, ozs, dxs, dys, dzs, tcs, tms)
    # the scalar-prefetched per-tile group order is [tiles, G] i32 in
    # SMEM (1 MB total, 64 KB of it triangle scratch): an 8.4M-lane
    # launch at G=125 would need 4 MB — chunk the sweep into row
    # segments that keep the perm under ~384 KB (sorted order is
    # preserved; each segment is its own pallas launch)
    G = gd.g_aabb.shape[0]
    max_rows = max(SUB, ((384 * 1024 // 4) // max(G, 1)) * SUB)
    nrows = comps[0].shape[0]
    if nrows <= max_rows:
        (hit,) = _run_grouped_any(gd.g_aabb, gd.c_aabb, gd.o_aabb,
                                  gd.tris, comps, G, interpret=interpret)
    else:
        parts = []
        for r0 in range(0, nrows, max_rows):
            sub = tuple(c[r0:r0 + max_rows] for c in comps)
            (h,) = _run_grouped_any(gd.g_aabb, gd.c_aabb, gd.o_aabb,
                                    gd.tris, sub, G, interpret=interpret)
            parts.append(h)
        hit = jnp.concatenate(parts, axis=0)
    hit = hit.reshape(-1)[:nK]
    _, hit_orig = jax.lax.sort((idxs, hit), num_keys=1)
    return hit_orig > 0


def any_hit_nee_clusters_s(cl: ClusterData, o3, tmin, dirs, tcaps,
                           exclude_prim=None, exclude_prim2=None,
                           interpret=None):
    """Shared-origin NEE occlusion bundle over the cluster accel.  Same
    contract as pallas_intersect.any_hit_nee_pallas_s."""
    interpret = _resolve_interpret(interpret)
    K = len(dirs)
    n = tmin.shape[0]
    pad = (-n) % TILE
    npad = n + pad

    def rows(a, fill=0.0):
        return jnp.pad(a, ((0, pad),), constant_values=fill) \
            .reshape(npad // LANES, LANES)

    def rows_edge(a):
        # origins pad with the last real value (not 0) so the pad lanes
        # don't skew the final partial tile's centroid in _tile_group_perm
        return jnp.pad(a, ((0, pad),), mode="edge") \
            .reshape(npad // LANES, LANES)

    ex0 = exclude_prim if exclude_prim is not None \
        else jnp.full(n, -2, jnp.int32)
    ex1 = exclude_prim2 if exclude_prim2 is not None \
        else jnp.full(n, -2, jnp.int32)
    if cl.grouped is not None and NEE_REBUCKET:
        # v5: GLOBAL RE-BUCKETING.  The per-sweep tile union is set
        # by each tile's most grazing rays — rank packing (v4, git
        # history) only concentrated them within a lane's K slots;
        # one grazing lane still dragged its 1023 tile neighbors
        # through every box its slab touches.  Here ALL n*K shadow
        # rays are physically re-bucketed across tiles by
        # (octahedral direction bin, origin morton cell) with a
        # single multi-operand lax.sort (measured 80 ms at 8.4M
        # lanes on v5e — TPU sorts carry values along, lane gathers
        # would cost 1.1 s), so every 1024-lane tile holds rays of
        # one direction bin from one compact origin region: the
        # union collapses to a single ray's footprint, the per-ray
        # analog of kd-tree traversal the round-4 verdict asked for.
        # Dead lanes (tcap <= tmin) sort last into all-dead tiles
        # that fail every gate.  Hit bits are un-permuted with a
        # second (index, hit) sort; results are bit-identical to
        # the unsorted sweeps (occlusion is order-independent).
        return _rebucketed_any_nee(cl.grouped, o3, tmin, dirs, tcaps,
                                   ex0, ex1, interpret)
    shared = (rows_edge(o3.x), rows_edge(o3.y), rows_edge(o3.z),
              rows(tmin, fill=BIG),
              rows(ex0.astype(jnp.int32), fill=-2),
              rows(ex1.astype(jnp.int32), fill=-2))
    if cl.grouped is not None:
        # K independent single-direction sweeps (exact slabs) instead of
        # the union-direction bundle: at grouped scale the union of K
        # spread NEE directions opens every gate (see _grouped_any_kernel
        # docstring), so per-direction exact culling wins by orders of
        # magnitude even though the shared-origin MT terms are recomputed.
        gd = cl.grouped
        if K > 1:
            key = jnp.stack([-jnp.abs(v.y) for v in dirs])     # [K, n]
            order = jnp.argsort(key, axis=0)                   # [K, n] i32

            def pick(arrs, r):
                acc = arrs[0]
                for k in range(1, K):
                    acc = jnp.where(order[r] == k, arrs[k], acc)
                return acc

            dxs = [v.x for v in dirs]
            dys = [v.y for v in dirs]
            dzs = [v.z for v in dirs]
            tcs = [t for t in tcaps]
            sdirs = [(pick(dxs, r), pick(dys, r), pick(dzs, r))
                     for r in range(K)]
            stcaps = [pick(tcs, r) for r in range(K)]
        else:
            order = None
            sdirs = [(dirs[0].x, dirs[0].y, dirs[0].z)]
            stcaps = [tcaps[0]]
        slot_hits = []
        for r in range(K):
            comps = shared[:3] + (rows(sdirs[r][0], fill=1.0),
                                  rows(sdirs[r][1]), rows(sdirs[r][2]),
                                  shared[3],
                                  rows(jnp.where(stcaps[r] > 0, stcaps[r],
                                                 BIG), fill=-1.0),
                                  shared[4], shared[5])
            (h,) = _run_grouped_any(gd.g_aabb, gd.c_aabb, gd.o_aabb,
                                    gd.tris, comps, gd.g_aabb.shape[0],
                                    interpret=interpret)
            slot_hits.append(h.reshape(-1)[:n])
        if order is None:
            hits_n = slot_hits
        else:
            hits_n = []
            for k in range(K):
                acc = jnp.zeros_like(slot_hits[0])
                for r in range(K):
                    acc = acc | jnp.where(order[r] == k, slot_hits[r], 0)
                hits_n.append(acc)
        return jnp.concatenate(hits_n) > 0
    else:
        dirs_flat = ([rows(v.x, fill=1.0) for v in dirs]
                     + [rows(v.y) for v in dirs]
                     + [rows(v.z) for v in dirs])
        tcap_rows = [rows(jnp.where(t > 0, t, BIG), fill=-1.0)
                     for t in tcaps]
        hits = _run_clusters_any_nee(cl.aabb, cl.tris, shared, dirs_flat,
                                     tcap_rows, cl.n_clusters, K,
                                     interpret=interpret)
    return jnp.concatenate([h.reshape(-1)[:n] for h in hits]) > 0


def _ray_specs(n: int, csize: int):
    spec = pl.BlockSpec((SUB, LANES), lambda i, c: (i, 0),
                        memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # aabb
        pl.BlockSpec((1, csize, 10), lambda i, c: (c, 0, 0),
                     memory_space=pltpu.SMEM),                 # tris+id
    ] + [spec] * n


_OUT_SPEC = pl.BlockSpec((SUB, LANES), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def _run_clusters(aabb, tris, comps, n_clusters: int,
                  interpret: bool = False):
    csize = tris.shape[1]
    nrows = comps[0].shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, csize),
        grid=(nrows // SUB, n_clusters),
        in_specs=_ray_specs(10, csize),
        out_specs=[_OUT_SPEC] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(aabb, tris, *comps)


@functools.partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def _run_clusters_any(aabb, tris, comps, n_clusters: int,
                      interpret: bool = False):
    csize = tris.shape[1]
    nrows = comps[0].shape[0]
    return pl.pallas_call(
        functools.partial(_any_kernel, csize),
        grid=(nrows // SUB, n_clusters),
        in_specs=_ray_specs(10, csize),
        out_specs=[_OUT_SPEC],
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)],
        interpret=interpret,
    )(aabb, tris, *comps)


def _prep_soa(rays_s, exclude_prim, exclude_prim2):
    n = rays_s.tmin.shape[0]
    pad = (-n) % TILE
    npad = n + pad

    def rows(a, fill=0.0):
        return jnp.pad(a, ((0, pad),),
                       constant_values=fill).reshape(npad // LANES, LANES)

    def rows_edge(a):
        # edge-pad origins: keeps _tile_group_perm's last-tile centroid
        # on the real rays instead of averaging in zeros
        return jnp.pad(a, ((0, pad),), mode="edge") \
            .reshape(npad // LANES, LANES)

    tcap = jnp.where(rays_s.tmax > 0, rays_s.tmax, BIG)
    ex0 = exclude_prim if exclude_prim is not None \
        else jnp.full(n, -2, jnp.int32)
    ex1 = exclude_prim2 if exclude_prim2 is not None \
        else jnp.full(n, -2, jnp.int32)
    comps = (rows_edge(rays_s.o.x), rows_edge(rays_s.o.y),
             rows_edge(rays_s.o.z),
             rows(rays_s.d.x, fill=1.0), rows(rays_s.d.y),
             rows(rays_s.d.z),
             rows(rays_s.tmin, fill=BIG), rows(tcap, fill=-1.0),
             rows(ex0.astype(jnp.int32), fill=-2),
             rows(ex1.astype(jnp.int32), fill=-2))
    return comps, n


def closest_hit_clusters_s(cl: ClusterData, rays_s, exclude_prim=None,
                           exclude_prim2=None, interpret=None) -> Hits:
    interpret = _resolve_interpret(interpret)
    if cl.grouped is not None:
        return closest_hit_grouped_s(cl, rays_s, exclude_prim=exclude_prim,
                                     exclude_prim2=exclude_prim2,
                                     interpret=interpret)
    comps, n = _prep_soa(rays_s, exclude_prim, exclude_prim2)
    t, prim, u, v = _run_clusters(cl.aabb, cl.tris, comps, cl.n_clusters,
                                  interpret=interpret)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    miss = prim < 0
    return Hits(t=jnp.where(miss, -1.0, t), prim=prim,
                u=u.reshape(-1)[:n], v=v.reshape(-1)[:n])


def any_hit_clusters_s(cl: ClusterData, rays_s, exclude_prim=None,
                       exclude_prim2=None, interpret=None):
    interpret = _resolve_interpret(interpret)
    if cl.grouped is not None:
        gd = cl.grouped
        comps, n = _prep_soa(rays_s, exclude_prim, exclude_prim2)
        (hit,) = _run_grouped_any(gd.g_aabb, gd.c_aabb, gd.o_aabb, gd.tris, comps,
                                  gd.g_aabb.shape[0], interpret=interpret)
        return hit.reshape(-1)[:n] > 0
    comps, n = _prep_soa(rays_s, exclude_prim, exclude_prim2)
    (hit,) = _run_clusters_any(cl.aabb, cl.tris, comps, cl.n_clusters,
                               interpret=interpret)
    return hit.reshape(-1)[:n] > 0


# ---------------------------------------------------------------------------
# v2: grouped cluster sweep with conditional DMA (multi-million-tri scenes)
# ---------------------------------------------------------------------------
#
# The flat sweep pays (DMA + AABB slab) for EVERY cluster per ray tile:
# at 1M tris (3,907 clusters) that is ~40 MB of streamed triangle blocks
# and ~3,907 slab tests per tile regardless of hits — the "grid collapse"
# the v1 header predicted.  v2 adds a second level: clusters are grouped
# into GROUP consecutive siblings of the recursive-median build (spatially
# coherent by construction), the kernel grid becomes (tile, group), and
#   - the group AABB is slab-tested first; a miss skips all GROUP
#     clusters (no DMA, no per-cluster slabs);
#   - each surviving cluster is slab-tested, and only on a pass is its
#     10 KB triangle block DMA'd HBM -> SMEM scratch
#     (pltpu.make_async_copy) and intersected.
# Triangle data lives in HBM (memory_space ANY) — nothing streams
# unconditionally.

GROUP = 64              # clusters per group
OCTET = 8               # clusters gated per scalar reduce (DMA slots)


class GroupedData(NamedTuple):
    g_aabb: jnp.ndarray     # [G, 8] group AABBs
    c_aabb: jnp.ndarray     # [G, GROUP, 8] cluster AABBs (pads inverted)
    o_aabb: jnp.ndarray     # [G, GROUP//OCTET, 8] octet-union AABBs:
                            # ONE slab + ONE scalar any-reduce gates 8
                            # clusters (the scalar reduces, ~300 cycles
                            # each, dominate gating cost otherwise)
    tris: jnp.ndarray       # [G * GROUP, 16, CLUSTER] HBM-resident,
                            # field-major (v0 xyz, e1 xyz, e2 xyz, id,
                            # 6 pad rows): the manual-DMA slice must be
                            # (8,128)-tile aligned in its last two dims


def group_clusters(cl: ClusterData, group: int = GROUP,
                   sort_origin=None) -> GroupedData:
    """Host-side: pad clusters to a multiple of `group` and take group
    AABBs over consecutive build-order runs (recursive-median order keeps
    siblings adjacent, so consecutive runs are spatially tight).

    sort_origin: optional [3] point (typically the camera position).
    Clusters are ordered front-to-back WITHIN their group and groups are
    ordered front-to-back overall — the kernels' tcap=min(tcap, best_t)
    slab gating then culls everything behind the first hit without any
    per-tile ordering machinery (a lockstep grid cannot reorder per
    tile; a static near-to-far order is the TPU stand-in for the
    kd-tree's per-ray front-to-back traversal)."""
    aabb = np.asarray(cl.aabb)
    tris = np.asarray(cl.tris)
    C = aabb.shape[0]
    if sort_origin is not None and C > group:
        so = np.asarray(sort_origin, np.float32)
        cent = 0.5 * (aabb[:, 0:3] + aabb[:, 3:6])
        d = np.linalg.norm(cent - so[None], axis=1)
        n_full = (C // group) * group
        order = np.arange(C)
        for g0 in range(0, n_full, group):
            seg = order[g0:g0 + group]
            order[g0:g0 + group] = seg[np.argsort(d[seg], kind="stable")]
        runs = [order[g0:g0 + group] for g0 in range(0, C, group)]
        runs.sort(key=lambda seg: float(d[seg].min()))
        order = np.concatenate(runs)
        aabb = aabb[order]
        tris = tris[order]
    pad = (-C) % group
    if pad:
        inv = np.zeros((pad, 8), np.float32)
        inv[:, 0:3] = BIG
        inv[:, 3:6] = -BIG           # inverted box: slab test never passes
        aabb = np.concatenate([aabb, inv], axis=0)
        tpad = np.zeros((pad, tris.shape[1], 10), np.float32)
        tpad[:, :, 9] = -1.0
        tris = np.concatenate([tris, tpad], axis=0)
    # [Cpad, CLUSTER, 10] -> field-major [Cpad, 16, CLUSTER]
    tris_fm = np.zeros((tris.shape[0], 16, tris.shape[1]), np.float32)
    tris_fm[:, :10, :] = np.swapaxes(tris, 1, 2)
    tris = tris_fm
    G = aabb.shape[0] // group
    c_aabb = aabb.reshape(G, group, 8)
    g_aabb = np.zeros((G, 8), np.float32)
    g_aabb[:, 0:3] = c_aabb[:, :, 0:3].min(axis=1)
    g_aabb[:, 3:6] = c_aabb[:, :, 3:6].max(axis=1)
    oc = c_aabb.reshape(G, group // OCTET, OCTET, 8)
    o_aabb = np.zeros((G, group // OCTET, 8), np.float32)
    o_aabb[:, :, 0:3] = oc[:, :, :, 0:3].min(axis=2)
    o_aabb[:, :, 3:6] = oc[:, :, :, 3:6].max(axis=2)
    return GroupedData(g_aabb=jnp.asarray(g_aabb),
                       c_aabb=jnp.asarray(c_aabb),
                       o_aabb=jnp.asarray(o_aabb),
                       tris=jnp.asarray(tris))


def _slab_test_dyn(aabb_ref, g, c, ox, oy, oz, dx, dy, dz, tmin, tcap):
    """Slab test against aabb_ref[g, c, :] (SMEM, dynamic indices)."""
    eps = 1e-20

    def axis_int(o, d, b0, b1):
        inv = 1.0 / jnp.where(jnp.abs(d) < eps,
                              jnp.where(d < 0, -eps, eps), d)
        q0 = (b0 - o) * inv
        q1 = (b1 - o) * inv
        return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

    nx, fx = axis_int(ox, dx, aabb_ref[g, c, 0], aabb_ref[g, c, 3])
    ny, fy = axis_int(oy, dy, aabb_ref[g, c, 1], aabb_ref[g, c, 4])
    nz, fz = axis_int(oz, dz, aabb_ref[g, c, 2], aabb_ref[g, c, 5])
    tn = jnp.maximum(jnp.maximum(nx, ny), jnp.maximum(nz, tmin))
    tf = jnp.minimum(jnp.minimum(fx, fy), jnp.minimum(fz, tcap))
    return tn <= tf


def _grouped_kernel(csize: int, group: int, perm_ref,
                    g_aabb_ref, c_aabb_ref, o_aabb_ref, tri_hbm,
                    ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, tmin_ref, tcap_ref, ex0_ref,
                    ex1_ref, t_ref, prim_ref, u_ref, v_ref,
                    scratch, sem):
    # per-TILE group visit order (scalar-prefetched [tiles, G] i32, see
    # _tile_group_perm): near-origin groups first, so the tcap=min(best_t)
    # gate closes for every tile's own wavefront — true per-tile
    # front-to-back, which a static global order cannot give bounce rays
    g = pl.program_id(1)
    gi = perm_ref[pl.program_id(0), g]

    @pl.when(g == 0)
    def _init():
        t_ref[...] = jnp.full((SUB, LANES), BIG, jnp.float32)
        prim_ref[...] = jnp.full((SUB, LANES), -1, jnp.int32)
        u_ref[...] = jnp.zeros((SUB, LANES), jnp.float32)
        v_ref[...] = jnp.zeros((SUB, LANES), jnp.float32)

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    tmin = tmin_ref[...]
    tlim = tcap_ref[...]

    gbox = _slab_test(g_aabb_ref, gi, ox, oy, oz, dx, dy, dz, tmin,
                      jnp.minimum(tlim, t_ref[...]))

    @pl.when(jnp.any(gbox))
    def _group_body():
        ex0 = ex0_ref[...]
        ex1 = ex1_ref[...]
        n_oct = group // OCTET

        def octet_step(oc, carry):
            bt0 = carry[0]
            tc = jnp.minimum(tlim, bt0)
            # octet-union AABB gate: ONE slab + ONE scalar any-reduce for
            # 8 clusters; the per-cluster slabs/gates (8 more reduces)
            # run only inside a passing octet — scalar reduces (~300
            # cycles each) dominate gating cost otherwise
            obox = _slab_test_dyn(o_aabb_ref, 0, oc,
                                  ox, oy, oz, dx, dy, dz, tmin, tc)
            any8 = jnp.any(obox)

            def octet_body(carry):
                cboxes = [_slab_test_dyn(c_aabb_ref, 0, oc * OCTET + j,
                                         ox, oy, oz, dx, dy, dz, tmin, tc)
                          for j in range(OCTET)]
                gates = [jnp.any(cb) for cb in cboxes]
                # start every gated cluster's DMA up front (one slot per
                # cluster) so the copies overlap the MT loops below
                for j in range(OCTET):
                    @pl.when(gates[j])
                    def _start(j=j):
                        pltpu.make_async_copy(
                            tri_hbm.at[gi * group + oc * OCTET + j],
                            scratch.at[j], sem.at[j]).start()

                for j in range(OCTET):
                    def hit_cluster(c2, j=j):
                        bt, bp, bu, bv = c2
                        pltpu.make_async_copy(
                            tri_hbm.at[gi * group + oc * OCTET + j],
                            scratch.at[j], sem.at[j]).wait()
                        cbox = cboxes[j]

                        def body(k, c3):
                            bt, bp, bu, bv = c3
                            v0x = scratch[j, 0, k]
                            v0y = scratch[j, 1, k]
                            v0z = scratch[j, 2, k]
                            e1x = scratch[j, 3, k]
                            e1y = scratch[j, 4, k]
                            e1z = scratch[j, 5, k]
                            e2x = scratch[j, 6, k]
                            e2y = scratch[j, 7, k]
                            e2z = scratch[j, 8, k]
                            tid = scratch[j, 9, k].astype(jnp.int32)
                            px = dy * e2z - dz * e2y
                            py = dz * e2x - dx * e2z
                            pz = dx * e2y - dy * e2x
                            det = e1x * px + e1y * py + e1z * pz
                            det_ok = jnp.abs(det) > 1e-12
                            inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                            tx = ox - v0x
                            ty = oy - v0y
                            tz = oz - v0z
                            u = (tx * px + ty * py + tz * pz) * inv_det
                            qx = ty * e1z - tz * e1y
                            qy = tz * e1x - tx * e1z
                            qz = tx * e1y - ty * e1x
                            v = (dx * qx + dy * qy + dz * qz) * inv_det
                            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                            ok = det_ok & (u >= 0.0) & (u <= 1.0) \
                                & (v >= 0.0) & (u + v <= 1.0) \
                                & (t > tmin) & (t < tlim) & (t < bt) \
                                & (tid != ex0) & (tid != ex1) \
                                & (tid >= 0) & cbox
                            bt = jnp.where(ok, t, bt)
                            bp = jnp.where(ok, tid, bp)
                            bu = jnp.where(ok, u, bu)
                            bv = jnp.where(ok, v, bv)
                            return bt, bp, bu, bv

                        return jax.lax.fori_loop(0, csize, body,
                                                 (bt, bp, bu, bv))

                    carry = jax.lax.cond(gates[j], hit_cluster,
                                         lambda c: c, carry)
                return carry

            return jax.lax.cond(any8, octet_body, lambda c: c, carry)

        init = (t_ref[...], prim_ref[...], u_ref[...], v_ref[...])
        bt, bp, bu, bv = jax.lax.fori_loop(0, n_oct, octet_step, init)
        t_ref[...] = bt
        prim_ref[...] = bp
        u_ref[...] = bu
        v_ref[...] = bv


def _grouped_specs(n_rays: int, group: int):
    # index_maps receive the scalar-prefetch perm ref as the trailing arg;
    # the c_aabb block follows the PER-TILE group order so the kernel's
    # local cluster indices stay 0..group-1
    spec = pl.BlockSpec((SUB, LANES), lambda i, g, perm: (i, 0),
                        memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                  # g_aabb
        pl.BlockSpec((1, group, 8), lambda i, g, perm: (perm[i, g], 0, 0),
                     memory_space=pltpu.SMEM),                  # c_aabb
        pl.BlockSpec((1, group // OCTET, 8),
                     lambda i, g, perm: (perm[i, g], 0, 0),
                     memory_space=pltpu.SMEM),                  # o_aabb
        pl.BlockSpec(memory_space=pltpu.HBM),                   # tris
    ] + [spec] * n_rays


_OUT_SPEC_G = pl.BlockSpec((SUB, LANES), lambda i, g, perm: (i, 0),
                           memory_space=pltpu.VMEM)


def _tile_group_perm(comps, g_aabb):
    """[tiles, G] per-tile group visit order: ascending distance from the
    tile's ray-origin centroid to each group AABB.  Under pixel-block ray
    ordering a tile's origins are spatially tight, so this is the per-tile
    analog of kd-tree front-to-back traversal: closest-hit tiles shrink
    tcap fastest, shadow tiles occlude (and drop out of the gates) on the
    near geometry first.  Pure jnp (runs inside jit); inverted pad boxes
    sort last (infinite distance)."""
    ox, oy, oz = comps[0], comps[1], comps[2]
    tiles = ox.shape[0] // SUB

    def cent(a):
        return a.reshape(tiles, -1).mean(axis=1)

    cx, cy, cz = cent(ox), cent(oy), cent(oz)

    def axis_d(c, b0, b1):
        return jnp.maximum(jnp.maximum(b0[None, :] - c[:, None],
                                       c[:, None] - b1[None, :]), 0.0)

    dx = axis_d(cx, g_aabb[:, 0], g_aabb[:, 3])
    dy = axis_d(cy, g_aabb[:, 1], g_aabb[:, 4])
    dz = axis_d(cz, g_aabb[:, 2], g_aabb[:, 5])
    dist = dx * dx + dy * dy + dz * dz
    return jnp.argsort(dist, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_groups", "interpret"))
def _run_grouped(g_aabb, c_aabb, o_aabb, tris, comps, n_groups: int,
                 interpret: bool = False):
    csize = tris.shape[2]
    group = c_aabb.shape[1]
    nrows = comps[0].shape[0]
    perm = _tile_group_perm(comps, g_aabb)
    return pl.pallas_call(
        functools.partial(_grouped_kernel, csize, group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrows // SUB, n_groups),
            in_specs=_grouped_specs(10, group),
            out_specs=[_OUT_SPEC_G] * 4,
            scratch_shapes=[
                pltpu.SMEM((OCTET, 16, csize), jnp.float32),
                pltpu.SemaphoreType.DMA((OCTET,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(perm, g_aabb, c_aabb, o_aabb, tris, *comps)


def closest_hit_grouped_s(cl: ClusterData, rays_s, exclude_prim=None,
                          exclude_prim2=None, interpret=None) -> Hits:
    interpret = _resolve_interpret(interpret)
    gd = cl.grouped
    comps, n = _prep_soa(rays_s, exclude_prim, exclude_prim2)
    t, prim, u, v = _run_grouped(gd.g_aabb, gd.c_aabb, gd.o_aabb, gd.tris, comps,
                                 gd.g_aabb.shape[0], interpret=interpret)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    miss = prim < 0
    return Hits(t=jnp.where(miss, -1.0, t), prim=prim,
                u=u.reshape(-1)[:n], v=v.reshape(-1)[:n])


def _grouped_any_kernel(csize: int, group: int, perm_ref,
                        g_aabb_ref, c_aabb_ref, o_aabb_ref, tri_hbm,
                        ox_ref, oy_ref,
                        oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tcap_ref,
                        ex0_ref, ex1_ref, hit_ref, scratch, sem, done_ref):
    """Single-direction occlusion sweep with conditional DMA.

    The union-direction NEE slab (the v3 bundle kernel) collapses at
    multi-million-triangle scale: K spread directions (IBL samples,
    BSDF-MIS rays) union to the whole sphere, every gate opens, and the
    sweep degenerates to (all clusters) x 256 x K MT tests per tile —
    measured SECONDS per launch at 1M tris.  Exact per-direction slabs
    restore the culling; the NEE bundle becomes K of these sweeps (one
    direction per tile, so each tile keeps a narrow frustum when the ray
    origins are pixel-block coherent — render.py blocked ordering).

    Groups are visited in the scalar-prefetched per-tile near-to-far
    order (_tile_group_perm): shadow lanes occlude on the geometry
    nearest their own origins first, then drop out of every later
    gate.

    A per-tile scalar `done` flag (SMEM scratch) short-circuits the
    remaining group sweep once every lane is closed (occluded, dead cap,
    or pad): done tiles pay one scalar read per group instead of the
    1024-lane slab + vector any-reduce.  The flag is refreshed only
    inside passing groups (where new hits can occur) and at init (the
    all-dead trailing tiles the re-bucketing sort produces)."""
    g = pl.program_id(1)
    gi = perm_ref[pl.program_id(0), g]

    tmin = tmin_ref[...]
    tcap0 = tcap_ref[...]

    @pl.when(g == 0)
    def _init():
        hit_ref[...] = jnp.zeros((SUB, LANES), jnp.int32)
        done_ref[0] = jnp.all(tcap0 <= tmin).astype(jnp.int32)

    @pl.when(done_ref[0] == 0)
    def _tile_live():
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        # lanes already occluded get an empty [tmin, tmin] interval
        tc0 = jnp.where(hit_ref[...] == 0, tcap0, tmin)

        gbox = _slab_test(g_aabb_ref, gi, ox, oy, oz, dx, dy, dz, tmin,
                          tc0)

        @pl.when(jnp.any(gbox))
        def _group_body():
            ex0 = ex0_ref[...]
            ex1 = ex1_ref[...]
            n_oct = group // OCTET

            def octet_step(oc, hit):
                # lanes occluded earlier in this sweep drop out of the gates
                tc = jnp.where(hit == 0, tcap0, tmin)
                # octet-union AABB gate (one slab + one scalar reduce for 8
                # clusters; see _grouped_kernel)
                obox = _slab_test_dyn(o_aabb_ref, 0, oc,
                                      ox, oy, oz, dx, dy, dz, tmin, tc)
                any8 = jnp.any(obox)

                def octet_body(hit):
                    cboxes = [_slab_test_dyn(c_aabb_ref, 0, oc * OCTET + j,
                                             ox, oy, oz, dx, dy, dz, tmin, tc)
                              for j in range(OCTET)]
                    gates = [jnp.any(cb) for cb in cboxes]
                    for j in range(OCTET):
                        @pl.when(gates[j])
                        def _start(j=j):
                            pltpu.make_async_copy(
                                tri_hbm.at[gi * group + oc * OCTET + j],
                                scratch.at[j], sem.at[j]).start()

                    for j in range(OCTET):
                        def hit_cluster(hit, j=j):
                            pltpu.make_async_copy(
                                tri_hbm.at[gi * group + oc * OCTET + j],
                                scratch.at[j], sem.at[j]).wait()
                            cbox = cboxes[j]

                            def body(i, hit):
                                v0x = scratch[j, 0, i]
                                v0y = scratch[j, 1, i]
                                v0z = scratch[j, 2, i]
                                e1x = scratch[j, 3, i]
                                e1y = scratch[j, 4, i]
                                e1z = scratch[j, 5, i]
                                e2x = scratch[j, 6, i]
                                e2y = scratch[j, 7, i]
                                e2z = scratch[j, 8, i]
                                tid = scratch[j, 9, i].astype(jnp.int32)
                                px = dy * e2z - dz * e2y
                                py = dz * e2x - dx * e2z
                                pz = dx * e2y - dy * e2x
                                det = e1x * px + e1y * py + e1z * pz
                                s = jnp.where(det < 0.0, -1.0, 1.0)
                                dd = jnp.abs(det)
                                tx = ox - v0x
                                ty = oy - v0y
                                tz = oz - v0z
                                un = (tx * px + ty * py + tz * pz) * s
                                qx = ty * e1z - tz * e1y
                                qy = tz * e1x - tx * e1z
                                qz = tx * e1y - ty * e1x
                                vn = (dx * qx + dy * qy + dz * qz) * s
                                tn = (e2x * qx + e2y * qy + e2z * qz) * s
                                ok = (dd > 1e-12) & (un >= 0.0) & (vn >= 0.0) \
                                    & (un + vn <= dd) & (tn > tmin * dd) \
                                    & (tn < tcap0 * dd) & (tid != ex0) \
                                    & (tid != ex1) & (tid >= 0) & cbox
                                return hit | ok.astype(jnp.int32)

                            return jax.lax.fori_loop(0, csize, body, hit)

                        hit = jax.lax.cond(gates[j], hit_cluster,
                                           lambda h: h, hit)
                    return hit

                return jax.lax.cond(any8, octet_body, lambda h: h, hit)

            hit = jax.lax.fori_loop(0, n_oct, octet_step,
                                    hit_ref[...])
            hit_ref[...] = hit
            # refresh the early-break flag: every lane closed?
            done_ref[0] = jnp.all((hit != 0)
                                  | (tcap0 <= tmin)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_groups", "interpret"))
def _run_grouped_any(g_aabb, c_aabb, o_aabb, tris, comps, n_groups: int,
                     interpret: bool = False):
    csize = tris.shape[2]
    group = c_aabb.shape[1]
    nrows = comps[0].shape[0]
    perm = _tile_group_perm(comps, g_aabb)
    return pl.pallas_call(
        functools.partial(_grouped_any_kernel, csize, group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrows // SUB, n_groups),
            in_specs=_grouped_specs(10, group),
            out_specs=[_OUT_SPEC_G],
            scratch_shapes=[
                pltpu.SMEM((OCTET, 16, csize), jnp.float32),
                pltpu.SemaphoreType.DMA((OCTET,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)],
        interpret=interpret,
    )(perm, g_aabb, c_aabb, o_aabb, tris, *comps)
