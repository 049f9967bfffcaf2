"""SAH BVH: host-side binned builder + lockstep wavefront traversal.

The reference accelerates ray queries with a SAH kd-tree built per scene
update (triKdTree_t, src/yafraycore/kdtree.cc; SAH constants costRatio 0.8,
emptyBonus 0.33, 1024 bins — scene.cc:782, ray_kdtree.cc:24) and traverses it
per-ray with a small stack.  TPU-native replacement: a flattened binary BVH
(SoA arrays in HBM) built with a binned-SAH sweep in vectorized numpy at
scene compile time, traversed by the whole ray wavefront in lockstep — a
single `lax.while_loop` whose body pops one node per ray (masked), tests
child AABBs, and intersects padded leaf triangles.  Rays in flight each own
a short traversal stack kept as a [N, DEPTH] register array.

Node encoding (flat arrays, index = node id):
  node_min/node_max [M,3]  child AABBs' parent box
  left  [M] i32   inner: left child id (right child = left+1)
                  leaf:  ~first_tri  (negative)
  count [M] i32   inner: split axis   leaf: triangle count
Leaf triangles are contiguous in `tri_order` (a permutation of 0..T-1).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.types import Rays, Hits
from core_tpu.mathutils import cross

BIG = 3.0e38
MAX_LEAF = 4
STACK_DEPTH = 48


class BVHData(NamedTuple):
    node_min: jnp.ndarray   # [M,3]
    node_max: jnp.ndarray   # [M,3]
    left: jnp.ndarray       # [M] i32
    count: jnp.ndarray      # [M] i32
    tri_order: jnp.ndarray  # [T] i32


NATIVE_THRESHOLD = 20000   # use the C++ builder above this many triangles


def build_bvh(verts: np.ndarray, tri_vidx: np.ndarray,
              max_leaf: int = MAX_LEAF, n_bins: int = 16,
              force_native: bool = False) -> BVHData:
    """Binned-SAH top-down build, iterative with an explicit stack.

    Small scenes build in vectorized numpy; large scenes route to the
    native C++ builder (native/bvh_builder.cpp, same flat layout).
    """
    if force_native or np.asarray(tri_vidx).shape[0] >= NATIVE_THRESHOLD:
        from core_tpu import native
        if native.available():
            nmin, nmax, left_a, count_a, order_a = native.build_bvh_native(
                np.asarray(verts), np.asarray(tri_vidx),
                max_leaf=max_leaf, n_bins=n_bins)
            return BVHData(node_min=jnp.asarray(nmin),
                           node_max=jnp.asarray(nmax),
                           left=jnp.asarray(left_a),
                           count=jnp.asarray(count_a),
                           tri_order=jnp.asarray(order_a))
    verts = np.asarray(verts, np.float64)
    tris = np.asarray(tri_vidx, np.int64)
    T = tris.shape[0]
    p0 = verts[tris[:, 0]]
    p1 = verts[tris[:, 1]]
    p2 = verts[tris[:, 2]]
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    centroid = (tmin + tmax) * 0.5

    order = np.arange(T)
    node_min, node_max, left, count = [], [], [], []

    def alloc():
        node_min.append(np.zeros(3))
        node_max.append(np.zeros(3))
        left.append(0)
        count.append(0)
        return len(left) - 1

    root = alloc()
    stack = [(root, 0, T)]
    while stack:
        node, lo, hi = stack.pop()
        ids = order[lo:hi]
        bmin = tmin[ids].min(axis=0)
        bmax = tmax[ids].max(axis=0)
        node_min[node] = bmin
        node_max[node] = bmax
        n = hi - lo
        if n <= max_leaf:
            left[node] = ~lo
            count[node] = n
            continue
        # binned SAH over centroid extent
        cmin = centroid[ids].min(axis=0)
        cmax = centroid[ids].max(axis=0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] < 1e-12:
            # degenerate: split in half by order
            mid = lo + n // 2
        else:
            scale = n_bins * (1.0 - 1e-6) / ext[axis]
            bins = ((centroid[ids, axis] - cmin[axis]) * scale).astype(np.int64)
            # per-bin bounds + counts
            cnt = np.bincount(bins, minlength=n_bins)
            bb_min = np.full((n_bins, 3), np.inf)
            bb_max = np.full((n_bins, 3), -np.inf)
            for a in range(3):
                np.minimum.at(bb_min[:, a], bins, tmin[ids, a])
                np.maximum.at(bb_max[:, a], bins, tmax[ids, a])
            # prefix/suffix areas
            def grow(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
            lmin = np.minimum.accumulate(bb_min, axis=0)
            lmax = np.maximum.accumulate(bb_max, axis=0)
            rmin = np.minimum.accumulate(bb_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bb_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(cnt)
            rcnt = np.cumsum(cnt[::-1])[::-1]
            cost = np.full(n_bins - 1, np.inf)
            for b in range(n_bins - 1):
                if lcnt[b] == 0 or rcnt[b + 1] == 0:
                    continue
                cost[b] = grow(lmin[b:b + 1], lmax[b:b + 1])[0] * lcnt[b] \
                    + grow(rmin[b + 1:b + 2], rmax[b + 1:b + 2])[0] * rcnt[b + 1]
            best = int(np.argmin(cost))
            if not np.isfinite(cost[best]):
                mid = lo + n // 2
            else:
                go_left = bins <= best
                li = ids[go_left]
                ri = ids[~go_left]
                order[lo:lo + len(li)] = li
                order[lo + len(li):hi] = ri
                mid = lo + len(li)
                if mid == lo or mid == hi:
                    mid = lo + n // 2
        lchild = alloc()
        rchild = alloc()
        assert rchild == lchild + 1
        left[node] = lchild
        count[node] = axis if ext[axis] >= 1e-12 else 0
        # push right first so left pops first (locality)
        stack.append((rchild, mid, hi))
        stack.append((lchild, lo, mid))

    return BVHData(
        node_min=jnp.asarray(np.asarray(node_min, np.float32)),
        node_max=jnp.asarray(np.asarray(node_max, np.float32)),
        left=jnp.asarray(np.asarray(left, np.int32)),
        count=jnp.asarray(np.asarray(count, np.int32)),
        tri_order=jnp.asarray(order.astype(np.int32)),
    )


def _slab_test(bmin, bmax, o, inv_d, tmin, tmax):
    """Ray-AABB: returns (hit, t_near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), tmin)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), tmax)
    return t_near <= t_far, t_near


def _mt_single(o, d, v0, e1, e2):
    """Möller-Trumbore for one gathered triangle per ray ([N,3] each)."""
    pvec = cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
        & (u + v <= 1.0)
    return t, u, v, ok


def _traverse(geom, bvh: BVHData, rays: Rays, any_hit: bool,
              exclude_prim=None, exclude_prim2=None):
    N = rays.o.shape[0]
    tmax0 = jnp.where(rays.tmax > 0, rays.tmax, BIG)
    inv_d = 1.0 / jnp.where(jnp.abs(rays.d) < 1e-20,
                            jnp.where(rays.d < 0, -1e-20, 1e-20), rays.d)
    verts = geom.verts
    tri_vidx = geom.tri_vidx

    stack = jnp.zeros((N, STACK_DEPTH), jnp.int32)
    sp = jnp.zeros(N, jnp.int32)           # stack pointer
    node = jnp.zeros(N, jnp.int32)         # current node (root=0)
    alive = jnp.ones(N, bool)
    # root box test
    root_hit, _ = _slab_test(bvh.node_min[0], bvh.node_max[0], rays.o, inv_d,
                             rays.tmin, tmax0)
    alive = alive & root_hit

    state = dict(
        stack=stack, sp=sp, node=node, alive=alive,
        t=jnp.full(N, BIG), prim=jnp.full(N, -1, jnp.int32),
        u=jnp.zeros(N), v=jnp.zeros(N), tcap=tmax0,
    )

    def cond(st):
        return jnp.any(st["alive"])

    def body(st):
        nid = st["node"]
        lf = bvh.left[nid]
        cnt = bvh.count[nid]
        is_leaf = lf < 0
        act = st["alive"]

        # --- leaf: test up to MAX_LEAF triangles ---
        first = ~lf  # leaf first index (valid only when is_leaf)
        t_best, prim_b, u_b, v_b = st["t"], st["prim"], st["u"], st["v"]
        for k in range(MAX_LEAF):
            test = act & is_leaf & (k < cnt)
            slot = jnp.clip(first + k, 0, bvh.tri_order.shape[0] - 1)
            tid = bvh.tri_order[slot]
            vi = tri_vidx[tid]
            a = verts[vi[:, 0]]
            e1 = verts[vi[:, 1]] - a
            e2 = verts[vi[:, 2]] - a
            t, u, v, ok = _mt_single(rays.o, rays.d, a, e1, e2)
            ok = ok & test & (t > rays.tmin) & (t < st["tcap"]) & (t < t_best)
            if exclude_prim is not None:
                ok = ok & (tid != exclude_prim)
            if exclude_prim2 is not None:
                ok = ok & (tid != exclude_prim2)
            t_best = jnp.where(ok, t, t_best)
            prim_b = jnp.where(ok, tid, prim_b)
            u_b = jnp.where(ok, u, u_b)
            v_b = jnp.where(ok, v, v_b)

        if any_hit:
            done_now = prim_b >= 0
        else:
            done_now = jnp.zeros_like(act)

        # --- inner: test children, push far, descend near ---
        lc = jnp.clip(lf, 0, bvh.left.shape[0] - 1)
        rc = lc + 1
        lhit, lt = _slab_test(bvh.node_min[lc], bvh.node_max[lc], rays.o,
                              inv_d, rays.tmin, jnp.minimum(st["tcap"], t_best))
        rhit, rt = _slab_test(bvh.node_min[rc], bvh.node_max[rc], rays.o,
                              inv_d, rays.tmin, jnp.minimum(st["tcap"], t_best))
        inner = act & (~is_leaf)
        lhit = lhit & inner
        rhit = rhit & inner
        both = lhit & rhit
        near_is_left = lt <= rt
        near = jnp.where(near_is_left, lc, rc)
        far = jnp.where(near_is_left, rc, lc)
        next_inner = jnp.where(both, near,
                               jnp.where(lhit, lc, jnp.where(rhit, rc, -1)))
        # push far child when both hit
        spv = st["sp"]
        stk = st["stack"]
        push = both
        stk = stk.at[jnp.arange(N), jnp.clip(spv, 0, STACK_DEPTH - 1)].set(
            jnp.where(push, far, stk[jnp.arange(N), jnp.clip(spv, 0, STACK_DEPTH - 1)]))
        spv = spv + push.astype(jnp.int32)

        # leaves and dead inner nodes pop from stack
        want_pop = act & (is_leaf | (next_inner < 0)) & (~done_now)
        can_pop = spv > 0
        spv2 = spv - (want_pop & can_pop).astype(jnp.int32)
        popped = stk[jnp.arange(N), jnp.clip(spv2, 0, STACK_DEPTH - 1)]
        next_node = jnp.where(want_pop & can_pop, popped,
                              jnp.where(act & (~is_leaf), next_inner, 0))
        new_alive = act & (~done_now) & jnp.where(
            want_pop, can_pop, (is_leaf) | (next_inner >= 0))

        return dict(stack=stk, sp=jnp.where(act, spv2, st["sp"]),
                    node=jnp.where(act, jnp.maximum(next_node, 0), st["node"]),
                    alive=new_alive, t=t_best, prim=prim_b, u=u_b, v=v_b,
                    tcap=st["tcap"])

    st = jax.lax.while_loop(cond, body, state)
    miss = st["prim"] < 0
    hits = Hits(t=jnp.where(miss, -1.0, st["t"]), prim=st["prim"],
                u=st["u"], v=st["v"])
    if any_hit:
        return st["prim"] >= 0
    return hits


def closest_hit_bvh(geom, bvh: BVHData, rays: Rays, exclude_prim=None) -> Hits:
    return _traverse(geom, bvh, rays, any_hit=False, exclude_prim=exclude_prim)


def any_hit_bvh(geom, bvh: BVHData, rays: Rays, exclude_prim=None,
                exclude_prim2=None) -> jnp.ndarray:
    return _traverse(geom, bvh, rays, any_hit=True, exclude_prim=exclude_prim,
                     exclude_prim2=exclude_prim2)
