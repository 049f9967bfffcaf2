"""Ray-scene intersection as batched TPU compute.

The reference traverses a pointer-based SAH kd-tree per ray
(triKdTree_t::Intersect, src/yafraycore/kdtree.cc; Möller-Trumbore in
include/yafraycore/triangle_inline.h:27-60).  On TPU the same queries are
wavefront-batched: every ray in flight is tested against blocks of
triangles at once (VPU elementwise math), with a scan over triangle blocks
for the brute-force path and a lockstep stack walk over a flattened BVH for
large scenes (see bvh.py).

Entry points:
    closest_hit(geom, accel, rays)  -> Hits
    any_hit(geom, accel, rays)      -> bool mask  (shadow query, IntersectS)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from core_tpu.types import Rays, Hits
from core_tpu.mathutils import cross

BIG = 3.0e38


def _tri_arrays(geom):
    v0 = geom.verts[geom.tri_vidx[:, 0]]
    e1 = geom.verts[geom.tri_vidx[:, 1]] - v0
    e2 = geom.verts[geom.tri_vidx[:, 2]] - v0
    return v0, e1, e2


def _mt_block(o, d, v0, e1, e2):
    """Möller-Trumbore for rays [N,3] x triangle block [B,3].

    Returns t, u, v, valid of shape [N, B].  Matches the reference's
    intersect (triangle_inline.h:27-60): det==0 miss, u,v in [0,1], u+v<=1.
    """
    pvec = cross(d[:, None, :], e2[None, :, :])            # [N,B,3]
    det = jnp.sum(e1[None] * pvec, axis=-1)                # [N,B]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o[:, None, :] - v0[None]                        # [N,B,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = cross(tvec, e1[None, :, :])
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
    valid = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
        & (u + v <= 1.0)
    return t, u, v, valid


def _pad_tris(v0, e1, e2, block):
    T = v0.shape[0]
    pad = (-T) % block
    if pad:
        z = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, z])
        e1 = jnp.concatenate([e1, z])
        e2 = jnp.concatenate([e2, z])
    return v0, e1, e2, T


def closest_hit_brute(geom, rays: Rays, block: int = 64,
                      exclude_prim: Optional[jnp.ndarray] = None) -> Hits:
    """Closest hit by scanning triangle blocks; O(N*T) but fully vectorized.

    exclude_prim: [N] primitive index never reported (self-intersection
    avoidance alternative to the reference's MIN_RAYDIST epsilon)."""
    v0, e1, e2 = _tri_arrays(geom)
    v0, e1, e2, T = _pad_tris(v0, e1, e2, block)
    nblocks = v0.shape[0] // block
    N = rays.o.shape[0]
    tmax = jnp.where(rays.tmax > 0, rays.tmax, BIG)

    v0b = v0.reshape(nblocks, block, 3)
    e1b = e1.reshape(nblocks, block, 3)
    e2b = e2.reshape(nblocks, block, 3)

    def body(carry, blk):
        best_t, best_prim, best_u, best_v = carry
        bv0, be1, be2, base = blk
        t, u, v, ok = _mt_block(rays.o, rays.d, bv0, be1, be2)
        prim = base + jax.lax.broadcasted_iota(jnp.int32, (N, block), 1)
        ok = ok & (t > rays.tmin[:, None]) & (t < tmax[:, None]) & (prim < T)
        if exclude_prim is not None:
            ok = ok & (prim != exclude_prim[:, None])
        t = jnp.where(ok, t, BIG)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(N)
        tj, uj, vj, pj = t[rows, j], u[rows, j], v[rows, j], prim[rows, j]
        better = tj < best_t
        return (jnp.where(better, tj, best_t),
                jnp.where(better, pj, best_prim),
                jnp.where(better, uj, best_u),
                jnp.where(better, vj, best_v)), None

    init = (jnp.full(N, BIG), jnp.full(N, -1, jnp.int32),
            jnp.zeros(N), jnp.zeros(N))
    bases = (jnp.arange(nblocks, dtype=jnp.int32) * block)
    (bt, bp, bu, bv), _ = jax.lax.scan(body, init, (v0b, e1b, e2b, bases))
    miss = bp < 0
    return Hits(t=jnp.where(miss, -1.0, bt), prim=bp, u=bu, v=bv)


def any_hit_brute(geom, rays: Rays, block: int = 64,
                  exclude_prim: Optional[jnp.ndarray] = None,
                  exclude_prim2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Shadow query: True where some triangle blocks the segment
    (reference triKdTree_t::IntersectS, kdtree.cc)."""
    v0, e1, e2 = _tri_arrays(geom)
    v0, e1, e2, T = _pad_tris(v0, e1, e2, block)
    nblocks = v0.shape[0] // block
    N = rays.o.shape[0]
    tmax = jnp.where(rays.tmax > 0, rays.tmax, BIG)

    v0b = v0.reshape(nblocks, block, 3)
    e1b = e1.reshape(nblocks, block, 3)
    e2b = e2.reshape(nblocks, block, 3)

    def body(carry, blk):
        blocked = carry
        bv0, be1, be2, base = blk
        t, _, _, ok = _mt_block(rays.o, rays.d, bv0, be1, be2)
        prim = base + jax.lax.broadcasted_iota(jnp.int32, (N, block), 1)
        ok = ok & (t > rays.tmin[:, None]) & (t < tmax[:, None]) & (prim < T)
        if exclude_prim is not None:
            ok = ok & (prim != exclude_prim[:, None])
        if exclude_prim2 is not None:
            ok = ok & (prim != exclude_prim2[:, None])
        return blocked | jnp.any(ok, axis=1), None

    bases = (jnp.arange(nblocks, dtype=jnp.int32) * block)
    blocked, _ = jax.lax.scan(body, jnp.zeros(N, bool), (v0b, e1b, e2b, bases))
    return blocked
