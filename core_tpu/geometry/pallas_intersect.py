"""Pallas TPU kernels for ray-triangle intersection (the hot path).

The pure-jnp brute force (intersect.py) materializes [N, block, 3]
intermediates in HBM per triangle block; on TPU that is bandwidth-bound at
~20 Mrays/s.  These kernels keep the whole triangle soup (SoA, [T,9]) in
VMEM and stream ray tiles of (8, 128) sublanes x lanes through the VPU,
looping triangles in-register — HBM traffic is exactly the ray inputs and
hit outputs.  This is the "traversal/intersection as TPU kernels" design
point (SURVEY §7, BASELINE north star); the BVH front-end reduces the
triangle loop for large scenes.

Ray inputs are TEN SEPARATE [rows, 128] refs (ox..oz, dx..dz, tmin, tcap,
ex0, ex1) rather than stacked [3, rows, 128] arrays: the SoA wavefront
components arrive as independent [N] arrays, and `jnp.stack` would copy
every one of them through HBM per kernel launch (profiled ~8 ms/step of
copy/reshape at the bench wavefront) — a [N] -> [rows, 128] reshape is
layout-free, so separate refs cost nothing.

Semantics match intersect.closest_hit_brute / any_hit_brute:
Möller-Trumbore with |det| > 1e-12, t in (tmin, tcap), optional one or two
excluded primitive ids per ray.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from core_tpu.types import Rays, Hits

BIG = 3.0e38
SUB = 8          # sublanes per tile
LANES = 128      # lanes per tile
TILE = SUB * LANES


def _pack_tris(verts, tri_vidx):
    """[T,9] SoA triangle rows: v0, e1, e2 (padded to a multiple of 8)."""
    v0 = verts[tri_vidx[:, 0]]
    e1 = verts[tri_vidx[:, 1]] - v0
    e2 = verts[tri_vidx[:, 2]] - v0
    tri = jnp.concatenate([v0, e1, e2], axis=-1)           # [T,9]
    t = tri.shape[0]
    pad = (-t) % 8
    if pad:
        # degenerate rows (zero edges) never produce hits
        tri = jnp.concatenate([tri, jnp.zeros((pad, 9), tri.dtype)], axis=0)
    return tri, t


def _intersect_kernel(n_tris: int, any_hit: bool,
                      tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
                      dz_ref, tmin_ref, tcap_ref, ex0_ref, ex1_ref,
                      t_ref, prim_ref, u_ref, v_ref):
    """One (SUB, LANES) ray tile vs all triangles.

    tri_ref: [Tpad, 9] SMEM; ray component refs: [SUB, LANES] each.
    """
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    tmin = tmin_ref[...]
    tcap = tcap_ref[...]
    ex0 = ex0_ref[...]
    ex1 = ex1_ref[...]

    def body(i, carry):
        bt, bp, bu, bv = carry
        v0x = tri_ref[i, 0]
        v0y = tri_ref[i, 1]
        v0z = tri_ref[i, 2]
        e1x = tri_ref[i, 3]
        e1y = tri_ref[i, 4]
        e1z = tri_ref[i, 5]
        e2x = tri_ref[i, 6]
        e2y = tri_ref[i, 7]
        e2z = tri_ref[i, 8]
        # pvec = d x e2
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
        # qvec = tvec x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (t > tmin) & (t < tcap) & (t < bt) \
            & (i != ex0) & (i != ex1)
        bt = jnp.where(ok, t, bt)
        bp = jnp.where(ok, i, bp)
        bu = jnp.where(ok, u, bu)
        bv = jnp.where(ok, v, bv)
        return bt, bp, bu, bv

    init = (jnp.full((SUB, LANES), BIG, jnp.float32),
            jnp.full((SUB, LANES), -1, jnp.int32),
            jnp.zeros((SUB, LANES), jnp.float32),
            jnp.zeros((SUB, LANES), jnp.float32))
    bt, bp, bu, bv = jax.lax.fori_loop(0, n_tris, body, init)
    t_ref[...] = bt
    prim_ref[...] = bp
    u_ref[...] = bu
    v_ref[...] = bv


def _any_hit_kernel(n_tris: int, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref,
                    dy_ref, dz_ref, tmin_ref, tcap_ref, ex0_ref, ex1_ref,
                    hit_ref):
    """Shadow-ray variant: only a boolean occlusion carry — ~20% fewer VPU
    ops per triangle than the closest-hit kernel (no best-t/prim/u/v)."""
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]
    tmin = tmin_ref[...]
    tcap = tcap_ref[...]
    ex0 = ex0_ref[...]
    ex1 = ex1_ref[...]

    def body(i, hit):
        v0x = tri_ref[i, 0]
        v0y = tri_ref[i, 1]
        v0z = tri_ref[i, 2]
        e1x = tri_ref[i, 3]
        e1y = tri_ref[i, 4]
        e1z = tri_ref[i, 5]
        e2x = tri_ref[i, 6]
        e2y = tri_ref[i, 7]
        e2z = tri_ref[i, 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        # division-free MT: test s*num against s*det bounds (s = sign(det));
        # a boolean-only query needs no u/v/t values, just their signs.
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
        ok = (dd > 1e-12) & (un >= 0.0) & (vn >= 0.0) & (un + vn <= dd) \
            & (tn > tmin * dd) & (tn < tcap * dd) & (i != ex0) & (i != ex1)
        return hit | ok.astype(jnp.int32)

    hit = jax.lax.fori_loop(0, n_tris, body,
                            jnp.zeros((SUB, LANES), jnp.int32))
    hit_ref[...] = hit


def _any_hit_nee_kernel(n_tris: int, K: int, tri_ref, ox_ref, oy_ref,
                        oz_ref, tmin_ref, ex0_ref, ex1_ref, *rest):
    """K shadow rays PER LANE sharing one origin (the NEE bundle: all
    2*light_samples MIS shadow rays of a shading point start at sp.p).

    Per triangle the origin-only Möller-Trumbore subexpressions are
    computed once and reused across all K directions:
      tvec = o - v0, qvec = tvec x e1, w = e2 x tvec, tnum = e2.qvec,
      m1 = e2 x e1, and the primitive-exclusion compares
    leaving only det = d.m1 / un = d.w / vn = d.qvec + folds per ray
    (~37 ops/ray vs 57 standalone; measured win on the bench NEE).

    rest: K direction triples then K tcap refs then K hit out refs.
    """
    dxs = rest[0:K]
    dys = rest[K:2 * K]
    dzs = rest[2 * K:3 * K]
    tcaps = rest[3 * K:4 * K]
    hit_refs = rest[4 * K:5 * K]

    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    tmin = tmin_ref[...]
    ex0 = ex0_ref[...]
    ex1 = ex1_ref[...]
    d = [(dxs[k][...], dys[k][...], dzs[k][...]) for k in range(K)]
    tc = [tcaps[k][...] for k in range(K)]

    def body(i, hits):
        v0x = tri_ref[i, 0]
        v0y = tri_ref[i, 1]
        v0z = tri_ref[i, 2]
        e1x = tri_ref[i, 3]
        e1y = tri_ref[i, 4]
        e1z = tri_ref[i, 5]
        e2x = tri_ref[i, 6]
        e2y = tri_ref[i, 7]
        e2z = tri_ref[i, 8]
        # origin-shared terms
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        # m1 = e2 x e1  (det = d . m1)
        m1x = e2y * e1z - e2z * e1y
        m1y = e2z * e1x - e2x * e1z
        m1z = e2x * e1y - e2y * e1x
        # w = e2 x tvec  (u_num = d . w)
        wx = e2y * tz - e2z * ty
        wy = e2z * tx - e2x * tz
        wz = e2x * ty - e2y * tx
        # qvec = tvec x e1  (v_num = d . qvec; t_num = e2 . qvec)
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        tnum = e2x * qx + e2y * qy + e2z * qz
        not_excl = (i != ex0) & (i != ex1)

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
                & (un + vn <= dd) & (tn > tmin * dd) & (tn < tc[k] * dd) \
                & not_excl
            out.append(hits[k] | ok.astype(jnp.int32))
        return tuple(out)

    hits = jax.lax.fori_loop(
        0, n_tris, body,
        tuple(jnp.zeros((SUB, LANES), jnp.int32) for _ in range(K)))
    for k in range(K):
        hit_refs[k][...] = hits[k]


@functools.partial(jax.jit, static_argnames=("n_tris", "K", "interpret"))
def _run_any_nee(tri, shared, dirs_flat, tcaps, n_tris: int, K: int,
                 interpret: bool = False):
    nrows = shared[0].shape[0]
    return pl.pallas_call(
        functools.partial(_any_hit_nee_kernel, n_tris, K),
        grid=(nrows // SUB,),
        in_specs=_ray_specs(6 + 4 * K),
        out_specs=[_OUT_SPEC] * K,
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)] * K,
        interpret=interpret,
    )(tri, *shared, *dirs_flat, *tcaps)


def any_hit_nee_pallas_s(geom, o3, tmin, dirs, tcaps, exclude_prim=None,
                         exclude_prim2=None, interpret=False):
    """Shared-origin NEE occlusion bundle.

    o3: V3 [N] shading-point origins; tmin: [N]; dirs: list of K V3 [N]
    unit directions; tcaps: list of K [N] max distances (<=0 -> open ray).
    Returns [K*N] bool, sample-major (ray k of lane j at k*N+j) — the
    layout jnp.concatenate over the K rays would produce.
    """
    tri, n_tris = _pack_tris(geom.verts, geom.tri_vidx)
    K = len(dirs)
    n = tmin.shape[0]
    pad = (-n) % TILE
    npad = n + pad

    def rows(a, fill=0.0):
        return jnp.pad(a, ((0, pad),), constant_values=fill) \
            .reshape(npad // LANES, LANES)

    ex0 = exclude_prim if exclude_prim is not None \
        else jnp.full(n, -2, jnp.int32)
    ex1 = exclude_prim2 if exclude_prim2 is not None \
        else jnp.full(n, -2, jnp.int32)
    shared = (rows(o3.x), rows(o3.y), rows(o3.z), rows(tmin),
              rows(ex0.astype(jnp.int32), fill=-2),
              rows(ex1.astype(jnp.int32), fill=-2))
    dirs_flat = ([rows(v.x) for v in dirs] + [rows(v.y) for v in dirs]
                 + [rows(v.z) for v in dirs])
    tcap_rows = [rows(jnp.where(t > 0, t, BIG), fill=-1.0) for t in tcaps]
    hits = _run_any_nee(tri, shared, dirs_flat, tcap_rows, n_tris, K,
                        interpret=interpret)
    return jnp.concatenate([h.reshape(-1)[:n] for h in hits]) > 0


def _ray_specs(n: int):
    spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return [pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * n


_OUT_SPEC = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n_tris", "interpret"))
def _run_any(tri, comps, n_tris: int, interpret: bool = False):
    nrows = comps[0].shape[0]
    return pl.pallas_call(
        functools.partial(_any_hit_kernel, n_tris),
        grid=(nrows // SUB,),
        in_specs=_ray_specs(10),
        out_specs=[_OUT_SPEC],
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)],
        interpret=interpret,
    )(tri, *comps)


@functools.partial(jax.jit,
                   static_argnames=("n_tris", "any_hit", "interpret"))
def _run(tri, comps, n_tris: int, any_hit: bool, interpret: bool = False):
    nrows = comps[0].shape[0]
    return pl.pallas_call(
        functools.partial(_intersect_kernel, n_tris, any_hit),
        grid=(nrows // SUB,),
        in_specs=_ray_specs(10),
        out_specs=[_OUT_SPEC] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(tri, *comps)


def _prep_soa(rays_s, exclude_prim, exclude_prim2):
    """SoA ray wavefront (vec.RaysS) -> ten [rows, 128] component arrays.
    The [N] -> [rows, 128] reshapes are layout-free; only padding copies."""
    n = rays_s.tmin.shape[0]
    pad = (-n) % TILE
    npad = n + pad

    def rows(a, fill=0.0):
        return jnp.pad(a, ((0, pad),), constant_values=fill) \
            .reshape(npad // LANES, LANES)

    tcap = jnp.where(rays_s.tmax > 0, rays_s.tmax, BIG)
    ex0 = exclude_prim if exclude_prim is not None \
        else jnp.full(n, -2, jnp.int32)
    ex1 = exclude_prim2 if exclude_prim2 is not None \
        else jnp.full(n, -2, jnp.int32)
    comps = (rows(rays_s.o.x), rows(rays_s.o.y), rows(rays_s.o.z),
             rows(rays_s.d.x), rows(rays_s.d.y), rows(rays_s.d.z),
             rows(rays_s.tmin), rows(tcap, fill=-1.0),
             rows(ex0.astype(jnp.int32), fill=-2),
             rows(ex1.astype(jnp.int32), fill=-2))
    return comps, n


def closest_hit_pallas_s(geom, rays_s, exclude_prim=None,
                         exclude_prim2=None, interpret=False) -> Hits:
    """SoA entry: takes vec.RaysS, returns Hits ([N] leaves, layout-neutral)."""
    tri, n_tris = _pack_tris(geom.verts, geom.tri_vidx)
    comps, n = _prep_soa(rays_s, exclude_prim, exclude_prim2)
    t, prim, u, v = _run(tri, comps, n_tris, False, interpret=interpret)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    miss = prim < 0
    return Hits(t=jnp.where(miss, -1.0, t), prim=prim, u=u, v=v)


def any_hit_pallas_s(geom, rays_s, exclude_prim=None, exclude_prim2=None,
                     interpret=False):
    tri, n_tris = _pack_tris(geom.verts, geom.tri_vidx)
    comps, n = _prep_soa(rays_s, exclude_prim, exclude_prim2)
    (hit,) = _run_any(tri, comps, n_tris, interpret=interpret)
    return hit.reshape(-1)[:n] > 0


def _aos_to_soa(rays: Rays):
    from core_tpu.vec import rays_to_soa
    return rays_to_soa(rays)


def closest_hit_pallas(geom, rays: Rays, exclude_prim=None,
                       exclude_prim2=None, interpret=False) -> Hits:
    return closest_hit_pallas_s(geom, _aos_to_soa(rays),
                                exclude_prim=exclude_prim,
                                exclude_prim2=exclude_prim2,
                                interpret=interpret)


def any_hit_pallas(geom, rays: Rays, exclude_prim=None, exclude_prim2=None):
    return any_hit_pallas_s(geom, _aos_to_soa(rays),
                            exclude_prim=exclude_prim,
                            exclude_prim2=exclude_prim2)
