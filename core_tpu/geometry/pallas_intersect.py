"""Pallas TPU kernels for ray-triangle intersection (the hot path).

The pure-jnp brute force (intersect.py) materializes [N, block, 3]
intermediates in HBM per triangle block; on TPU that is bandwidth-bound at
~20 Mrays/s.  These kernels keep the whole triangle soup (SoA, [T,9]) in
VMEM and stream ray tiles of (8, 128) sublanes x lanes through the VPU,
looping triangles in-register — HBM traffic is exactly the ray inputs and
hit outputs.  This is the "traversal/intersection as TPU kernels" design
point (SURVEY §7, BASELINE north star); the BVH front-end reduces the
triangle loop for large scenes.

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
                      tri_ref, o_ref, d_ref, lim_ref, excl_ref,
                      t_ref, prim_ref, u_ref, v_ref):
    """One (SUB, LANES) ray tile vs all triangles.

    tri_ref: [Tpad, 9] VMEM; o_ref/d_ref: [3, SUB, LANES]; lim_ref:
    [2, SUB, LANES] (tmin, tcap); excl_ref: [2, SUB, LANES] i32.
    """
    ox = o_ref[0]
    oy = o_ref[1]
    oz = o_ref[2]
    dx = d_ref[0]
    dy = d_ref[1]
    dz = d_ref[2]
    tmin = lim_ref[0]
    tcap = lim_ref[1]
    ex0 = excl_ref[0]
    ex1 = excl_ref[1]

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


def _any_hit_kernel(n_tris: int, tri_ref, o_ref, d_ref, lim_ref, excl_ref,
                    hit_ref):
    """Shadow-ray variant: only a boolean occlusion carry — ~20% fewer VPU
    ops per triangle than the closest-hit kernel (no best-t/prim/u/v)."""
    ox = o_ref[0]
    oy = o_ref[1]
    oz = o_ref[2]
    dx = d_ref[0]
    dy = d_ref[1]
    dz = d_ref[2]
    tmin = lim_ref[0]
    tcap = lim_ref[1]
    ex0 = excl_ref[0]
    ex1 = excl_ref[1]

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


@functools.partial(jax.jit, static_argnames=("n_tris", "interpret"))
def _run_any(tri, o3, d3, lim, excl, n_tris: int, interpret: bool = False):
    n_tiles = o3.shape[1] // SUB
    ray_spec = pl.BlockSpec((3, SUB, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    lim_spec = pl.BlockSpec((2, SUB, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    nrows = o3.shape[1]
    return pl.pallas_call(
        functools.partial(_any_hit_kernel, n_tris),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, lim_spec,
            pl.BlockSpec((2, SUB, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), jnp.int32)],
        interpret=interpret,
    )(tri, o3, d3, lim, excl)


@functools.partial(jax.jit,
                   static_argnames=("n_tris", "any_hit", "interpret"))
def _run(tri, o3, d3, lim, excl, n_tris: int, any_hit: bool,
         interpret: bool = False):
    n_tiles = o3.shape[1] // SUB
    ray_spec = pl.BlockSpec((3, SUB, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    lim_spec = pl.BlockSpec((2, SUB, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    nrows = o3.shape[1]
    return pl.pallas_call(
        functools.partial(_intersect_kernel, n_tris, any_hit),
        grid=(n_tiles,),
        in_specs=[
            # triangle table: small, scalar-indexed per iteration
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, lim_spec,
            pl.BlockSpec((2, SUB, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(tri, o3, d3, lim, excl)


def _prep_soa(rays_s, exclude_prim, exclude_prim2):
    """SoA ray wavefront (vec.RaysS) -> kernel tiles.  All reshapes here are
    dense [N]-array ops (no [N,3] strided slices)."""
    n = rays_s.tmin.shape[0]
    pad = (-n) % TILE
    npad = n + pad

    def pad1(a, fill=0.0):
        return jnp.pad(a, ((0, pad),), constant_values=fill)

    def rows(a, fill=0.0):
        return pad1(a, fill).reshape(npad // LANES, LANES)

    tcap = jnp.where(rays_s.tmax > 0, rays_s.tmax, BIG)
    ex0 = exclude_prim if exclude_prim is not None \
        else jnp.full(n, -2, jnp.int32)
    ex1 = exclude_prim2 if exclude_prim2 is not None \
        else jnp.full(n, -2, jnp.int32)
    o3 = jnp.stack([rows(rays_s.o.x), rows(rays_s.o.y), rows(rays_s.o.z)], 0)
    d3 = jnp.stack([rows(rays_s.d.x), rows(rays_s.d.y), rows(rays_s.d.z)], 0)
    lim = jnp.stack([rows(rays_s.tmin), rows(tcap, fill=-1.0)], axis=0)
    excl = jnp.stack([rows(ex0.astype(jnp.int32), fill=-2),
                      rows(ex1.astype(jnp.int32), fill=-2)], axis=0)
    return o3, d3, lim, excl, n, npad


def closest_hit_pallas_s(geom, rays_s, exclude_prim=None,
                         exclude_prim2=None, interpret=False) -> Hits:
    """SoA entry: takes vec.RaysS, returns Hits ([N] leaves, layout-neutral)."""
    tri, n_tris = _pack_tris(geom.verts, geom.tri_vidx)
    o3, d3, lim, excl, n, npad = _prep_soa(rays_s, exclude_prim,
                                           exclude_prim2)
    t, prim, u, v = _run(tri, o3, d3, lim, excl, n_tris, False,
                         interpret=interpret)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    miss = prim < 0
    return Hits(t=jnp.where(miss, -1.0, t), prim=prim, u=u, v=v)


def any_hit_pallas_s(geom, rays_s, exclude_prim=None, exclude_prim2=None):
    tri, n_tris = _pack_tris(geom.verts, geom.tri_vidx)
    o3, d3, lim, excl, n, npad = _prep_soa(rays_s, exclude_prim,
                                           exclude_prim2)
    (hit,) = _run_any(tri, o3, d3, lim, excl, n_tris)
    return hit.reshape(-1)[:n] > 0


def _prep(geom, rays: Rays, exclude_prim, exclude_prim2):
    n = rays.o.shape[0]
    pad = (-n) % TILE
    npad = n + pad

    def pad1(a, fill=0.0):
        return jnp.pad(a, ((0, pad),), constant_values=fill)

    tcap = jnp.where(rays.tmax > 0, rays.tmax, BIG)
    ex0 = exclude_prim if exclude_prim is not None \
        else jnp.full(n, -2, jnp.int32)
    ex1 = exclude_prim2 if exclude_prim2 is not None \
        else jnp.full(n, -2, jnp.int32)

    def tile3(a, b, c):
        return jnp.stack([
            pad1(a).reshape(npad // LANES, LANES),
            pad1(b).reshape(npad // LANES, LANES),
            pad1(c).reshape(npad // LANES, LANES)], axis=0)

    o3 = tile3(rays.o[:, 0], rays.o[:, 1], rays.o[:, 2])
    d3 = tile3(rays.d[:, 0], rays.d[:, 1], rays.d[:, 2])
    lim = jnp.stack([pad1(rays.tmin).reshape(npad // LANES, LANES),
                     pad1(tcap, fill=-1.0).reshape(npad // LANES, LANES)],
                    axis=0)
    excl = jnp.stack([
        pad1(ex0.astype(jnp.int32), fill=-2).reshape(npad // LANES, LANES),
        pad1(ex1.astype(jnp.int32), fill=-2).reshape(npad // LANES, LANES)],
        axis=0)
    return o3, d3, lim, excl, n, npad


def closest_hit_pallas(geom, rays: Rays, exclude_prim=None,
                       exclude_prim2=None, interpret=False) -> Hits:
    tri, n_tris = _pack_tris(geom.verts, geom.tri_vidx)
    o3, d3, lim, excl, n, npad = _prep(geom, rays, exclude_prim,
                                       exclude_prim2)
    t, prim, u, v = _run(tri, o3, d3, lim, excl, n_tris, False,
                         interpret=interpret)
    t = t.reshape(-1)[:n]
    prim = prim.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    miss = prim < 0
    return Hits(t=jnp.where(miss, -1.0, t), prim=prim, u=u, v=v)


def any_hit_pallas(geom, rays: Rays, exclude_prim=None, exclude_prim2=None):
    hits = closest_hit_pallas(geom, rays, exclude_prim, exclude_prim2)
    return hits.prim >= 0
