"""Ray differentials and parametric surface derivatives.

Reference: include/core_api/ray.h:38-57 — diffRay_t carries the +1-pixel
x/y neighbor rays shot alongside every camera ray
(integrator.cc:299-304); include/core_api/surface.h:105-118 +
src/yafraycore/surface.cc — spDifferentials_t projects them onto the hit
tangent plane (dPdx/dPdy) and solves for the UV-space footprint
(dUdx/dVdx/dUdy/dVdy) against the parametric dPdU/dPdV; the footprint
drives image-texture LOD.

TPU shape: everything is a wavefront array op; the parametric dPdU/dPdV
come straight from the triangle's vertex positions and UVs (the
reference precomputes them in triangle_t::getSurface,
src/yafraycore/triangle.cc), falling back to the shading frame when a
mesh has no (or degenerate) UVs.
"""
from __future__ import annotations

import jax.numpy as jnp

from core_tpu.mathutils import dot


def surface_dpduv(scene, sp):
    """Parametric position derivatives (dPdU, dPdV) [N,3] each at the
    hit triangles, plus a bool mask of where real UV derivatives exist
    (degenerate/missing UVs fall back to the shading frame nu/nv)."""
    g = scene.geom
    prim = jnp.clip(sp.prim, 0, g.n_tris - 1)
    vi = g.tri_vidx[prim]
    a = g.verts[vi[:, 0]]
    b = g.verts[vi[:, 1]]
    c = g.verts[vi[:, 2]]
    uvs = g.uvs[prim]                     # [N,3,2]
    e1 = b - a
    e2 = c - a
    duv1 = uvs[:, 1] - uvs[:, 0]
    duv2 = uvs[:, 2] - uvs[:, 0]
    det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    dpdu = (duv2[..., 1:2] * e1 - duv1[..., 1:2] * e2) * inv[..., None]
    dpdv = (-duv2[..., 0:1] * e1 + duv1[..., 0:1] * e2) * inv[..., None]
    dpdu = jnp.where(ok[..., None], dpdu, sp.nu)
    dpdv = jnp.where(ok[..., None], dpdv, sp.nv)
    return dpdu, dpdv, ok


def camera_diff_dirs(cam, px, py, lu=None, lv=None):
    """Directions of the +1-pixel x/y neighbor rays (diffRay_t xdir/ydir;
    the reference shoots them with the same lens sample,
    integrator.cc:299-304).  Returns (dxd [N,3], dyd [N,3])."""
    from core_tpu.cameras import shoot_ray
    rx, _ = shoot_ray(cam, px + 1.0, py, lu, lv)
    ry, _ = shoot_ray(cam, px, py + 1.0, lu, lv)
    return rx.d, ry.d


def sp_differentials(p, n, o, dxd, dyd):
    """Tangent-plane projection of the neighbor rays
    (spDifferentials_t ctor, surface.cc): dPdx = hit of the x-ray with
    the plane through p with normal n, minus p.  o: shared ray origin
    (pinhole; the reference uses the differential ray's own origin —
    identical for non-lens cameras)."""
    dist = dot(p - o, n)

    def offset(d):
        denom = dot(d, n)
        t = dist / jnp.where(jnp.abs(denom) < 1e-9,
                             jnp.where(denom < 0, -1e-9, 1e-9), denom)
        return o + d * t[..., None] - p

    return offset(dxd), offset(dyd)


def uv_differentials(dpdx, dpdy, dpdu, dpdv, n):
    """Solve dPdx = dudx*dPdU + dvdx*dPdV (and same for y) on the two
    dominant axes of the normal (spDifferentials_t::getUVdifferentials).
    Returns (dudx, dvdx, dudy, dvdy) [N] each."""
    an = jnp.abs(n)
    # drop the dominant normal axis: pick the two remaining columns
    drop_x = (an[..., 0] >= an[..., 1]) & (an[..., 0] >= an[..., 2])
    drop_y = (~drop_x) & (an[..., 1] >= an[..., 2])

    def pick2(v3):
        c0 = jnp.where(drop_x, v3[..., 1], v3[..., 0])
        c1 = jnp.where(drop_x | drop_y, v3[..., 2], v3[..., 1])
        return c0, c1

    a00, a01 = pick2(dpdu)[0], pick2(dpdv)[0]
    a10, a11 = pick2(dpdu)[1], pick2(dpdv)[1]
    det = a00 * a11 - a01 * a10
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)

    def solve(rhs):
        b0, b1 = pick2(rhs)
        du = (b0 * a11 - b1 * a01) * inv
        dv = (b1 * a00 - b0 * a10) * inv
        return jnp.where(ok, du, 0.0), jnp.where(ok, dv, 0.0)

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    return dudx, dvdx, dudy, dvdy


def texture_lod(scene, sp, rays, dxd, dyd):
    """Per-hit mip LOD (log2 of the texel-space footprint) for image
    textures, from primary-ray differentials.  Returns [N] float,
    0 where no footprint is recoverable."""
    dpdu, dpdv, _ = surface_dpduv(scene, sp)
    dpdx, dpdy = sp_differentials(sp.p, sp.ng, rays.o, dxd, dyd)
    dudx, dvdx, dudy, dvdy = uv_differentials(dpdx, dpdy, dpdu, dpdv,
                                              sp.ng)
    # footprint in UV units; the texture eval rescales by its own
    # resolution and repeat factors before taking the log2
    w2 = jnp.maximum(dudx * dudx + dvdx * dvdx,
                     dudy * dudy + dvdy * dvdy)
    return jnp.sqrt(jnp.maximum(w2, 0.0))
