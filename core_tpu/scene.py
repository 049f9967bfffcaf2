"""Scene container + compiled surface-point extraction.

The reference's scene_t (include/core_api/scene.h:158-250) is a stateful C++
object owning kd-trees, lights, materials and render orchestration.  Here a
compiled scene is an immutable pytree of SoA arrays; the builder lives in
build.py / io/xml_loader.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from core_tpu.geometry.mesh import GeomData
from core_tpu.geometry import intersect as isect
from core_tpu.materials.base import MaterialTable
from core_tpu.cameras import Camera
from core_tpu.types import Rays, Hits, SurfacePoints
from core_tpu.mathutils import normalize, cross, create_cs


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Scene:
    geom: GeomData
    materials: MaterialTable
    lights: tuple                     # tuple of light pytrees
    camera: Camera
    background: Any = None            # background pytree or None
    accel: Any = None                 # BVH arrays or None => brute force
    # lights' emitting triangles marked in geom.tri_light; static count:
    n_objects: int = field(metadata=dict(static=True), default=0)
    # static capability flags (from material defs at build time) so jit
    # skips whole code paths the scene can never take:
    has_specular: bool = field(metadata=dict(static=True), default=True)
    has_transparency: bool = field(metadata=dict(static=True), default=False)


def closest_hit(scene: Scene, rays: Rays, exclude_prim=None) -> Hits:
    if scene.accel is not None:
        from core_tpu.geometry import bvh
        return bvh.closest_hit_bvh(scene.geom, scene.accel, rays,
                                   exclude_prim=exclude_prim)
    return isect.closest_hit_brute(scene.geom, rays, exclude_prim=exclude_prim)


def any_hit(scene: Scene, rays: Rays, exclude_prim=None, exclude_prim2=None):
    if scene.accel is not None:
        from core_tpu.geometry import bvh
        return bvh.any_hit_bvh(scene.geom, scene.accel, rays,
                               exclude_prim=exclude_prim,
                               exclude_prim2=exclude_prim2)
    return isect.any_hit_brute(scene.geom, rays, exclude_prim=exclude_prim,
                               exclude_prim2=exclude_prim2)


def surface_points(scene: Scene, rays: Rays, hits: Hits) -> SurfacePoints:
    """Build shading records from hits (reference triangle_t::getSurface,
    src/yafraycore/triangle.cc).  Misses yield clamped-but-unused rows."""
    g = scene.geom
    prim = jnp.clip(hits.prim, 0, g.n_tris - 1)
    vi = g.tri_vidx[prim]                       # [N,3]
    a = g.verts[vi[:, 0]]
    b = g.verts[vi[:, 1]]
    c = g.verts[vi[:, 2]]
    t = jnp.where(hits.prim >= 0, hits.t, 0.0)
    p = rays.o + rays.d * t[..., None]
    ng = normalize(cross(b - a, c - a))
    u = hits.u[..., None]
    v = hits.v[..., None]
    cn = g.corner_n[prim]                       # [N,3,3]
    n_smooth = normalize(cn[:, 0] * (1.0 - u - v) + cn[:, 1] * u + cn[:, 2] * v)
    n = jnp.where(g.smooth[prim][..., None], n_smooth, ng)
    uvs = g.uvs[prim]                           # [N,3,2]
    uv = uvs[:, 0] * (1.0 - u - v) + uvs[:, 1] * u + uvs[:, 2] * v
    nu, nv = create_cs(n)
    return SurfacePoints(p=p, n=n, ng=ng, nu=nu, nv=nv, uv=uv,
                         mat=g.tri_mat[prim], light=g.tri_light[prim],
                         prim=prim, obj=g.tri_obj[prim])
