"""Core wavefront pytree types.

The reference keeps per-ray state in C++ structs (ray_t include/core_api/ray.h,
surfacePoint_t include/core_api/surface.h, renderState_t
include/core_api/scene.h:72-115).  Here the whole wavefront is a NamedTuple of
arrays: one leaf per field, leading axis = ray index.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Rays(NamedTuple):
    """A wavefront of rays. o,d: [N,3]; tmin,tmax: [N] (tmax<0 => unbounded)."""
    o: jnp.ndarray
    d: jnp.ndarray
    tmin: jnp.ndarray
    tmax: jnp.ndarray


def make_rays(o, d, tmin=None, tmax=None):
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    n = o.shape[:-1]
    if tmin is None:
        tmin = jnp.zeros(n, jnp.float32)
    if tmax is None:
        tmax = jnp.full(n, -1.0, jnp.float32)
    return Rays(o, d, jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), n),
                jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), n))


class Hits(NamedTuple):
    """Closest-hit record per ray.  prim == -1 means miss."""
    t: jnp.ndarray        # [N] hit distance
    prim: jnp.ndarray     # [N] int32 triangle index (-1 miss)
    u: jnp.ndarray        # [N] barycentric u
    v: jnp.ndarray        # [N] barycentric v

    @property
    def valid(self):
        return self.prim >= 0


class SurfacePoints(NamedTuple):
    """Shading data at hit points (reference surfacePoint_t, surface.h:63-101)."""
    p: jnp.ndarray        # [N,3] position
    n: jnp.ndarray        # [N,3] shading normal
    ng: jnp.ndarray       # [N,3] geometric normal
    nu: jnp.ndarray       # [N,3] shading frame tangent
    nv: jnp.ndarray       # [N,3] shading frame bitangent
    uv: jnp.ndarray       # [N,2] texture coords
    mat: jnp.ndarray      # [N] int32 material index
    light: jnp.ndarray    # [N] int32 area-light index bound to the surface (-1 none)
    prim: jnp.ndarray     # [N] int32 triangle index
    obj: jnp.ndarray      # [N] int32 object id
