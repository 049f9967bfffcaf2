"""SoA 3-vector math: the TPU-native layout for wavefront geometry/color.

Why this exists: jnp arrays of shape [N, 3] put the xyz/rgb axis in the
TPU's 128-lane minor dimension, so every elementwise op runs at 3/128 lane
occupancy (measured ~100x off peak in the NEE inner loop).  V3 stores the
three components as separate dense [N] arrays; all vector/color math then
runs on fully-occupied (8,128) vector registers.

This is the L0 math layer of the framework (reference:
include/core_api/vector3d.h, color.h) in its performance-critical form;
mathutils.py keeps the [N,3] "AoS" helpers for host-side/setup code and
compatibility wrappers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    """Three same-shaped arrays; represents vectors or RGB colors."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic (V3 op V3 elementwise; V3 op array/scalar broadcasts) --
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    @property
    def shape(self):
        return jnp.shape(self.x)


def v3(a) -> V3:
    """[..., 3] AoS array -> V3 (three strided slices; pay once per stage)."""
    a = jnp.asarray(a)
    return V3(a[..., 0], a[..., 1], a[..., 2])


def aos(v: V3) -> jnp.ndarray:
    """V3 -> [..., 3] (for film splat / API boundaries only)."""
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def const3(cx, cy=None, cz=None, like=None) -> V3:
    """Constant V3, optionally broadcast to the shape of `like` ([N] array)."""
    if cy is None:
        cx, cy, cz = cx
    f = jnp.float32
    if like is not None:
        shp = jnp.shape(like)
        return V3(jnp.full(shp, cx, f), jnp.full(shp, cy, f),
                  jnp.full(shp, cz, f))
    return V3(jnp.asarray(cx, f), jnp.asarray(cy, f), jnp.asarray(cz, f))


def splat3(row, like=None) -> V3:
    """[3] device array -> V3 of scalars (or broadcast to like's shape)."""
    r = v3(row)
    if like is None:
        return r
    shp = jnp.shape(like)
    return V3(jnp.broadcast_to(r.x, shp), jnp.broadcast_to(r.y, shp),
              jnp.broadcast_to(r.z, shp))


def zeros3(like) -> V3:
    z = jnp.zeros(jnp.shape(like), jnp.float32)
    return V3(z, z, z)


def dot3(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross3(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def length3(a: V3):
    return jnp.sqrt(dot3(a, a))


def length_sqr3(a: V3):
    return dot3(a, a)


def normalize3(a: V3, eps: float = 1e-20) -> V3:
    n2 = dot3(a, a)
    inv = jnp.where(n2 > eps, jax.lax.rsqrt(jnp.maximum(n2, eps)), 0.0)
    return a * inv


def normalize_len3(a: V3, eps: float = 1e-20):
    n2 = dot3(a, a)
    n = jnp.sqrt(n2)
    inv = jnp.where(n > eps, 1.0 / jnp.maximum(n, eps), 0.0)
    return a * inv, n


def where3(m, a: V3, b) -> V3:
    """Select with a [N] bool mask; b may be V3 or scalar."""
    if not isinstance(b, V3):
        return V3(jnp.where(m, a.x, b), jnp.where(m, a.y, b),
                  jnp.where(m, a.z, b))
    return V3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y),
              jnp.where(m, a.z, b.z))


def lerp3(a: V3, b: V3, t) -> V3:
    return a * (1.0 - t) + b * t


def reflect3(n: V3, w: V3) -> V3:
    """2*(n.w)*n - w  (reference vector3d.h reflect_plane convention)."""
    return n * (2.0 * dot3(n, w)) - w


def luminance3(c: V3):
    """Reference color_t::energy: (r+g+b)/3."""
    return (c.x + c.y + c.z) * (1.0 / 3.0)


def maxcomp3(c: V3):
    return jnp.maximum(c.x, jnp.maximum(c.y, c.z))


def create_cs3(n: V3):
    """Orthonormal frame around unit n (reference createCS, vector3d.h)."""
    degenerate = (jnp.abs(n.x) < 1e-6) & (jnp.abs(n.y) < 1e-6)
    d = jnp.sqrt(jnp.maximum(n.y * n.y + n.x * n.x, 1e-20))
    inv_d = 1.0 / d
    sign = jnp.where(n.z < 0.0, -1.0, 1.0)
    u = V3(jnp.where(degenerate, sign, n.y * inv_d),
           jnp.where(degenerate, 0.0, -n.x * inv_d),
           jnp.zeros_like(n.z))
    v = cross3(n, u)
    return u, v


def tile3(a: V3, reps: int) -> V3:
    """Repeat each component `reps` times along a new leading axis, then
    flatten: [N] -> [reps*N].  Used to batch QMC samples into one wavefront."""
    def t(c):
        return jnp.broadcast_to(c[None], (reps,) + c.shape).reshape(-1)
    return V3(t(a.x), t(a.y), t(a.z))


def tile1(c, reps: int):
    return jnp.broadcast_to(c[None], (reps,) + c.shape).reshape(-1)


def untile_sum3(a: V3, reps: int) -> V3:
    """Inverse of tile3 + sum over the sample axis: [reps*N] -> [N]."""
    def u(c):
        return jnp.sum(c.reshape(reps, -1), axis=0)
    return V3(u(a.x), u(a.y), u(a.z))


# ---------------------------------------------------------------------------
# SoA wavefront records
# ---------------------------------------------------------------------------

class RaysS(NamedTuple):
    """SoA ray wavefront. o,d: V3 of [N]; tmin,tmax: [N] (tmax<0 unbounded)."""
    o: V3
    d: V3
    tmin: jnp.ndarray
    tmax: jnp.ndarray


class SPS(NamedTuple):
    """SoA surface points (reference surfacePoint_t, surface.h:63-101)."""
    p: V3
    n: V3
    ng: V3
    nu: V3
    nv: V3
    u: jnp.ndarray        # [N] texture u
    v: jnp.ndarray        # [N] texture v
    mat: jnp.ndarray      # [N] i32
    light: jnp.ndarray    # [N] i32 bound area-light id (-1 none)
    prim: jnp.ndarray     # [N] i32
    obj: jnp.ndarray      # [N] i32


def rays_to_soa(rays) -> RaysS:
    return RaysS(o=v3(rays.o), d=v3(rays.d), tmin=rays.tmin, tmax=rays.tmax)


def rays_to_aos(rs: RaysS):
    from core_tpu.types import Rays
    return Rays(o=aos(rs.o), d=aos(rs.d), tmin=rs.tmin, tmax=rs.tmax)


def sp_to_soa(sp) -> SPS:
    return SPS(p=v3(sp.p), n=v3(sp.n), ng=v3(sp.ng), nu=v3(sp.nu),
               nv=v3(sp.nv), u=sp.uv[..., 0], v=sp.uv[..., 1],
               mat=sp.mat, light=sp.light, prim=sp.prim, obj=sp.obj)


def sp_to_aos(s: SPS):
    from core_tpu.types import SurfacePoints
    return SurfacePoints(p=aos(s.p), n=aos(s.n), ng=aos(s.ng), nu=aos(s.nu),
                         nv=aos(s.nv), uv=jnp.stack([s.u, s.v], axis=-1),
                         mat=s.mat, light=s.light, prim=s.prim, obj=s.obj)
