"""Mesh light: any triangle set as an emitter (reference
src/lights/meshlight.cc).

Build time: per-triangle area CDF (meshlight.cc initIS).  illumSample picks
a triangle by CDF inversion, samples its surface with the sqrt warp
(triangle_t::sample), pdf = dist^2 * pi / (area * cos) — the same
convention as the area light.  intersect() tests the light's own triangle
list brute force for the MIS BSDF-sample side (meshlight.cc:160-186).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, cross, normalize
from core_tpu.lights.base import LightSample, LightHit

DIRAC = False


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MeshLight:
    va: jnp.ndarray       # [T,3] triangle corner A
    vb: jnp.ndarray       # [T,3]
    vc: jnp.ndarray       # [T,3]
    normals: jnp.ndarray  # [T,3] geometric normals
    cdf: jnp.ndarray      # [T] inclusive area CDF (last = 1)
    color: jnp.ndarray    # [3] color * power * pi
    area: jnp.ndarray     # [] total area
    samples: int = field(metadata=dict(static=True), default=4)
    double_sided: bool = field(metadata=dict(static=True), default=False)
    obj_id: int = field(metadata=dict(static=True), default=-1)


def make_mesh_light(verts, tri_vidx, color, power, samples=4,
                    double_sided=False, obj_id=-1) -> MeshLight:
    verts = np.asarray(verts, np.float64)
    tris = np.asarray(tri_vidx, np.int64)
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    n = np.cross(b - a, c - a)
    areas = 0.5 * np.linalg.norm(n, axis=1)
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    total = float(areas.sum())
    cdf = np.cumsum(areas) / max(total, 1e-20)
    return MeshLight(
        va=jnp.asarray(a, jnp.float32), vb=jnp.asarray(b, jnp.float32),
        vc=jnp.asarray(c, jnp.float32),
        normals=jnp.asarray(n, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        color=jnp.asarray(np.asarray(color, np.float32) * power * np.pi),
        area=jnp.asarray(total, jnp.float32),
        samples=int(samples), double_sided=bool(double_sided),
        obj_id=int(obj_id))


def can_intersect(light: MeshLight) -> bool:
    return True


def get_n_samples(light: MeshLight) -> int:
    return light.samples


def _sample_surface(light: MeshLight, s1, s2):
    """CDF triangle pick + sqrt warp (triangle_t::sample)."""
    t = jnp.searchsorted(light.cdf, s1, side="left")
    t = jnp.clip(t, 0, light.cdf.shape[0] - 1)
    lo = jnp.where(t > 0, light.cdf[jnp.maximum(t - 1, 0)], 0.0)
    delta = jnp.maximum(light.cdf[t] - lo, 1e-12)
    ss1 = jnp.clip((s1 - lo) / delta, 0.0, 1.0)
    su = jnp.sqrt(jnp.maximum(ss1, 1e-12))
    a = light.va[t]
    b = light.vb[t]
    c = light.vc[t]
    p = a + (b - a) * (su * (1.0 - s2))[..., None] + (c - a) * (su * s2)[..., None]
    return p, light.normals[t]


def illum_sample(light: MeshLight, sp, s1, s2) -> LightSample:
    p, n = _sample_surface(light, s1, s2)
    ldir = p - sp.p
    dist2 = jnp.sum(ldir * ldir, axis=-1)
    dist = jnp.sqrt(dist2)
    wi = ldir / jnp.maximum(dist[..., None], 1e-12)
    cos_angle = -dot(wi, n)
    if light.double_sided:
        valid = dist > 0.0
        cos_angle = jnp.abs(cos_angle)
    else:
        valid = (dist > 0.0) & (cos_angle > 0.0)
    denom = light.area * jnp.maximum(cos_angle, 0.0)
    pdf = dist2 * np.pi / jnp.maximum(denom, 1e-8)
    return LightSample(valid=valid, wi=wi, dist=dist,
                       col=jnp.broadcast_to(light.color, sp.p.shape), pdf=pdf)


def illuminate(light: MeshLight, sp) -> LightSample:
    raise TypeError("mesh light is not dirac")


def intersect_light(light: MeshLight, rays) -> LightHit:
    """Brute-force Möller-Trumbore over the light's triangles."""
    nrays = rays.d.shape[0]
    best_t = jnp.full(nrays, 3.0e38)
    best_cos = jnp.zeros(nrays)
    hit_any = jnp.zeros(nrays, bool)
    T = light.va.shape[0]
    for i in range(T):
        a = light.va[i]
        e1 = light.vb[i] - a
        e2 = light.vc[i] - a
        pvec = cross(rays.d, e2[None])
        det = jnp.sum(e1[None] * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(
            det == 0, 1.0, det), 0.0)
        tvec = rays.o - a[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = cross(tvec, e1[None])
        v = jnp.sum(rays.d * qvec, axis=-1) * inv_det
        t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
        ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (u <= 1) & (v >= 0) \
            & (u + v <= 1) & (t > 1e-5) & (t < best_t)
        cosa = -dot(rays.d, light.normals[i][None])
        if light.double_sided:
            cosa = jnp.abs(cosa)
        else:
            ok = ok & (cosa > 0.0)
        best_t = jnp.where(ok, t, best_t)
        best_cos = jnp.where(ok, cosa, best_cos)
        hit_any = hit_any | ok
    ipdf = jnp.where(hit_any,
                     light.area * best_cos / jnp.maximum(
                         best_t * best_t, 1e-12) / np.pi, 0.0)
    return LightHit(valid=hit_any, t=jnp.where(hit_any, best_t, -1.0),
                    col=jnp.broadcast_to(light.color, rays.d.shape),
                    ipdf=ipdf)


def illum_pdf(light: MeshLight, sp, p_light):
    wi = sp.p - p_light  # from light surface toward shaded point
    r2 = jnp.sum(wi * wi, axis=-1)
    return r2 * np.pi / jnp.maximum(light.area, 1e-12)
