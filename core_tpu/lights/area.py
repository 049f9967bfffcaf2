"""Parallelogram area light (reference src/lights/arealight.cc).

Conventions copied from the reference so MIS weights and radiance match:
- stored color = user color * power * pi               (arealight.cc:37)
- illumSample pdf = dist^2 * pi / (area * cos_angle)   (arealight.cc:86)
- intersect ipdf  = area * cos_angle / (t^2 * pi)      (arealight.cc:151)
- single-sided: emits only on the fnormal = toY x toX side.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, normalize, cross
from core_tpu.lights.base import LightSample, LightHit

DIRAC = False


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AreaLight:
    corner: jnp.ndarray      # [3]
    to_x: jnp.ndarray        # [3]
    to_y: jnp.ndarray        # [3]
    color: jnp.ndarray       # [3] radiance * pi
    area: jnp.ndarray        # [] scalar
    fnormal: jnp.ndarray     # [3] emission-side normal
    samples: int = field(metadata=dict(static=True), default=4)
    obj_id: int = field(metadata=dict(static=True), default=-1)


def make_area_light(corner, point1, point2, color, power, samples=4,
                    obj_id=-1) -> AreaLight:
    corner = np.asarray(corner, np.float32)
    to_x = np.asarray(point1, np.float32) - corner
    to_y = np.asarray(point2, np.float32) - corner
    fnormal = np.cross(to_y, to_x)
    area = float(np.linalg.norm(fnormal))
    fnormal = fnormal / max(area, 1e-20)
    col = np.asarray(color, np.float32) * power * np.pi
    return AreaLight(corner=jnp.asarray(corner), to_x=jnp.asarray(to_x),
                     to_y=jnp.asarray(to_y), color=jnp.asarray(col),
                     area=jnp.asarray(area, jnp.float32),
                     fnormal=jnp.asarray(fnormal, jnp.float32),
                     samples=int(samples), obj_id=int(obj_id))


def can_intersect(light: AreaLight) -> bool:
    return True


def get_n_samples(light: AreaLight) -> int:
    return light.samples


def illum_sample(light: AreaLight, sp, s1, s2) -> LightSample:
    p = light.corner[None] + s1[..., None] * light.to_x[None] \
        + s2[..., None] * light.to_y[None]
    ldir = p - sp.p
    dist2 = jnp.sum(ldir * ldir, axis=-1)
    # double-where: shading points ON the quad (emitter self-lighting,
    # masked by valid below) would otherwise send sqrt'(0)=inf into the
    # light-geometry gradients (corner/to_x/to_y are differentiable
    # leaves, diff.py)
    ok = dist2 > 1e-12
    safe2 = jnp.where(ok, dist2, 1.0)
    dist = jnp.where(ok, jnp.sqrt(safe2), 0.0)
    wi = ldir * jnp.where(ok, 1.0 / jnp.sqrt(safe2), 0.0)[..., None]
    cos_angle = dot(wi, light.fnormal[None])
    valid = ok & (cos_angle > 0.0)
    pdf = dist2 * np.pi / jnp.maximum(light.area * cos_angle, 1e-12)
    col = jnp.broadcast_to(light.color, wi.shape)
    return LightSample(valid=valid, wi=wi, dist=dist, col=col, pdf=pdf)


def illuminate(light: AreaLight, sp) -> LightSample:
    raise TypeError("area light is not a dirac light")


def intersect_light(light: AreaLight, rays) -> LightHit:
    """Ray-parallelogram intersection for MIS BSDF samples
    (arealight.cc:139-155): two triangles (corner,c2,c3) and (corner,c3,c4)."""
    cos_angle = dot(rays.d, light.fnormal[None])
    n = light.fnormal[None]
    # double-where: near-parallel rays (|cos| ~ 0) make t ~ 1e12+ whose
    # BACKWARD second-order terms overflow to inf*0=nan in the
    # light-geometry gradients; sanitize the whole masked branch
    okp = jnp.abs(cos_angle) > 1e-9
    denom = jnp.where(okp, cos_angle, 1.0)
    t = jnp.where(okp, dot(light.corner[None] - rays.o, n) / denom, -1.0)
    p = rays.o + rays.d * t[..., None]
    rel = p - light.corner[None]
    # decompose rel into (to_x, to_y) coordinates via normal equations
    xx = jnp.sum(light.to_x * light.to_x)
    yy = jnp.sum(light.to_y * light.to_y)
    xy = jnp.sum(light.to_x * light.to_y)
    rx = dot(rel, light.to_x[None])
    ry = dot(rel, light.to_y[None])
    det = xx * yy - xy * xy
    a = (rx * yy - ry * xy) / jnp.maximum(det, 1e-20)
    b = (ry * xx - rx * xy) / jnp.maximum(det, 1e-20)
    inside = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    # see intersect_light_s: finite masked branch in both directions
    tok = t > 1e-4
    t_safe = jnp.where(tok, t, 1.0)
    valid = okp & (cos_angle > 0.0) & inside & tok
    ipdf = jnp.where(valid,
                     light.area * cos_angle / (t_safe * t_safe) / np.pi,
                     0.0)
    col = jnp.broadcast_to(light.color, rays.d.shape)
    return LightHit(valid=valid, t=jnp.where(valid, t, -1.0), col=col, ipdf=ipdf)


def illum_sample_s(light: AreaLight, sp, s1, s2):
    """SoA illum_sample (see vec.py): sp is a vec.SPS, returns LightSampleS."""
    from core_tpu.vec import V3, dot3, splat3
    from core_tpu.lights.base import LightSampleS
    c = light.corner
    tx = light.to_x
    ty = light.to_y
    p = V3(c[0] + s1 * tx[0] + s2 * ty[0],
           c[1] + s1 * tx[1] + s2 * ty[1],
           c[2] + s1 * tx[2] + s2 * ty[2])
    ldir = p - sp.p
    dist2 = dot3(ldir, ldir)
    # double-where against sqrt'(0)=inf in light-geometry gradients
    # (see illum_sample above)
    ok = dist2 > 1e-12
    safe2 = jnp.where(ok, dist2, 1.0)
    dist = jnp.where(ok, jnp.sqrt(safe2), 0.0)
    wi = ldir * jnp.where(ok, 1.0 / jnp.sqrt(safe2), 0.0)
    fn = splat3(light.fnormal)
    cos_angle = dot3(wi, fn)
    valid = ok & (cos_angle > 0.0)
    pdf = dist2 * np.pi / jnp.maximum(light.area * cos_angle, 1e-12)
    col = splat3(light.color, like=dist)
    return LightSampleS(valid=valid, wi=wi, dist=dist, col=col, pdf=pdf)


def intersect_light_s(light: AreaLight, rays):
    """SoA ray-parallelogram intersection (arealight.cc:139-155)."""
    from core_tpu.vec import V3, dot3, splat3
    from core_tpu.lights.base import LightHitS
    fn = splat3(light.fnormal)
    cos_angle = dot3(rays.d, fn)
    # double-where against near-parallel backward overflow (see
    # intersect_light above)
    okp = jnp.abs(cos_angle) > 1e-9
    denom = jnp.where(okp, cos_angle, 1.0)
    corner = splat3(light.corner)
    t = jnp.where(okp, dot3(corner - rays.o, fn) / denom, -1.0)
    p = rays.o + rays.d * t
    rel = p - corner
    txv = splat3(light.to_x)
    tyv = splat3(light.to_y)
    xx = jnp.sum(light.to_x * light.to_x)
    yy = jnp.sum(light.to_y * light.to_y)
    xy = jnp.sum(light.to_x * light.to_y)
    rx = dot3(rel, txv)
    ry = dot3(rel, tyv)
    det = xx * yy - xy * xy
    a = (rx * yy - ry * xy) / jnp.maximum(det, 1e-20)
    b = (ry * xx - rx * xy) / jnp.maximum(det, 1e-20)
    inside = (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    # t floor well above 0: emitter-surface self-hits (t ~ bias) put
    # 1/t^3 factors in the backward pass; 1e-4 is sub-micron at scene
    # scale and keeps the masked branch finite in both directions
    tok = t > 1e-4
    t_safe = jnp.where(tok, t, 1.0)
    valid = okp & (cos_angle > 0.0) & inside & tok
    ipdf = jnp.where(valid,
                     light.area * cos_angle / (t_safe * t_safe) / np.pi,
                     0.0)
    col = splat3(light.color, like=t)
    return LightHitS(valid=valid, t=jnp.where(valid, t, -1.0), col=col,
                     ipdf=ipdf)


def illum_pdf(light: AreaLight, sp, p_light):
    wi = p_light - sp.p
    r2 = jnp.sum(wi * wi, axis=-1)
    wi = wi / jnp.maximum(jnp.sqrt(r2)[..., None], 1e-12)
    cos_n = dot(wi, light.fnormal[None])
    return jnp.where(cos_n > 0,
                     r2 * np.pi / jnp.maximum(light.area * cos_n, 1e-12), 0.0)
