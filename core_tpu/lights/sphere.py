"""Sphere light with solid-angle cone sampling (reference
src/lights/spherelight.cc): sample a uniform cone subtending the sphere,
pdf = 1/(2pi(1-cosAlpha)) ... reference stores 1/(2(1-cosAlpha)) with the
2pi folded into its conventions (spherelight.cc:101-110)."""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, create_cs
from core_tpu.lights.base import LightSample, LightHit
from core_tpu.sampling.utils import sample_cone

DIRAC = False


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SphereLight:
    center: jnp.ndarray   # [3]
    radius: jnp.ndarray   # []
    color: jnp.ndarray    # [3] color * power
    samples: int = field(metadata=dict(static=True), default=4)


def make_sphere_light(center, radius, color, power, samples=4) -> SphereLight:
    return SphereLight(center=jnp.asarray(center, jnp.float32),
                       radius=jnp.asarray(radius, jnp.float32),
                       color=jnp.asarray(np.asarray(color, np.float32) * power),
                       samples=int(samples))


def can_intersect(light: SphereLight) -> bool:
    # reference: only when bound to scene geometry; cone sampling handles MIS
    return False


def get_n_samples(light: SphereLight) -> int:
    return light.samples


def _sphere_intersect(o, d, c, r2):
    """Returns (hit, d1) nearest intersection distance (spherelight.cc:66)."""
    vf = o - c[None]
    ea = jnp.sum(d * d, axis=-1)
    eb = 2.0 * jnp.sum(vf * d, axis=-1)
    ec = jnp.sum(vf * vf, axis=-1) - r2
    osc = eb * eb - 4.0 * ea * ec
    hit = osc >= 0.0
    sq = jnp.sqrt(jnp.maximum(osc, 0.0))
    d1 = (-eb - sq) / (2.0 * ea)
    return hit, d1


def illum_sample(light: SphereLight, sp, s1, s2) -> LightSample:
    cdir = light.center[None] - sp.p
    dist2 = jnp.sum(cdir * cdir, axis=-1)
    r2 = light.radius * light.radius
    outside = dist2 > r2
    dist = jnp.sqrt(dist2)
    cdir_n = cdir / jnp.maximum(dist[..., None], 1e-12)
    cos_alpha = jnp.sqrt(jnp.maximum(1.0 - r2 / jnp.maximum(dist2, 1e-12),
                                     1e-12))
    du, dv = create_cs(cdir_n)
    wi = sample_cone(cdir_n, du, dv, cos_alpha, s1, s2)
    hit, d1 = _sphere_intersect(sp.p, wi, light.center, r2 * 1.000003815)
    pdf = 1.0 / (2.0 * jnp.maximum(1.0 - cos_alpha, 1e-9))
    valid = outside & hit & (d1 > 0.0)
    return LightSample(valid=valid, wi=wi, dist=jnp.where(hit, d1, 1.0),
                       col=jnp.broadcast_to(light.color, sp.p.shape), pdf=pdf)


def illuminate(light: SphereLight, sp) -> LightSample:
    raise TypeError("sphere light is not dirac")


def intersect_light(light: SphereLight, rays) -> LightHit:
    r2 = light.radius * light.radius
    hit, d1 = _sphere_intersect(rays.o, rays.d, light.center, r2)
    cdir = light.center[None] - rays.o
    dist2 = jnp.sum(cdir * cdir, axis=-1)
    outside = dist2 > r2
    cos_alpha = jnp.sqrt(jnp.maximum(1.0 - r2 / jnp.maximum(dist2, 1e-12),
                                     1e-12))
    valid = hit & outside
    ipdf = jnp.where(valid, 2.0 * (1.0 - cos_alpha), 0.0)
    return LightHit(valid=valid, t=jnp.where(valid, d1, -1.0),
                    col=jnp.broadcast_to(light.color, rays.d.shape), ipdf=ipdf)


def illum_pdf(light: SphereLight, sp, p_light):
    cdir = light.center[None] - sp.p
    dist2 = jnp.sum(cdir * cdir, axis=-1)
    r2 = light.radius * light.radius
    cos_alpha = jnp.sqrt(jnp.maximum(1.0 - r2 / jnp.maximum(dist2, 1e-12),
                                     1e-12))
    return jnp.where(dist2 > r2,
                     1.0 / (2.0 * jnp.maximum(1.0 - cos_alpha, 1e-9)), 0.0)
