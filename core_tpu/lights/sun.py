"""Directional + sun lights (reference src/lights/directional.cc,
src/lights/sunlight.cc).

directional: dirac parallel light; optional radius-bounded cylinder
(directional.cc:59-78).  sun: angular-disc directional, sampled as a
uniform cone with pdf = 1/(2pi(1-cosAngle)); intersectable for MIS
(sunlight.cc:34-76).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, cross, length, create_cs
from core_tpu.lights.base import LightSample, LightHit
from core_tpu.sampling.utils import sample_cone


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DirectionalLight:
    direction: jnp.ndarray  # [3] direction the light travels FROM (wi = this)
    color: jnp.ndarray      # [3] color * power
    pos: jnp.ndarray        # [3] cylinder anchor (non-infinite only)
    radius: jnp.ndarray     # [] cylinder radius
    infinite: bool = field(metadata=dict(static=True), default=True)
    samples: int = field(metadata=dict(static=True), default=1)


def make_directional_light(direction, color, power, infinite=True,
                           pos=(0, 0, 0), radius=1.0) -> DirectionalLight:
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-20)
    return DirectionalLight(
        direction=jnp.asarray(d, jnp.float32),
        color=jnp.asarray(np.asarray(color, np.float32) * power),
        pos=jnp.asarray(pos, jnp.float32),
        radius=jnp.asarray(radius, jnp.float32), infinite=bool(infinite))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SunLight:
    direction: jnp.ndarray  # [3] toward the sun, unit
    col_pdf: jnp.ndarray    # [3] color * power * pdf
    cos_angle: jnp.ndarray  # []
    pdf: jnp.ndarray        # [] 1 / (2pi (1-cosAngle))
    du: jnp.ndarray         # [3]
    dv: jnp.ndarray         # [3]
    samples: int = field(metadata=dict(static=True), default=4)


def make_sun_light(direction, color, power, angle=0.27, samples=4) -> SunLight:
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-20)
    angle = min(float(angle), 80.0)
    cos_angle = np.cos(np.radians(angle))
    invpdf = 2.0 * np.pi * (1.0 - cos_angle)
    pdf = 1.0 / max(invpdf, 1e-12)
    # host-side createCS
    if abs(d[0]) < 1e-6 and abs(d[1]) < 1e-6:
        du = np.array([1.0 if d[2] >= 0 else -1.0, 0.0, 0.0])
    else:
        il = 1.0 / np.sqrt(d[0] * d[0] + d[1] * d[1])
        du = np.array([d[1] * il, -d[0] * il, 0.0])
    dv = np.cross(d, du)
    return SunLight(
        direction=jnp.asarray(d, jnp.float32),
        col_pdf=jnp.asarray(np.asarray(color, np.float32) * power * pdf),
        cos_angle=jnp.asarray(cos_angle, jnp.float32),
        pdf=jnp.asarray(pdf, jnp.float32),
        du=jnp.asarray(du, jnp.float32), dv=jnp.asarray(dv, jnp.float32),
        samples=int(samples))


# ---- directional (dirac) ----

class _DirectionalOps:
    DIRAC = True

    @staticmethod
    def can_intersect(light):
        return False

    @staticmethod
    def get_n_samples(light):
        return 1

    @staticmethod
    def illuminate(light: DirectionalLight, sp) -> LightSample:
        n = sp.p.shape[0]
        wi = jnp.broadcast_to(light.direction, sp.p.shape)
        col = jnp.broadcast_to(light.color, sp.p.shape)
        if light.infinite:
            valid = jnp.ones(n, bool)
            dist = jnp.full(n, -1.0)   # unbounded shadow ray
        else:
            vec = light.pos[None] - sp.p
            perp = length(cross(jnp.broadcast_to(light.direction, sp.p.shape),
                                vec))
            along = dot(vec, light.direction[None])
            valid = (perp <= light.radius) & (along > 0.0)
            dist = along
        return LightSample(valid=valid, wi=wi, dist=dist, col=col,
                           pdf=jnp.ones(n, jnp.float32))

    @staticmethod
    def illum_sample(light, sp, s1, s2):
        return _DirectionalOps.illuminate(light, sp)

    @staticmethod
    def intersect_light(light, rays) -> LightHit:
        n = rays.d.shape[0]
        z = jnp.zeros(n, jnp.float32)
        return LightHit(valid=jnp.zeros(n, bool), t=z - 1.0,
                        col=jnp.zeros((n, 3), jnp.float32), ipdf=z)

    @staticmethod
    def illum_pdf(light, sp, p_light):
        return jnp.zeros(sp.p.shape[0], jnp.float32)


# ---- sun (cone-sampled, intersectable) ----

class _SunOps:
    DIRAC = False

    @staticmethod
    def can_intersect(light):
        return True

    @staticmethod
    def get_n_samples(light: SunLight):
        return light.samples

    @staticmethod
    def illum_sample(light: SunLight, sp, s1, s2) -> LightSample:
        n = sp.p.shape[0]
        d = jnp.broadcast_to(light.direction, sp.p.shape)
        du = jnp.broadcast_to(light.du, sp.p.shape)
        dv = jnp.broadcast_to(light.dv, sp.p.shape)
        wi = sample_cone(d, du, dv, light.cos_angle, s1, s2)
        return LightSample(valid=jnp.ones(n, bool), wi=wi,
                           dist=jnp.full(n, -1.0),
                           col=jnp.broadcast_to(light.col_pdf, sp.p.shape),
                           pdf=jnp.broadcast_to(light.pdf, (n,)))

    @staticmethod
    def illuminate(light, sp):
        raise TypeError("sun light is not dirac")

    @staticmethod
    def intersect_light(light: SunLight, rays) -> LightHit:
        cosine = dot(rays.d, light.direction[None])
        valid = cosine >= light.cos_angle
        n = rays.d.shape[0]
        return LightHit(valid=valid, t=jnp.full(n, -1.0),
                        col=jnp.broadcast_to(light.col_pdf, rays.d.shape),
                        ipdf=jnp.where(valid, 1.0 / light.pdf, 0.0))

    @staticmethod
    def illum_pdf(light: SunLight, sp, p_light):
        return jnp.broadcast_to(light.pdf, (sp.p.shape[0],))
