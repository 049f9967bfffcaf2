"""Spot light with smoothstep falloff (reference src/lights/spotlight.cc).

Hard-shadow (dirac) variant: illuminate() applies the smoothstep
  v = ((cosa - cosEnd) * icosDiff); v^2(3-2v)
between the inner cone (cosStart) and outer cone (cosEnd)
(spotlight.cc:108-127).  The reference's soft-shadow mode (fuzzy sampled
cone) maps to `samples > 1` + shadow_fuzzy.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, create_cs
from core_tpu.lights.base import LightSample, LightHit

DIRAC = True


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpotLight:
    pos: jnp.ndarray        # [3]
    ndir: jnp.ndarray       # [3] from light toward... (position - to), unit
    color: jnp.ndarray      # [3] color * power
    cos_start: jnp.ndarray  # [] inner cone cosine
    cos_end: jnp.ndarray    # [] outer cone cosine
    samples: int = field(metadata=dict(static=True), default=1)
    photon_only: bool = field(metadata=dict(static=True), default=False)


def make_spot_light(pos, to, color, power, cone_angle=45.0, falloff=0.15,
                    photon_only=False, samples=1) -> SpotLight:
    pos = np.asarray(pos, np.float64)
    ndir = pos - np.asarray(to, np.float64)
    ndir = ndir / max(np.linalg.norm(ndir), 1e-20)
    rad = np.radians(cone_angle)
    return SpotLight(
        pos=jnp.asarray(pos, jnp.float32),
        ndir=jnp.asarray(ndir, jnp.float32),
        color=jnp.asarray(np.asarray(color, np.float32) * power),
        cos_start=jnp.asarray(np.cos(rad * (1.0 - falloff)), jnp.float32),
        cos_end=jnp.asarray(np.cos(rad), jnp.float32),
        samples=int(samples), photon_only=bool(photon_only))


def can_intersect(light: SpotLight) -> bool:
    return False


def get_n_samples(light: SpotLight) -> int:
    return 1


def illuminate(light: SpotLight, sp) -> LightSample:
    ldir = light.pos[None] - sp.p
    dist2 = jnp.sum(ldir * ldir, axis=-1)
    dist = jnp.sqrt(dist2)
    wi = ldir / jnp.maximum(dist[..., None], 1e-12)
    cosa = dot(light.ndir[None], wi)
    icos_diff = 1.0 / jnp.maximum(light.cos_start - light.cos_end, 1e-9)
    v = jnp.clip((cosa - light.cos_end) * icos_diff, 0.0, 1.0)
    fall = jnp.where(cosa >= light.cos_start, 1.0, v * v * (3.0 - 2.0 * v))
    col = light.color[None] * (fall / jnp.maximum(dist2, 1e-12))[..., None]
    valid = (dist > 0.0) & (cosa >= light.cos_end)
    if light.photon_only:
        valid = valid & False
    return LightSample(valid=valid, wi=wi, dist=dist, col=col,
                       pdf=jnp.ones_like(dist))


def illum_sample(light: SpotLight, sp, s1, s2) -> LightSample:
    return illuminate(light, sp)


def intersect_light(light: SpotLight, rays) -> LightHit:
    n = rays.d.shape[0]
    z = jnp.zeros(n, jnp.float32)
    return LightHit(valid=jnp.zeros(n, bool), t=z - 1.0,
                    col=jnp.zeros((n, 3), jnp.float32), ipdf=z)


def illum_pdf(light: SpotLight, sp, p_light):
    return jnp.zeros(sp.p.shape[0], jnp.float32)
