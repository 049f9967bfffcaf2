"""Isotropic point light (reference src/lights/pointlight.cc)."""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.lights.base import LightSample, LightHit

DIRAC = True


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PointLight:
    pos: jnp.ndarray     # [3]
    color: jnp.ndarray   # [3] color * power
    samples: int = field(metadata=dict(static=True), default=1)


def make_point_light(pos, color, power) -> PointLight:
    return PointLight(pos=jnp.asarray(pos, jnp.float32),
                      color=jnp.asarray(np.asarray(color, np.float32) * power))


def can_intersect(light: PointLight) -> bool:
    return False


def get_n_samples(light: PointLight) -> int:
    return 1


def illuminate(light: PointLight, sp) -> LightSample:
    """pointLight_t::illuminate: col / dist^2 falloff."""
    ldir = light.pos[None] - sp.p
    dist2 = jnp.sum(ldir * ldir, axis=-1)
    dist = jnp.sqrt(dist2)
    wi = ldir / jnp.maximum(dist[..., None], 1e-12)
    col = light.color[None] / jnp.maximum(dist2, 1e-12)[..., None]
    return LightSample(valid=dist > 0, wi=wi, dist=dist, col=col,
                       pdf=jnp.ones_like(dist))


def illum_sample(light: PointLight, sp, s1, s2) -> LightSample:
    return illuminate(light, sp)


def intersect_light(light: PointLight, rays) -> LightHit:
    n = rays.d.shape[0]
    z = jnp.zeros(n, jnp.float32)
    return LightHit(valid=jnp.zeros(n, bool), t=z - 1.0,
                    col=jnp.zeros((n, 3), jnp.float32), ipdf=z)


def illum_pdf(light: PointLight, sp, p_light):
    return jnp.zeros(sp.p.shape[0], jnp.float32)
