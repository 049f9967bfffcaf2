"""Background portal light.

Reference: src/lights/bgportallight.cc (327 LoC) — a mesh whose surface is
sampled like an area light but whose radiance is the scene background
evaluated in the sampled direction: portals concentrate environment-light
sampling through openings (windows/doors) instead of wasting samples on
occluded sky.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot
from core_tpu.lights.base import LightSample, LightHit
from core_tpu.lights import mesh as mesh_mod
from core_tpu.lights.mesh import MeshLight

DIRAC = False


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BgPortalLight:
    """Wraps a MeshLight for the geometry/CDF; color comes from the
    background (bound at scene compile, bgportallight.cc init)."""
    mesh: MeshLight
    background: object = None
    power: jnp.ndarray = None
    samples: int = field(metadata=dict(static=True), default=4)


def make_bg_portal_light(verts, tri_vidx, background, power=1.0, samples=4,
                         obj_id=-1) -> BgPortalLight:
    m = mesh_mod.make_mesh_light(verts, tri_vidx, color=(1.0, 1.0, 1.0),
                                 power=1.0, samples=samples, obj_id=obj_id,
                                 double_sided=True)
    return BgPortalLight(mesh=m, background=background,
                         power=jnp.asarray(power, jnp.float32),
                         samples=samples)


def can_intersect(light: BgPortalLight) -> bool:
    return True


def get_n_samples(light: BgPortalLight) -> int:
    return light.samples


def _bg_col(light, d):
    from core_tpu.backgrounds import eval_background
    if light.background is None:
        return jnp.ones_like(d)
    return eval_background(light.background, d) * light.power


def illum_sample(light: BgPortalLight, sp, s1, s2) -> LightSample:
    ls = mesh_mod.illum_sample(light.mesh, sp, s1, s2)
    return ls._replace(col=_bg_col(light, ls.wi))


def illuminate(light: BgPortalLight, sp) -> LightSample:
    raise TypeError("portal light is not a dirac light")


def intersect_light(light: BgPortalLight, rays) -> LightHit:
    lh = mesh_mod.intersect_light(light.mesh, rays)
    return lh._replace(col=_bg_col(light, rays.d))


def illum_pdf(light: BgPortalLight, sp, p_light):
    return mesh_mod.illum_pdf(light.mesh, sp, p_light)
