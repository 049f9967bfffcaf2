"""Light interface: typed pytrees + function dispatch on python type.

Reference contract: light_t (include/core_api/light.h:52-113) —
illumSample/illuminate (surface side), intersect/illumPdf (MIS),
emitPhoton/emitSample (photon shooting), diracLight/canIntersect/nSamples.

Lights are few, so the integrator unrolls a Python loop over the scene's
light list inside jit; each light type is a registered dataclass whose array
fields trace and whose metadata (sample counts, flags) stays static.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LightSample(NamedTuple):
    valid: jnp.ndarray   # [N] bool
    wi: jnp.ndarray      # [N,3] direction surface -> light
    dist: jnp.ndarray    # [N]
    col: jnp.ndarray     # [N,3] radiance (reference convention: *pi baked in)
    pdf: jnp.ndarray     # [N] (reference convention, see lights/area.py)


class LightHit(NamedTuple):
    valid: jnp.ndarray   # [N] bool
    t: jnp.ndarray       # [N]
    col: jnp.ndarray     # [N,3]
    ipdf: jnp.ndarray    # [N] inverse pdf as returned by reference intersect()


def _mod(light):
    """Resolve the module implementing a light's functions."""
    import core_tpu.lights.area as area
    import core_tpu.lights.point as point
    import core_tpu.lights.spot as spot
    import core_tpu.lights.sun as sun
    import core_tpu.lights.sphere as sphere
    import core_tpu.lights.mesh as mesh
    import core_tpu.lights.bg as bg
    import core_tpu.lights.ies as ies
    import core_tpu.lights.portal as portal
    table = (
        (area.AreaLight, area),
        (point.PointLight, point),
        (spot.SpotLight, spot),
        (sun.DirectionalLight, sun._DirectionalOps),
        (sun.SunLight, sun._SunOps),
        (sphere.SphereLight, sphere),
        (mesh.MeshLight, mesh),
        (bg.BgLight, bg),
        (ies.IesLight, ies),
        (portal.BgPortalLight, portal),
    )
    for cls, mod in table:
        if isinstance(light, cls):
            return mod
    # extension point for user light plugins (reference: dlopen plugin
    # registry, environment.cc:119-135 -> python registry)
    import core_tpu.lights.extra as extra
    return extra.module_for(light)


def dirac(light) -> bool:
    return _mod(light).DIRAC


def can_intersect(light) -> bool:
    return _mod(light).can_intersect(light)


def n_samples(light) -> int:
    return _mod(light).get_n_samples(light)


class LightSampleS(NamedTuple):
    """SoA light sample (see vec.py): wi/col are V3 of [N]."""
    valid: jnp.ndarray
    wi: "V3"
    dist: jnp.ndarray
    col: "V3"
    pdf: jnp.ndarray


class LightHitS(NamedTuple):
    valid: jnp.ndarray
    t: jnp.ndarray
    col: "V3"
    ipdf: jnp.ndarray


def illum_sample_s(light, sps, s1, s2) -> LightSampleS:
    """SoA illum_sample; falls back to the light module's AoS impl through
    a layout conversion when no native SoA version exists."""
    m = _mod(light)
    if hasattr(m, "illum_sample_s"):
        return m.illum_sample_s(light, sps, s1, s2)
    from core_tpu.vec import sp_to_aos, v3
    ls = m.illum_sample(light, sp_to_aos(sps), s1, s2)
    return LightSampleS(valid=ls.valid, wi=v3(ls.wi), dist=ls.dist,
                        col=v3(ls.col), pdf=ls.pdf)


def illuminate_s(light, sps) -> LightSampleS:
    m = _mod(light)
    if hasattr(m, "illuminate_s"):
        return m.illuminate_s(light, sps)
    from core_tpu.vec import sp_to_aos, v3
    ls = m.illuminate(light, sp_to_aos(sps))
    return LightSampleS(valid=ls.valid, wi=v3(ls.wi), dist=ls.dist,
                        col=v3(ls.col), pdf=ls.pdf)


def intersect_light_s(light, rays_s) -> LightHitS:
    m = _mod(light)
    if hasattr(m, "intersect_light_s"):
        return m.intersect_light_s(light, rays_s)
    from core_tpu.vec import rays_to_aos, v3
    lh = m.intersect_light(light, rays_to_aos(rays_s))
    return LightHitS(valid=lh.valid, t=lh.t, col=v3(lh.col), ipdf=lh.ipdf)


def illum_sample(light, sp, s1, s2) -> LightSample:
    return _mod(light).illum_sample(light, sp, s1, s2)


def illuminate(light, sp) -> LightSample:
    return _mod(light).illuminate(light, sp)


def intersect_light(light, rays) -> LightHit:
    return _mod(light).intersect_light(light, rays)


def illum_pdf(light, sp, sp_light):
    return _mod(light).illum_pdf(light, sp, sp_light)
