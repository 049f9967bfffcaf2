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


def _mesh_face_cos(mlight, p_light, d_out):
    """|cos| between d_out and the face normal of the mesh-light triangle
    containing p_light — recovered by a nearest-plane + barycentric test
    over the light's (small) triangle set.  Closes the round-3 |cos|~1
    approximation (weak #8): BDPT technique weights on mesh-light scenes
    now use the true emission cosine."""
    from core_tpu.mathutils import dot
    va, vb, vc, nrm = mlight.va, mlight.vb, mlight.vc, mlight.normals
    T = va.shape[0]
    n = p_light.shape[0]
    best = jnp.full(n, jnp.inf)
    cos = jnp.ones(n, jnp.float32)
    for t in range(T):
        e1 = vb[t] - va[t]
        e2 = vc[t] - va[t]
        rel = p_light - va[t][None]
        d00 = jnp.dot(e1, e1)
        d01 = jnp.dot(e1, e2)
        d11 = jnp.dot(e2, e2)
        d20 = rel @ e1
        d21 = rel @ e2
        den = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
        v = (d11 * d20 - d01 * d21) / den
        w = (d00 * d21 - d01 * d20) / den
        inside = (v >= -1e-4) & (w >= -1e-4) & (v + w <= 1.0 + 1e-4)
        plane_d = jnp.abs(rel @ nrm[t])
        score = jnp.where(inside, plane_d, jnp.inf)
        take = score < best
        best = jnp.where(take, score, best)
        cos = jnp.where(take, jnp.abs(dot(d_out, nrm[t][None])), cos)
    return cos


def emit_pdf(light, p_light, d_out, scene_radius=None):
    """The reference light_t::emitPdf (include/core_api/light.h): pdfs of
    generating an emission ray at p_light [N,3] in direction d_out [N,3]
    (pointing AWAY from the light).  Returns
        (area_pdf [N], dir_pdf [N], cos_wo [N], singular, dirac_dir)
    area_pdf: area-measure pdf of the position (1.0 for dirac positions);
    dir_pdf: solid-angle pdf of the direction; cos_wo: |cos| between d_out
    and the emitting surface normal (1.0 when there is no surface);
    singular: static bool, dirac position (LIGHT_SINGULAR);
    dirac_dir: static bool, dirac direction (LIGHT_DIRACDIR).
    Used by the bidirectional integrator's pdf-ratio path weighting
    (bidirpath.cc pathWeight / connectLPath emitPdf calls).
    MeshLight/portal cos uses the true face normal where recoverable from
    the sampled point; BgLight uses its luminance-CDF direction pdf.
    """
    import numpy as np
    import core_tpu.lights.area as area_m
    import core_tpu.lights.point as point_m
    import core_tpu.lights.spot as spot_m
    import core_tpu.lights.sun as sun_m
    import core_tpu.lights.sphere as sphere_m
    import core_tpu.lights.mesh as mesh_m
    import core_tpu.lights.bg as bg_m
    import core_tpu.lights.ies as ies_m
    import core_tpu.lights.portal as portal_m
    from core_tpu.mathutils import dot

    n = p_light.shape[0]
    ones = jnp.ones(n, jnp.float32)
    inv_pi = 1.0 / np.pi

    if isinstance(light, area_m.AreaLight):
        nrm = jnp.broadcast_to(-light.fnormal, (n, 3))
        cos = jnp.abs(dot(d_out, nrm))
        return (jnp.broadcast_to(1.0 / light.area, (n,)),
                cos * inv_pi, cos, False, False)
    if isinstance(light, mesh_m.MeshLight):
        cos = _mesh_face_cos(light, p_light, d_out)
        return (jnp.broadcast_to(1.0 / light.area, (n,)),
                cos * inv_pi, cos, False, False)
    if isinstance(light, portal_m.BgPortalLight):
        cos = _mesh_face_cos(light.mesh, p_light, d_out)
        return (jnp.broadcast_to(1.0 / light.mesh.area, (n,)),
                cos * inv_pi, cos, False, False)
    if isinstance(light, sphere_m.SphereLight):
        nrm = (p_light - light.center[None]) / jnp.maximum(light.radius,
                                                           1e-9)
        cos = jnp.abs(dot(d_out, nrm))
        area = 4.0 * np.pi * light.radius * light.radius
        return (jnp.broadcast_to(1.0 / area, (n,)), cos * inv_pi, cos,
                False, False)
    if isinstance(light, point_m.PointLight):
        return ones, ones / (4.0 * np.pi), ones, True, False
    if isinstance(light, ies_m.IesLight):
        return ones, ones / (4.0 * np.pi), ones, True, False
    if isinstance(light, spot_m.SpotLight):
        dir_pdf = ones / jnp.maximum(
            2.0 * np.pi * (1.0 - light.cos_end), 1e-9)
        return ones, dir_pdf, ones, True, False
    if isinstance(light, sun_m.SunLight):
        r = 1.0 if scene_radius is None else scene_radius
        area_pdf = ones / (np.pi * r * r)
        return area_pdf, jnp.broadcast_to(light.pdf, (n,)), ones, \
            True, False
    if isinstance(light, sun_m.DirectionalLight):
        r = 1.0 if scene_radius is None else scene_radius
        return ones / (np.pi * r * r), ones, ones, True, True
    if isinstance(light, bg_m.BgLight):
        r = 1.0 if scene_radius is None else scene_radius
        from core_tpu.types import Rays
        lh = bg_m.intersect_light(
            light, Rays(o=p_light, d=-d_out, tmin=jnp.zeros(n),
                        tmax=jnp.full(n, -1.0)))
        dir_pdf = 1.0 / jnp.maximum(lh.ipdf, 1e-9)
        return ones / (np.pi * r * r), dir_pdf, ones, True, False
    # unknown plugin light: neutral pdfs (weighting degrades gracefully)
    return ones, ones, ones, True, False
