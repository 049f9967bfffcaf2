"""Photon emission from lights (the light-side light_t::emitPhoton API).

Reference conventions per light (cited per function): returns
(origin [N,3], direction [N,3], color [N,3], ipdf [N]); photon power is
color * ipdf scaled by light-pick pdf and photon count by the caller
(mcintegrator.cc createCausticMap :197-383).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from core_tpu.mathutils import create_cs
from core_tpu.sampling.utils import (sample_cos_hemisphere, sample_sphere,
                                     sample_cone, shirley_disk, min_rot)
from core_tpu.lights.area import AreaLight
from core_tpu.lights.point import PointLight
from core_tpu.lights.spot import SpotLight
from core_tpu.lights.sun import SunLight, DirectionalLight
from core_tpu.lights.sphere import SphereLight
from core_tpu.lights.mesh import MeshLight, _sample_surface
from core_tpu.lights.bg import BgLight, _sample_uv, _inv_spheremap


def emit_photon(light, s1, s2, s3, s4, scene_center=None, scene_radius=None):
    """Dispatch per light type; world bound needed by sun/dir/bg lights."""
    n = s1.shape[0]
    if isinstance(light, AreaLight):
        # arealight.cc emitPhoton: point by (s3,s4), cosine dir around the
        # EMISSION normal = -fnormal (arealight.cc:37-42: fnormal is the
        # "flipped" receiver-side normal, normal = -fnormal), ipdf = area
        o = light.corner[None] + s3[..., None] * light.to_x[None] \
            + s4[..., None] * light.to_y[None]
        emit_n = jnp.broadcast_to(-light.fnormal, (n, 3))
        du, dv = create_cs(emit_n)
        d = sample_cos_hemisphere(emit_n, du, dv, s1, s2)
        return o, d, jnp.broadcast_to(light.color, (n, 3)), \
            jnp.broadcast_to(light.area, (n,))
    if isinstance(light, PointLight):
        o = jnp.broadcast_to(light.pos, (n, 3))
        d = sample_sphere(s1, s2)
        return o, d, jnp.broadcast_to(light.color, (n, 3)), \
            jnp.full((n,), 4.0 * np.pi)
    if isinstance(light, SpotLight):
        # simplified vs spotlight.cc emitPhoton: uniform cone over the full
        # angle, falloff weight applied to the returned color
        o = jnp.broadcast_to(light.pos, (n, 3))
        dirn = -light.ndir
        du, dv = create_cs(jnp.broadcast_to(dirn, (n, 3)))
        d = sample_cone(jnp.broadcast_to(dirn, (n, 3)), du, dv,
                        light.cos_end, s1, s2)
        cosa = jnp.sum(d * dirn[None], axis=-1)
        icos_diff = 1.0 / jnp.maximum(light.cos_start - light.cos_end, 1e-9)
        v = jnp.clip((cosa - light.cos_end) * icos_diff, 0.0, 1.0)
        fall = jnp.where(cosa >= light.cos_start, 1.0,
                         v * v * (3.0 - 2.0 * v))
        ipdf = 2.0 * np.pi * (1.0 - light.cos_end)
        return o, d, light.color[None] * fall[..., None], \
            jnp.broadcast_to(ipdf, (n,))
    if isinstance(light, SunLight):
        # sunlight.cc emitPhoton: disk at world boundary, direction -ldir
        ldir = sample_cone(jnp.broadcast_to(light.direction, (n, 3)),
                           jnp.broadcast_to(light.du, (n, 3)),
                           jnp.broadcast_to(light.dv, (n, 3)),
                           light.cos_angle, s3, s4)
        u, v = shirley_disk(s1, s2)
        du2, dv2 = min_rot(jnp.broadcast_to(light.direction, (n, 3)),
                           jnp.broadcast_to(light.du, (n, 3)), ldir)
        o = scene_center[None] + scene_radius * (
            u[..., None] * du2 + v[..., None] * dv2 + ldir)
        e_pdf = np.pi * float(scene_radius) ** 2
        return o, -ldir, light.col_pdf[None] * e_pdf, \
            jnp.broadcast_to(1.0 / light.pdf, (n,))
    if isinstance(light, DirectionalLight):
        # directional.cc emitPhoton: disk of worldRadius
        dirn = jnp.broadcast_to(light.direction, (n, 3))
        du, dv = create_cs(dirn)
        u, v = shirley_disk(s1, s2)
        r = scene_radius
        o = scene_center[None] + r * (u[..., None] * du + v[..., None] * dv) \
            + dirn * r
        return o, -dirn, jnp.broadcast_to(light.color, (n, 3)), \
            jnp.full((n,), np.pi * float(scene_radius) ** 2)
    if isinstance(light, SphereLight):
        # spherelight.cc emitPhoton: surface point + cosine hemisphere
        sdir = sample_sphere(s3, s4)
        o = light.center[None] + light.radius * sdir
        du, dv = create_cs(sdir)
        d = sample_cos_hemisphere(sdir, du, dv, s1, s2)
        area = 4.0 * np.pi * light.radius * light.radius
        return o, d, jnp.broadcast_to(light.color, (n, 3)), \
            jnp.broadcast_to(area, (n,))
    if isinstance(light, MeshLight):
        p, nrm = _sample_surface(light, s3, s4)
        du, dv = create_cs(nrm)
        d = sample_cos_hemisphere(nrm, du, dv, s1, s2)
        return p, d, jnp.broadcast_to(light.color, (n, 3)), \
            jnp.broadcast_to(light.area, (n,))
    if isinstance(light, BgLight):
        # bglight.cc emitPhoton: sample env direction, shoot inward from
        # the world-bound disk
        from core_tpu.backgrounds import eval_background
        u, v, pu, pv = _sample_uv(light, s1, s2)
        d_out = _inv_spheremap(u, v)
        col = eval_background(light.background, d_out)
        sin_t = jnp.maximum(jnp.sin(np.pi * v), 1e-9)
        ipdf = 2.0 * np.pi * np.pi * sin_t / jnp.maximum(pu * pv, 1e-6)
        du, dv = create_cs(-d_out)
        ux, vy = shirley_disk(s3, s4)
        o = scene_center[None] + scene_radius * (
            ux[..., None] * du + vy[..., None] * dv + d_out)
        e_pdf = np.pi * scene_radius ** 2
        return o, -d_out, col * e_pdf, ipdf
    from core_tpu.lights.ies import IesLight, _intensity
    from core_tpu.lights.portal import BgPortalLight
    if isinstance(light, IesLight):
        # iesLight.cc emitPhoton: directions over the sphere weighted by
        # the candela profile
        o = jnp.broadcast_to(light.pos, (n, 3))
        d = sample_sphere(s1, s2)
        inten = _intensity(light, -d)
        return o, d, light.color[None] * inten[..., None], \
            jnp.full((n,), 4.0 * np.pi)
    if isinstance(light, BgPortalLight):
        # bgportallight.cc emitPhoton: portal surface point, cosine dir,
        # background radiance in the emitted direction
        p, nrm = _sample_surface(light.mesh, s3, s4)
        du, dv = create_cs(nrm)
        d = sample_cos_hemisphere(nrm, du, dv, s1, s2)
        from core_tpu.backgrounds import eval_background
        col = eval_background(light.background, d) * light.power \
            if light.background is not None else jnp.ones_like(d)
        return p, d, col, jnp.broadcast_to(light.mesh.area, (n,))
    raise TypeError(f"emit_photon: unsupported light {type(light)}")
