"""Volume integrators: emission-only and single-scattering ray marching.

Reference: src/integrators/EmissionIntegrator.cc (emission + tau
transmittance) and src/integrators/SingleScatterIntegrator.cc (fixed-step
march, per-step light sampling with geometric shadow + volumetric
attenuation, Schlick phase).  The reference's adaptive stepping and
per-light attenuation-grid cache ("optimize" mode) map to a static step
count here (TPU static shapes).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu.mathutils import SHADOW_BIAS
from core_tpu.volumes import regions as vr
from core_tpu.lights import base as light_base


@dataclass(frozen=True)
class VolumeOptions:
    integrator: str = "none"      # none | emission | singlescatter
    steps: int = 16               # march steps per volume
    step_size: float = 1.0        # reference stepSize (world units); the
    #                               builder converts it to `steps` from the
    #                               volume bounds (static TPU march count)


# march resolution for volumetric attenuation of surface-NEE shadow rays
# (the reference runs the full volume integrator per light sample,
# mcintegrator.cc:96,131,181; a shorter fixed march bounds the cost of the
# batched NEE wavefront)
NEE_VOL_STEPS = 8


def transmittance_nee_s(scene, o3, wi3, dist, steps: int = NEE_VOL_STEPS):
    """Volumetric attenuation along surface-NEE shadow rays, SoA inputs.

    o3/wi3: V3 [N] origin/direction; dist: [N] light distance (<= 0 means
    unbounded — bg/sun sentinel).  Returns [N,3] transmittance.
    Reference: doLightEstimation multiplies every light sample by
    scene->volIntegrator->transmittance (mcintegrator.cc:96,131,181).
    """
    from core_tpu import vec
    o = vec.aos(o3)
    d = vec.aos(wi3)
    n = dist.shape[0]
    tmax = jnp.where(dist > 0, dist, 3.0e38)
    rays = Rays(o=o, d=d, tmin=jnp.full(n, SHADOW_BIAS), tmax=tmax)
    return transmittance(scene, rays, steps=steps)


def transmittance(scene, rays: Rays, steps: int = 16) -> jnp.ndarray:
    """exp(-sum tau) over all scene volumes -> [N,3]."""
    if not scene.volumes:
        return jnp.ones(rays.o.shape, jnp.float32)
    acc = jnp.zeros(rays.o.shape, jnp.float32)
    for vol in scene.volumes:
        acc = acc + vr.tau(vol, rays, n_steps=steps)
    return jnp.exp(-acc)


def integrate(scene, rays: Rays, hits_t, pixel_sample, sampling_offs,
              opts: VolumeOptions) -> jnp.ndarray:
    """In-scattered (+emitted) radiance along camera rays -> [N,3].

    hits_t: [N] surface-hit distance (<0 => miss/unbounded) caps the march.
    """
    if not scene.volumes or opts.integrator == "none":
        return jnp.zeros(rays.o.shape, jnp.float32)
    capped = Rays(o=rays.o, d=rays.d, tmin=rays.tmin,
                  tmax=jnp.where(hits_t > 0, hits_t, rays.tmax))
    col = jnp.zeros(rays.o.shape, jnp.float32)
    for vol in scene.volumes:
        hit, t0, t1 = vr.cross_bb(vol, capped)
        dt = (t1 - t0) / opts.steps
        trans = jnp.ones(rays.o.shape, jnp.float32)
        vcol = jnp.zeros(rays.o.shape, jnp.float32)
        for i in range(opts.steps):
            t = t0 + (i + 0.5) * dt
            p = rays.o + rays.d * t[..., None]
            st = vr.sigma_t(vol, p)
            step_tr = jnp.exp(-st * dt[..., None])
            vcol = vcol + trans * vr.emission(vol, p) * dt[..., None]
            if opts.integrator == "singlescatter":
                ss = vr.sigma_s(vol, p)
                fake_sp = _point_sp(p)
                for light in scene.lights:
                    if light_base.dirac(light):
                        ls = light_base.illuminate(light, fake_sp)
                    else:
                        # one deterministic sample per step (the reference
                        # uses per-light sample loops; 1 is its default)
                        s1 = jnp.full(p.shape[:-1], 0.5, jnp.float32)
                        ls = light_base.illum_sample(light, fake_sp, s1, s1)
                    from core_tpu import scene as scene_mod
                    sray = Rays(o=p, d=ls.wi,
                                tmin=jnp.full(p.shape[:-1], SHADOW_BIAS),
                                tmax=ls.dist - SHADOW_BIAS)
                    shadowed = scene_mod.any_hit(scene, sray)
                    ltr = transmittance(scene, sray, steps=max(4, opts.steps // 4))
                    ph = vr.phase_hg(vol, -ls.wi, -rays.d)
                    contrib = ss * ls.col * ltr \
                        * (ph / jnp.maximum(ls.pdf, 1e-12))[..., None]
                    ok = ls.valid & (~shadowed) & hit
                    vcol = vcol + jnp.where(ok[..., None],
                                            trans * contrib * dt[..., None],
                                            0.0)
            trans = trans * step_tr
        col = col + jnp.where(hit[..., None], vcol, 0.0)
    return col


def _point_sp(p):
    """Minimal surface-point stand-in for light sampling at a volume point."""
    from core_tpu.types import SurfacePoints
    n = p.shape[0]
    up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    z = jnp.zeros((n,), jnp.int32)
    return SurfacePoints(p=p, n=up, ng=up, nu=up, nv=up,
                         uv=jnp.zeros((n, 2)), mat=z,
                         light=jnp.full((n,), -1, jnp.int32), prim=z, obj=z)
