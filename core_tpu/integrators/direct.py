"""Direct-lighting integrator, wavefront form.

Reference: src/integrators/directlight.cc:44-263 — emitted light + MIS
direct lighting (+ optional AO) at the primary hit, then recursive raytrace
of perfect specular reflect/refract chains
(mcIntegrator_t::recursiveRaytrace, mcintegrator.cc:421-628).

TPU design note: the reference follows BOTH specular branches recursively;
a static-shape wavefront cannot fork, so specular chains pick one branch
stochastically (energy-proportional) with throughput compensation — same
expectation, slightly higher variance on glass, no bias.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, MIN_RAYDIST
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials import base as base_mod
from core_tpu.materials.base import BSDF
from core_tpu.integrators import common
from core_tpu.integrators.raytrace import apply_dispersion  # noqa: F401 (re-export)
from core_tpu.backgrounds import eval_background


@dataclass(frozen=True)
class DirectOptions:
    raydepth: int = 5
    # transparent shadows (reference transpShad/shadowDepth): shadow rays
    # walk through FILTER materials accumulating their filter color
    transp_shad: bool = False
    shadow_depth: int = 5
    use_ao: bool = False
    ao_samples: int = 32
    ao_dist: float = 1.0
    ao_color: tuple = (1.0, 1.0, 1.0)
    transp_background: bool = False
    # TheBounty SSS (mcintegrator.cc useSSS / sss_maps wiring)
    use_sss: bool = False
    sss_photons: int = 8192
    sss_steps: int = 4
    sss_scale: float = 1.0


def _shade_hit(scene, types_present, rays, hits, pixel_sample, sampling_offs,
               include_lights, opts: DirectOptions, aux=None, diff=None):
    """Emission + direct lighting at given hits; returns (col, sp, p).
    diff: optional (dxd, dyd) primary-ray differential directions -> mip
    LOD for image textures (spDifferentials_t, surface.h:105-118)."""
    sp = scene_mod.surface_points(scene, rays, hits)
    lod = None
    if diff is not None:
        from core_tpu.differentials import texture_lod
        lod = texture_lod(scene, sp, rays, diff[0], diff[1])
    pick = (np.uint32(9781) * pixel_sample.astype(jnp.uint32)
            + sampling_offs)
    p = scene_mod.material_params(scene, sp, lod=lod, pick_seed=pick)
    wo = -rays.d
    active = hits.valid

    col = jnp.zeros_like(rays.d)
    emit_col = dispatch.emit(types_present, p)
    col = col + jnp.where((active & include_lights)[..., None], emit_col, 0.0)
    col = col + common.estimate_all_direct(scene, types_present, p, sp, wo,
                                           pixel_sample, sampling_offs, active,
                                           transp_shad=opts.transp_shad,
                                           shadow_depth=opts.shadow_depth)
    if opts.use_ao:
        col = col + _ambient_occlusion(scene, types_present, p, sp, wo,
                                       pixel_sample, sampling_offs, active, opts)
    if opts.use_sss and aux is not None:
        from core_tpu.integrators import sss as sss_mod
        col = col + opts.sss_scale * sss_mod.estimate_sss(aux, sp, p, wo,
                                                          active)
    return col, sp, p


def _ambient_occlusion(scene, types_present, p, sp, wo, pixel_sample,
                       sampling_offs, active, opts: DirectOptions):
    """mcIntegrator_t::sampleAmbientOcclusion (mcintegrator.cc:629-707)."""
    n = max(1, opts.ao_samples)
    offs = (np.uint32(n) * pixel_sample.astype(jnp.uint32) + sampling_offs)
    ao_col = jnp.asarray(opts.ao_color, jnp.float32)
    acc = jnp.zeros_like(wo)
    for i in range(n):
        s1 = qmc.ri_vdc(offs + np.uint32(i))
        s2 = qmc.scr_halton(2, offs + np.uint32(i))
        sres = base_mod.detach_sample(
            dispatch.sample_bsdf(types_present, p, sp, wo, s1, s2,
                                 BSDF.GLOSSY | BSDF.DIFFUSE | BSDF.REFLECT))
        ray = Rays(o=sp.p, d=sres.wi,
                   tmin=jnp.full_like(s1, MIN_RAYDIST),
                   tmax=jnp.full_like(s1, opts.ao_dist))
        shadowed = scene_mod.any_hit(scene, ray, exclude_prim=sp.prim)
        cos = jnp.abs(dot(sp.n, sres.wi))
        ok = active & (~shadowed) & (sres.pdf > 1e-6)
        acc = acc + jnp.where(ok[..., None],
                              sres.col * ao_col * (cos * sres.w)[..., None], 0.0)
    return acc / n


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: DirectOptions, aux=None, diff=None):
    """Full directlight integrate() for a camera-ray wavefront.
    Returns rgba [N,4].  aux: SSS photon map when opts.use_sss;
    diff: primary-ray differential directions (texture LOD)."""
    from core_tpu.integrators import raytrace
    n = rays.o.shape[0]
    hits = scene_mod.closest_hit(scene, rays)
    primary_valid = hits.valid

    col, sp, p = _shade_hit(scene, types_present, rays, hits, pixel_sample,
                            sampling_offs, jnp.ones(n, bool), opts, aux=aux,
                            diff=diff)
    bg = eval_background(scene.background, rays.d)
    col = jnp.where(primary_valid[..., None], col, bg)
    alpha = jnp.where(primary_valid, 1.0,
                      0.0 if opts.transp_background else 1.0)

    # specular + glossy indirect chains (mcintegrator.cc recursiveRaytrace)
    chain = scene.has_specular or raytrace.has_glossy(types_present)
    if chain and opts.raydepth > 0:
        def shade_fn(nrays, nhits, include_lights, active):
            return _shade_hit(scene, types_present, nrays, nhits,
                              pixel_sample, sampling_offs, include_lights,
                              opts, aux=aux)

        col = col + raytrace.recursive_raytrace(
            scene, types_present, rays, hits, sp, p, shade_fn,
            pixel_sample, sampling_offs, opts.raydepth)

    return jnp.concatenate([col, alpha[..., None]], axis=-1)
