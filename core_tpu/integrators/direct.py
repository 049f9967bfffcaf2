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

from core_tpu.mathutils import dot, luminance, MIN_RAYDIST
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.sampling.utils import sample_cos_hemisphere
from core_tpu.materials import dispatch
from core_tpu.materials import base as base_mod
from core_tpu.materials.base import BSDF, gather_params
from core_tpu.integrators import common
from core_tpu.backgrounds import eval_background


@dataclass(frozen=True)
class DirectOptions:
    raydepth: int = 5
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
               include_lights, opts: DirectOptions, aux=None):
    """Emission + direct lighting at given hits; returns (col, sp, p)."""
    sp = scene_mod.surface_points(scene, rays, hits)
    p = scene_mod.material_params(scene, sp)
    wo = -rays.d
    active = hits.valid

    col = jnp.zeros_like(rays.d)
    emit_col = dispatch.emit(types_present, p)
    col = col + jnp.where((active & include_lights)[..., None], emit_col, 0.0)
    col = col + common.estimate_all_direct(scene, types_present, p, sp, wo,
                                           pixel_sample, sampling_offs, active)
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


def apply_dispersion(cur_p, chromatic, wl, throughput):
    """Spectral dispersion on specular chains (mcintegrator.cc:421-628
    dispersive branch): when a path first enters a DISPERSIVE material, it
    turns monochromatic — one wavelength wl sampled per camera sample, the
    throughput weighted by wl2rgb, and the IOR replaced by Cauchy n(wl).
    The reference splits the trajectory over several wavelengths; one
    stochastic wavelength per sample has the same expectation (documented
    deviation, more color noise at equal sample counts)."""
    from core_tpu.sampling import spectrum
    # gate on dispersion_power like the reference glass ctor (glass.cc)
    disp = cur_p.dispersion > 0.0
    newly = disp & (~chromatic)
    a, b = spectrum.cauchy_coefficients(cur_p.ior, cur_p.dispersion)
    ior_wl = spectrum.cauchy_ior(wl, a, b)
    p2 = cur_p._replace(ior=jnp.where(disp, ior_wl, cur_p.ior))
    w = spectrum.wl2rgb(wl)
    throughput = jnp.where(newly[..., None], throughput * w, throughput)
    return p2, chromatic | disp, throughput


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: DirectOptions, aux=None):
    """Full directlight integrate() for a camera-ray wavefront.
    Returns rgba [N,4].  aux: SSS photon map when opts.use_sss."""
    n = rays.o.shape[0]
    hits = scene_mod.closest_hit(scene, rays)
    primary_valid = hits.valid

    col, sp, p = _shade_hit(scene, types_present, rays, hits, pixel_sample,
                            sampling_offs, jnp.ones(n, bool), opts, aux=aux)
    bg = eval_background(scene.background, rays.d)
    col = jnp.where(primary_valid[..., None], col, bg)
    alpha = jnp.where(primary_valid, 1.0,
                      0.0 if opts.transp_background else 1.0)

    # --- specular chains (stochastic single-branch wavefront) ---
    throughput = jnp.ones_like(col)
    cur_sp, cur_p = sp, p
    cur_wo = -rays.d
    active = primary_valid
    exclude = sp.prim
    spec_depth = opts.raydepth if scene.has_specular else 0
    chromatic = jnp.zeros(n, bool)
    wl = qmc.scr_halton(29, pixel_sample.astype(jnp.uint32) + sampling_offs)
    for depth in range(spec_depth):
        cur_p, chromatic, throughput = apply_dispersion(
            cur_p, chromatic, wl, throughput)
        spec = dispatch.get_specular(types_present, cur_p, cur_sp, cur_wo)
        lum_refl = luminance(spec.refl_col) * spec.refl_valid
        lum_refr = luminance(spec.refr_col) * spec.refr_valid
        total = lum_refl + lum_refr
        cont = active & (total > 1e-7)
        r = qmc.scr_halton(2 * depth + 5,
                           pixel_sample.astype(jnp.uint32) + sampling_offs)
        p_refl = jnp.where(total > 0, lum_refl / jnp.maximum(total, 1e-20), 0.0)
        take_refl = (r < p_refl) & spec.refl_valid
        branch_col = jnp.where(take_refl[..., None], spec.refl_col, spec.refr_col)
        branch_dir = jnp.where(take_refl[..., None], spec.refl_dir, spec.refr_dir)
        branch_p = jax.lax.stop_gradient(
            jnp.where(take_refl, p_refl, 1.0 - p_refl))
        throughput_new = throughput * branch_col / jnp.maximum(
            branch_p, 1e-6)[..., None]

        nrays = Rays(o=cur_sp.p, d=branch_dir,
                     tmin=jnp.full(n, MIN_RAYDIST), tmax=jnp.full(n, -1.0))
        nhits = scene_mod.closest_hit(scene, nrays, exclude_prim=exclude)
        hit_ok = nhits.valid & cont
        # misses on specular chain pick up the background
        bg2 = eval_background(scene.background, branch_dir)
        col = col + jnp.where((cont & ~nhits.valid)[..., None],
                              throughput_new * bg2, 0.0)
        scol, nsp, np_ = _shade_hit(scene, types_present, nrays, nhits,
                                    pixel_sample, sampling_offs,
                                    jnp.ones(n, bool), opts, aux=aux)
        col = col + jnp.where(hit_ok[..., None], throughput_new * scol, 0.0)
        throughput = throughput_new
        cur_sp, cur_p = nsp, np_
        cur_wo = -branch_dir
        exclude = nsp.prim
        active = hit_ok

    return jnp.concatenate([col, alpha[..., None]], axis=-1)
