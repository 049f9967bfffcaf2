"""Shared recursiveRaytrace machinery (mcintegrator.cc:421-628).

The reference's mcIntegrator_t::recursiveRaytrace follows three branch
families at every hit: the dispersive branch (spectral wavelength
sampling), the glossy branch (subsampled glossy indirect reflection,
mcintegrator.cc:487-527) and the perfect specular reflect/refract
recursion.  TPU shape: a static-shape wavefront cannot fork, so each lane
picks ONE continuation among {specular reflect, specular refract, glossy
lobe} with probability proportional to branch energy and compensates
throughput by 1/p — same expectation as the reference's full branching,
higher variance on multi-branch materials at equal sample count
(documented deviation).

Emission/background double-count rules:
- specular-branch hits include emission (specular directions are excluded
  from NEE MIS, so nothing else counts them);
- glossy-branch hits do NOT (do_light_estimation's BSDF-MIS side at the
  glossy vertex already integrates BSDF-sampled light);
- background on a glossy-branch miss is skipped when the scene carries an
  importance-sampled bg light (same reason).

The glossy lobe is requested with BSDF.GLOSSY|REFLECT|TRANSMIT (no
DIFFUSE): `as_diffuse` glossy materials decline that request (glossy.py),
matching the reference where as_diffuse lobes report BSDF_DIFFUSE and are
integrated by the diffuse machinery instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from core_tpu.mathutils import MIN_RAYDIST, luminance
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials.base import BSDF, MatType, detach_sample
from core_tpu.backgrounds import eval_background

GLOSSY_FAMILIES = (int(MatType.GLOSSY), int(MatType.COATED_GLOSSY),
                   int(MatType.ROUGH_GLASS))


def has_glossy(types_present) -> bool:
    """Scene needs the glossy indirect branch compiled at all."""
    return any(int(t) in GLOSSY_FAMILIES for t in types_present)


def scene_has_bg_light(scene) -> bool:
    from core_tpu.lights.bg import BgLight
    return any(isinstance(light, BgLight) for light in scene.lights)


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


def recursive_raytrace(scene, types_present, rays, hits, sp, p, shade_fn,
                       pixel_sample, sampling_offs, raydepth: int,
                       glossy: bool = True):
    """Specular + glossy indirect chains from already-shaded primary hits.

    shade_fn(nrays, nhits, include_lights, active) -> (col [N,3], sp, p):
    the per-integrator shading of a chain hit (direct light, caustic maps,
    final gather, ...) with emission gated by the include_lights mask.
    Returns the chain radiance to ADD to the primary shading, [N,3].
    """
    n = rays.o.shape[0]
    glossy = glossy and has_glossy(types_present)
    col = jnp.zeros(rays.d.shape, jnp.float32)
    throughput = jnp.ones_like(col)
    cur_sp, cur_p = sp, p
    cur_wo = -rays.d
    active = hits.valid
    exclude = sp.prim
    chromatic = jnp.zeros(n, bool)
    u32 = pixel_sample.astype(jnp.uint32) + sampling_offs
    wl = qmc.scr_halton(29, u32)
    bg_is_light = scene_has_bg_light(scene)

    for depth in range(raydepth):
        cur_p, chromatic, throughput = apply_dispersion(
            cur_p, chromatic, wl, throughput)
        spec = dispatch.get_specular(types_present, cur_p, cur_sp, cur_wo)
        lum_refl = luminance(spec.refl_col) * spec.refl_valid
        lum_refr = luminance(spec.refr_col) * spec.refr_valid

        if glossy:
            g1 = qmc.scr_halton(3 * depth + 13, u32)
            g2 = qmc.scr_halton(3 * depth + 14, u32)
            gres = detach_sample(dispatch.sample_bsdf(
                types_present, cur_p, cur_sp, cur_wo, g1, g2,
                BSDF.GLOSSY | BSDF.REFLECT | BSDF.TRANSMIT))
            g_col3 = gres.col * gres.w[..., None]
            g_ok = (gres.pdf > 1e-6) & ((gres.flags & BSDF.GLOSSY) != 0)
            lum_g = jnp.where(g_ok, luminance(g_col3), 0.0)
        else:
            lum_g = jnp.zeros(n, jnp.float32)

        total = lum_refl + lum_refr + lum_g
        cont = active & (total > 1e-7)
        r = qmc.scr_halton(2 * depth + 5, u32)
        inv_total = 1.0 / jnp.maximum(total, 1e-20)
        p_refl = lum_refl * inv_total
        p_refr = lum_refr * inv_total
        take_refl = (r < p_refl) & spec.refl_valid
        take_refr = (~take_refl) & (r < p_refl + p_refr) & spec.refr_valid
        take_gloss = cont & (~take_refl) & (~take_refr) & (lum_g > 0.0)

        branch_dir = jnp.where(take_refl[..., None], spec.refl_dir,
                               spec.refr_dir)
        branch_col = jnp.where(take_refl[..., None], spec.refl_col,
                               spec.refr_col)
        branch_p = jnp.where(take_refl, p_refl,
                             jnp.where(take_refr, p_refr,
                                       jnp.maximum(lum_g * inv_total, 0.0)))
        if glossy:
            branch_dir = jnp.where(take_gloss[..., None], gres.wi, branch_dir)
            branch_col = jnp.where(take_gloss[..., None], g_col3, branch_col)
        branch_p = jax.lax.stop_gradient(branch_p)
        took = take_refl | take_refr | take_gloss
        cont = cont & took
        throughput_new = throughput * branch_col / jnp.maximum(
            branch_p, 1e-6)[..., None]

        nrays = Rays(o=cur_sp.p, d=branch_dir,
                     tmin=jnp.full(n, MIN_RAYDIST), tmax=jnp.full(n, -1.0))
        nhits = scene_mod.closest_hit(scene, nrays, exclude_prim=exclude)
        hit_ok = nhits.valid & cont

        if scene.background is not None:
            bg2 = eval_background(scene.background, branch_dir)
            bg_take = take_refl | take_refr
            if not bg_is_light:
                bg_take = bg_take | take_gloss
            col = col + jnp.where((cont & bg_take & ~nhits.valid)[..., None],
                                  throughput_new * bg2, 0.0)

        include_lights = take_refl | take_refr
        scol, nsp, np_ = shade_fn(nrays, nhits, include_lights, hit_ok)
        col = col + jnp.where(hit_ok[..., None], throughput_new * scol, 0.0)
        throughput = throughput_new
        cur_sp, cur_p = nsp, np_
        cur_wo = -branch_dir
        exclude = nsp.prim
        active = hit_ok

    return col
