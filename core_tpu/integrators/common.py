"""Shared Monte-Carlo integrator toolbox, wavefront form.

Reimplements the reference mcIntegrator_t direct-lighting machinery
(src/yafraycore/mcintegrator.cc:45-196): per-light Halton-sampled area
sampling with shadow rays and two-sided MIS (power heuristic), plus the
dirac-light fast path.  All loops over lights and per-light samples are
static Python loops unrolled inside jit; every body is full-wavefront.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, SHADOW_BIAS, MIN_RAYDIST
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials import base as base_mod
from core_tpu.materials.base import BSDF
from core_tpu.lights import base as light_base

LOFFS_DELTA = 4567  # reference mcintegrator.cc:42


def _shadow_ray(sp, wi, dist):
    tmax = dist - SHADOW_BIAS
    return Rays(o=sp.p, d=wi, tmin=jnp.full_like(dist, SHADOW_BIAS), tmax=tmax)


def do_light_estimation(scene, types_present, p, sp, wo, light, loffs,
                        pixel_sample, sampling_offs, active):
    """One light's direct contribution (mcintegrator.cc:73-196).

    active: [N] bool — rays whose shading is meaningful (hit something
    diffuse).  Inactive lanes still compute but are masked to zero.
    Returns [N,3].
    """
    col = jnp.zeros_like(wo)
    l_offs = np.uint32(loffs * LOFFS_DELTA)

    if light_base.dirac(light):
        ls = light_base.illuminate(light, sp)
        ray = _shadow_ray(sp, ls.wi, ls.dist)
        shadowed = scene_mod.any_hit(scene, ray, exclude_prim=sp.prim)
        surf = dispatch.eval_bsdf(types_present, p, sp, wo, ls.wi, BSDF.ALL)
        contrib = surf * ls.col * jnp.abs(dot(sp.n, ls.wi))[..., None]
        ok = active & ls.valid & (~shadowed)
        return jnp.where(ok[..., None], contrib, 0.0)

    # area-type light
    n = max(1, light_base.n_samples(light))
    inv_n = 1.0 / n
    offs = (np.uint32(n) * pixel_sample.astype(jnp.uint32)
            + sampling_offs + l_offs)
    can_int = light_base.can_intersect(light)

    def light_sample_body(i, ccol):
        idx = offs + jnp.asarray(i, jnp.uint32)
        s1 = qmc.ri_vdc(idx)
        s2 = qmc.radical_inverse(3, idx)
        ls = light_base.illum_sample(light, sp, s1, s2)
        ray = _shadow_ray(sp, ls.wi, ls.dist)
        shadowed = scene_mod.any_hit(scene, ray, exclude_prim=sp.prim)
        surf = dispatch.eval_bsdf(types_present, p, sp, wo, ls.wi, BSDF.ALL)
        cos_term = jnp.abs(dot(sp.n, ls.wi))
        if can_int:
            mpdf = dispatch.pdf_bsdf(types_present, p, sp, wo, ls.wi,
                                     BSDF.INTERSECT)
            l2 = ls.pdf * ls.pdf
            m2 = mpdf * mpdf
            w = jnp.where(mpdf > 1e-6, l2 / jnp.maximum(l2 + m2, 1e-20), 1.0)
        else:
            w = jnp.ones_like(ls.pdf)
        contrib = surf * ls.col * (cos_term * w / jnp.maximum(ls.pdf, 1e-12))[..., None]
        ok = active & ls.valid & (~shadowed) & (ls.pdf > 1e-6)
        return ccol + jnp.where(ok[..., None], contrib, 0.0)

    # fori_loop: measured equal to a static unroll on TPU, with far
    # smaller HLO / compile time
    ccol = jax.lax.fori_loop(0, n, lambda i, c: light_sample_body(i, c),
                             jnp.zeros_like(wo))
    col = col + ccol * inv_n

    if can_int:
        # BSDF-sampling side of MIS (mcintegrator.cc:152-190)
        def bsdf_sample_body(i, ccol2):
            idx = offs + jnp.asarray(i, jnp.uint32)
            s1 = qmc.ri_vdc(idx)
            s2 = qmc.radical_inverse(3, idx)
            sres = base_mod.detach_sample(
                dispatch.sample_bsdf(types_present, p, sp, wo, s1, s2,
                                     BSDF.INTERSECT))
            bray = Rays(o=sp.p, d=sres.wi,
                        tmin=jnp.full_like(s1, MIN_RAYDIST),
                        tmax=jnp.full_like(s1, -1.0))
            lh = light_base.intersect_light(light, bray)
            ray = Rays(o=sp.p, d=sres.wi,
                       tmin=jnp.full_like(s1, SHADOW_BIAS),
                       tmax=lh.t - SHADOW_BIAS)
            shadowed = scene_mod.any_hit(scene, ray, exclude_prim=sp.prim)
            lpdf = 1.0 / jnp.maximum(lh.ipdf, 1e-12)
            l2 = lpdf * lpdf
            m2 = sres.pdf * sres.pdf
            w = m2 / jnp.maximum(l2 + m2, 1e-20)
            contrib = sres.col * lh.col * (w * sres.w)[..., None]
            ok = active & lh.valid & (~shadowed) & (sres.pdf > 1e-6) \
                & (lh.ipdf > 1e-6)
            return ccol2 + jnp.where(ok[..., None], contrib, 0.0)

        ccol2 = jax.lax.fori_loop(0, n,
                                  lambda i, c: bsdf_sample_body(i, c),
                                  jnp.zeros_like(wo))
        col = col + ccol2 * inv_n
    return col


def estimate_all_direct(scene, types_present, p, sp, wo, pixel_sample,
                        sampling_offs, active):
    """Sum over all scene lights (mcintegrator.cc estimateAllDirectLight)."""
    col = jnp.zeros_like(wo)
    for loffs, light in enumerate(scene.lights):
        col = col + do_light_estimation(scene, types_present, p, sp, wo,
                                        light, loffs, pixel_sample,
                                        sampling_offs, active)
    return col


def estimate_one_direct(scene, types_present, p, sp, wo, n_index,
                        pixel_sample, sampling_offs, active):
    """Pick one light by Halton CDF and weight by light count
    (mcintegrator.cc estimateOneDirectLight) — used at path bounces."""
    num = len(scene.lights)
    if num == 0:
        return jnp.zeros_like(wo)
    if num == 1:
        return do_light_estimation(scene, types_present, p, sp, wo,
                                   scene.lights[0], 0, pixel_sample,
                                   sampling_offs, active)
    pick = jnp.minimum((qmc.ri_vdc(n_index) * num).astype(jnp.int32), num - 1)
    col = jnp.zeros_like(wo)
    for lnum, light in enumerate(scene.lights):
        c = do_light_estimation(scene, types_present, p, sp, wo, light, lnum,
                                pixel_sample, sampling_offs,
                                active & (pick == lnum))
        col = col + c
    return col * float(num)
