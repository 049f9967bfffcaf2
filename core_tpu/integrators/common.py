"""Shared Monte-Carlo integrator toolbox, wavefront form (SoA core).

Reimplements the reference mcIntegrator_t direct-lighting machinery
(src/yafraycore/mcintegrator.cc:45-196): per-light Halton-sampled area
sampling with shadow rays and two-sided MIS (power heuristic), plus the
dirac-light fast path.

TPU shape: the per-light sample loop is BATCHED into one wide wavefront
(n_samples x N lanes) so each light costs one illum_sample, one fused BSDF
eval and ONE any-hit kernel launch for all its samples; the light-side and
BSDF-MIS-side shadow rays share a single kernel call.  All math runs on
SoA V3 components (see vec.py for the layout rationale).  The unsuffixed
AoS functions are compatibility wrappers.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from core_tpu.mathutils import SHADOW_BIAS, MIN_RAYDIST
from core_tpu import vec
from core_tpu.vec import (V3, dot3, where3, zeros3, tile1, tile3,
                          untile_sum3, RaysS)
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials import base as base_mod
from core_tpu.materials.base import BSDF
from core_tpu.lights import base as light_base

LOFFS_DELTA = 4567  # reference mcintegrator.cc:42


def _shadow_tcap(valid, dist):
    """Shadow-ray t cap from a light-sample distance.

    dist <= 0 is the 'unbounded shadow ray' sentinel returned by BgLight
    (bg.py) and SunLight (sun.py) — the reference scene_t::isShadowed
    treats tmax < 0 as infinity; the kernel wrappers map tcap <= 0 to BIG
    (open ray), so -1.0 is the open sentinel here.  Invalid lanes and
    valid-but-sub-bias distances get a dead cap (0 < tcap <= tmin -> empty
    t interval) so they cost no triangle tests.
    """
    dead = 0.5 * SHADOW_BIAS
    bounded = jnp.where(dist > SHADOW_BIAS, dist - SHADOW_BIAS, dead)
    return jnp.where(valid, jnp.where(dist > 0, bounded, -1.0), dead)


def _apply_vol_transmittance(scene, o3, wi3, dist, contrib):
    """Attenuate a light sample through the scene volumes (the reference
    multiplies every NEE sample by the volume integrator's transmittance,
    mcintegrator.cc:96,131,181).  No-op (trace-time) without volumes."""
    if not scene.volumes:
        return contrib
    from core_tpu.integrators import volume as vol_mod
    tr = vol_mod.transmittance_nee_s(scene, o3, wi3, dist)
    return contrib * vec.v3(tr)


def transparent_shadow(scene, types_present, o, d, tcap, exclude_prim,
                       depth: int):
    """Transparent-shadow attenuation (scene_t::isShadowed TS variant,
    scene.cc:904 + mcintegrator.cc:96 trShad): walk up to `depth` hits
    along the shadow segment; FILTER-flagged hits multiply their
    transparency color in, anything else blocks.  AoS [N,3] in/out;
    tcap <= 0 means unbounded.  Returns attenuation (0 = fully blocked).
    """
    n = o.shape[0]
    att = jnp.ones((n, 3), jnp.float32)
    tmin = jnp.full(n, SHADOW_BIAS)
    excl = exclude_prim
    from core_tpu.types import Rays as _Rays
    for _ in range(max(1, depth)):
        rays = _Rays(o=o, d=d, tmin=tmin,
                     tmax=jnp.where(tcap > 0, tcap, -1.0))
        hits = scene_mod.closest_hit(scene, rays, exclude_prim=excl)
        hit_in = hits.valid & ((tcap <= 0) | (hits.t < tcap))
        sp = scene_mod.surface_points(scene, rays, hits)
        p = scene_mod.material_params(scene, sp)
        tr = dispatch.transparency(types_present, p, sp, -d)
        is_filter = (p.flags & BSDF.FILTER) != 0
        tr = jnp.where(is_filter[..., None], tr, 0.0)
        att = jnp.where(hit_in[..., None], att * tr, att)
        # continue past the hit; fully-blocked lanes keep att = 0
        tmin = jnp.where(hit_in, hits.t + SHADOW_BIAS, tmin)
        excl = jnp.where(hit_in, hits.prim,
                         excl if excl is not None else hits.prim)
        if excl is None:
            excl = hits.prim
    return att


def _tile_sp(sps, n):
    return vec.SPS(p=tile3(sps.p, n), n=tile3(sps.n, n), ng=tile3(sps.ng, n),
                   nu=tile3(sps.nu, n), nv=tile3(sps.nv, n),
                   u=tile1(sps.u, n), v=tile1(sps.v, n),
                   mat=tile1(sps.mat, n), light=tile1(sps.light, n),
                   prim=tile1(sps.prim, n), obj=tile1(sps.obj, n))


def _tile_params(p, n):
    return jax.tree_util.tree_map(lambda a: tile1(a, n), p)


def do_light_estimation_s(scene, types_present, p, sps, wo: V3, light,
                          loffs, pixel_sample, sampling_offs, active,
                          transp_shad=False, shadow_depth=5):
    """One light's direct contribution (mcintegrator.cc:73-196), SoA.

    active: [N] bool — rays whose shading is meaningful.  Returns V3 [N].
    transp_shad: transparent shadow rays (reference trShad/shadowDepth) —
    shadow tests become closest-hit walks accumulating filter colors.
    """
    l_offs = np.uint32(loffs * LOFFS_DELTA)

    if light_base.dirac(light):
        ls = light_base.illuminate_s(light, sps)
        surf = dispatch.eval_bsdf_s(types_present, p, sps, wo, ls.wi,
                                    BSDF.ALL)
        contrib = surf * ls.col * jnp.abs(dot3(sps.n, ls.wi))
        contrib = _apply_vol_transmittance(scene, sps.p, ls.wi, ls.dist,
                                           contrib)
        if transp_shad and scene.has_transparency:
            att = transparent_shadow(
                scene, types_present, vec.aos(sps.p), vec.aos(ls.wi),
                jnp.where(ls.dist > 0, ls.dist - SHADOW_BIAS, -1.0),
                sps.prim, shadow_depth)
            contrib = contrib * vec.v3(att)
            ok = active & ls.valid
        else:
            # dead caps on inactive lanes (see the NEE bundle below)
            ray = RaysS(o=sps.p, d=ls.wi,
                        tmin=jnp.full_like(ls.dist, SHADOW_BIAS),
                        tmax=_shadow_tcap(active & ls.valid, ls.dist))
            shadowed = scene_mod.any_hit_s(scene, ray, exclude_prim=sps.prim)
            ok = active & ls.valid & (~shadowed)
        return where3(ok, contrib, 0.0)

    # area-type light: batch its n samples into one (n*N)-lane wavefront
    n = max(1, light_base.n_samples(light))
    inv_n = 1.0 / n
    offs = (np.uint32(n) * pixel_sample.astype(jnp.uint32)
            + sampling_offs + l_offs)
    can_int = light_base.can_intersect(light)

    N = offs.shape[0]
    idx = (jnp.arange(n, dtype=jnp.uint32)[:, None] + offs[None, :]).reshape(-1)
    s1 = qmc.ri_vdc(idx)
    s2 = qmc.radical_inverse(3, idx)
    spb = _tile_sp(sps, n)
    pb = _tile_params(p, n)
    wob = tile3(wo, n)
    activeb = tile1(active, n)

    def nee_body(pb, spb, wob, light, s1, s2, activeb):
        """The whole (n*N)-lane NEE shading chain (one function so a remat
        policy can be swapped in; measured on v5e, rematerializing this
        region was a net loss — 315 vs 352 Mrays/s — so it runs plain)."""

        def slices3(v):
            return [V3(v.x[k * N:(k + 1) * N], v.y[k * N:(k + 1) * N],
                       v.z[k * N:(k + 1) * N]) for k in range(n)]

        def slices1(a):
            return [a[k * N:(k + 1) * N] for k in range(n)]

        tmin_nee = jnp.full(N, SHADOW_BIAS, jnp.float32)

        # --- light-side sampling ---
        ls = light_base.illum_sample_s(light, spb, s1, s2)
        surf = dispatch.eval_bsdf_s(types_present, pb, spb, wob, ls.wi,
                                    BSDF.ALL)
        cos_term = jnp.abs(dot3(spb.n, ls.wi))

        if can_int:
            mpdf = dispatch.pdf_bsdf_s(types_present, pb, spb, wob, ls.wi,
                                       BSDF.INTERSECT)
            l2 = ls.pdf * ls.pdf
            m2 = mpdf * mpdf
            w = jnp.where(mpdf > 1e-6, l2 / jnp.maximum(l2 + m2, 1e-20), 1.0)

            # --- BSDF-sampling side of MIS (mcintegrator.cc:152-190) ---
            sres = base_mod.detach_sample(
                dispatch.sample_bsdf_s(types_present, pb, spb, wob, s1, s2,
                                       BSDF.INTERSECT))
            lh = light_base.intersect_light_s(
                light, RaysS(o=spb.p, d=sres.wi,
                             tmin=jnp.full_like(s1, MIN_RAYDIST),
                             tmax=jnp.full_like(s1, -1.0)))

            # ONE shadow kernel launch for both MIS sides: all 2n rays of
            # a lane share its origin, so the shared-origin NEE kernel
            # computes the origin-only MT terms once per triangle
            # Dead-ray tcap (0 < tcap <= tmin -> empty t interval) for
            # lanes whose MIS side is invalid: their occlusion bit is
            # masked out of l_ok/b_ok below anyway, but tracing them as
            # open rays wastes triangle tests and blocks the planar-
            # cluster cull (an open ray's far endpoint is at infinity).
            lcontrib = surf * ls.col * ((cos_term * w
                                         / jnp.maximum(ls.pdf, 1e-12)))
            lcontrib = _apply_vol_transmittance(scene, spb.p, ls.wi, ls.dist,
                                                lcontrib)
            if transp_shad and scene.has_transparency:
                l_att = transparent_shadow(
                    scene, types_present, vec.aos(spb.p), vec.aos(ls.wi),
                    jnp.where(ls.dist > 0, ls.dist - SHADOW_BIAS, -1.0),
                    spb.prim, shadow_depth)
                b_att = transparent_shadow(
                    scene, types_present, vec.aos(spb.p), vec.aos(sres.wi),
                    jnp.where(lh.t > 0, lh.t - SHADOW_BIAS, -1.0),
                    spb.prim, shadow_depth)
                lcontrib = lcontrib * vec.v3(l_att)
                l_shadowed = jnp.zeros_like(ls.valid)
                b_shadowed = jnp.zeros_like(ls.valid)
            else:
                # inactive lanes (masked shading points, e.g. dead chain
                # lanes whose surface record is garbage) must get dead
                # caps too, or they open big-scene cluster gates from
                # arbitrary origins
                l_tcap = _shadow_tcap(activeb & ls.valid, ls.dist)
                b_tcap = _shadow_tcap(activeb & lh.valid, lh.t)
                shad = scene_mod.any_hit_nee_s(
                    scene, sps.p, tmin_nee,
                    slices3(ls.wi) + slices3(sres.wi),
                    slices1(l_tcap) + slices1(b_tcap),
                    exclude_prim=sps.prim)
                shad = checkpoint_name(shad, "nee_kernel")
                l_shadowed = shad[:n * N]
                b_shadowed = shad[n * N:]
            l_ok = activeb & ls.valid & (~l_shadowed) & (ls.pdf > 1e-6)

            lpdf = 1.0 / jnp.maximum(lh.ipdf, 1e-12)
            l2b = lpdf * lpdf
            m2b = sres.pdf * sres.pdf
            wb = m2b / jnp.maximum(l2b + m2b, 1e-20)
            bcontrib = sres.col * lh.col * (wb * sres.w)
            bcontrib = _apply_vol_transmittance(scene, spb.p, sres.wi, lh.t,
                                                bcontrib)
            if transp_shad and scene.has_transparency:
                bcontrib = bcontrib * vec.v3(b_att)
            b_ok = activeb & lh.valid & (~b_shadowed) & (sres.pdf > 1e-6) \
                & (lh.ipdf > 1e-6)
            total = where3(l_ok, lcontrib, 0.0) + where3(b_ok, bcontrib, 0.0)
        else:
            contrib = surf * ls.col * (cos_term / jnp.maximum(ls.pdf, 1e-12))
            contrib = _apply_vol_transmittance(scene, spb.p, ls.wi, ls.dist,
                                               contrib)
            if transp_shad and scene.has_transparency:
                att = transparent_shadow(
                    scene, types_present, vec.aos(spb.p), vec.aos(ls.wi),
                    jnp.where(ls.dist > 0, ls.dist - SHADOW_BIAS, -1.0),
                    spb.prim, shadow_depth)
                contrib = contrib * vec.v3(att)
                shadowed = jnp.zeros_like(ls.valid)
            else:
                l_tcap = _shadow_tcap(activeb & ls.valid, ls.dist)
                shadowed = scene_mod.any_hit_nee_s(
                    scene, sps.p, tmin_nee, slices3(ls.wi),
                    slices1(l_tcap), exclude_prim=sps.prim)
                shadowed = checkpoint_name(shadowed, "nee_kernel")
            ok = activeb & ls.valid & (~shadowed) & (ls.pdf > 1e-6)
            total = where3(ok, contrib, 0.0)
        return untile_sum3(total, n) * inv_n

    return nee_body(pb, spb, wob, light, s1, s2, activeb)


def estimate_all_direct_s(scene, types_present, p, sps, wo, pixel_sample,
                          sampling_offs, active, transp_shad=False,
                          shadow_depth=5) -> V3:
    """Sum over all scene lights (mcintegrator.cc estimateAllDirectLight)."""
    col = zeros3(active)
    for loffs, light in enumerate(scene.lights):
        col = col + do_light_estimation_s(scene, types_present, p, sps, wo,
                                          light, loffs, pixel_sample,
                                          sampling_offs, active,
                                          transp_shad=transp_shad,
                                          shadow_depth=shadow_depth)
    return col


def estimate_one_direct_s(scene, types_present, p, sps, wo, n_index,
                          pixel_sample, sampling_offs, active,
                          transp_shad=False, shadow_depth=5) -> V3:
    """Pick one light by Halton CDF and weight by light count
    (mcintegrator.cc estimateOneDirectLight) — used at path bounces."""
    num = len(scene.lights)
    if num == 0:
        return zeros3(active)
    if num == 1:
        return do_light_estimation_s(scene, types_present, p, sps, wo,
                                     scene.lights[0], 0, pixel_sample,
                                     sampling_offs, active,
                                     transp_shad=transp_shad,
                                     shadow_depth=shadow_depth)
    pick = jnp.minimum((qmc.ri_vdc(n_index) * num).astype(jnp.int32), num - 1)
    col = zeros3(active)
    for lnum, light in enumerate(scene.lights):
        c = do_light_estimation_s(scene, types_present, p, sps, wo, light,
                                  lnum, pixel_sample, sampling_offs,
                                  active & (pick == lnum),
                                  transp_shad=transp_shad,
                                  shadow_depth=shadow_depth)
        col = col + c
    return col * float(num)


# ---------------------------------------------------------------------------
# AoS compatibility wrappers (photon/SPPM/direct integrators, tests)
# ---------------------------------------------------------------------------

def _to_soa(p, sp, wo):
    return base_mod.params_to_soa(p), vec.sp_to_soa(sp), vec.v3(wo)


def do_light_estimation(scene, types_present, p, sp, wo, light, loffs,
                        pixel_sample, sampling_offs, active):
    ps, sps, wos = _to_soa(p, sp, wo)
    return vec.aos(do_light_estimation_s(scene, types_present, ps, sps, wos,
                                         light, loffs, pixel_sample,
                                         sampling_offs, active))


def estimate_all_direct(scene, types_present, p, sp, wo, pixel_sample,
                        sampling_offs, active, transp_shad=False,
                        shadow_depth=5):
    ps, sps, wos = _to_soa(p, sp, wo)
    return vec.aos(estimate_all_direct_s(scene, types_present, ps, sps, wos,
                                         pixel_sample, sampling_offs, active,
                                         transp_shad=transp_shad,
                                         shadow_depth=shadow_depth))


def estimate_one_direct(scene, types_present, p, sp, wo, n_index,
                        pixel_sample, sampling_offs, active):
    ps, sps, wos = _to_soa(p, sp, wo)
    return vec.aos(estimate_one_direct_s(scene, types_present, ps, sps, wos,
                                         n_index, pixel_sample,
                                         sampling_offs, active))
