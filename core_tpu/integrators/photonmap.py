"""Photon-mapping integrator (classic two-map + final gather).

Reference: src/integrators/photonintegr.cc — preprocess shoots diffuse +
caustic photon maps (:126-640), integrate() = direct light + caustic-map
radiance + indirect via final gathering (:647-860).  TPU-native: the maps
are built by one jitted wavefront shoot into a sorted uniform grid
(photon/map.py); final gather is a fixed number of cosine-sampled gather
rays per shading point whose hits look up the diffuse-map density estimate.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import MIN_RAYDIST, dot
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials.base import BSDF, detach_sample
from core_tpu.integrators import common
from core_tpu.backgrounds import eval_background
from core_tpu.photon import map as pmap_mod


@dataclass(frozen=True)
class PhotonOptions:
    photons: int = 100000          # diffuse photons shot
    c_photons: int = 50000         # caustic photons shot
    diffuse_radius: float = 1.0    # gather radius (reference diffuseRadius)
    caustic_radius: float = 0.1    # (reference causticRadius)
    bounces: int = 5               # photon bounce depth
    final_gather: bool = True
    fg_samples: int = 16
    # radiance-map cache (photonintegr.cc:42-107,574): irradiance is
    # pre-gathered at photon deposits during preprocess so each final-
    # gather ray pays one cell lookup instead of a density estimate
    fg_cache: bool = True
    raydepth: int = 5
    use_diffuse: bool = True
    use_caustics: bool = True
    transp_background: bool = False


def scene_bound(scene):
    """Host-side world AABB (scene_t::getSceneBound)."""
    v = np.asarray(scene.geom.verts)
    return v.min(axis=0), v.max(axis=0)


def scene_center_radius(scene):
    """World bounding sphere, jit-traceable (for photon emission from
    sun/directional/background lights)."""
    v = scene.geom.verts
    bmin = jnp.min(v, axis=0)
    bmax = jnp.max(v, axis=0)
    return 0.5 * (bmin + bmax), 0.5 * jnp.sqrt(
        jnp.sum((bmax - bmin) ** 2))


def preprocess(scene, types_present, opts: PhotonOptions):
    """Shoot both photon maps (photonintegr.cc preprocess)."""
    bmin, bmax = scene_bound(scene)
    center = jnp.asarray(0.5 * (bmin + bmax), jnp.float32)
    radius = float(0.5 * np.linalg.norm(bmax - bmin))

    aux = {}

    with_cache = opts.final_gather and opts.fg_cache

    @jax.jit
    def build_diffuse(scene):
        out = pmap_mod.shoot_photons(
            scene, types_present, opts.photons, opts.bounces, seed=1,
            mode="diffuse", scene_center=center, scene_radius=radius,
            with_surface=with_cache)
        pos, pw, dr, ok = out[:4]
        grid = pmap_mod.build_photon_grid(pos, pw, dr, ok,
                                          opts.diffuse_radius, bmin, bmax)
        if with_cache:
            nrm, alb = out[4], out[5]
            cache = pmap_mod.build_radiance_cache(grid, nrm, alb,
                                                  opts.diffuse_radius)
            return grid, cache
        return grid, None

    @jax.jit
    def build_caustic(scene):
        pos, pw, dr, ok = pmap_mod.shoot_photons(
            scene, types_present, opts.c_photons, opts.bounces, seed=2,
            mode="caustic", scene_center=center, scene_radius=radius)
        return pmap_mod.build_photon_grid(pos, pw, dr, ok,
                                          opts.caustic_radius, bmin, bmax)

    if opts.use_diffuse:
        grid, cache = build_diffuse(scene)
        aux["diffuse"] = grid
        if cache is not None:
            aux["fg_cache"] = cache
    if opts.use_caustics and scene.has_specular:
        aux["caustic"] = build_caustic(scene)
    return aux


def _caustic_radiance(pmap, p, sp, wo, types_present, radius):
    """Caustic-map kernel estimate modulated by the diffuse BRDF
    (mcintegrator.cc estimateCausticPhotons :384)."""
    irr = pmap_mod.estimate_irradiance(pmap, sp.p, sp.n, radius)
    surf = dispatch.eval_bsdf(types_present, p, sp, wo, sp.n, BSDF.ALL)
    return surf * irr / np.pi


def _final_gather(scene, types_present, dmap, p, sp, wo, pixel_sample,
                  sampling_offs, active, opts: PhotonOptions, cache=None):
    """Cosine-sampled one-bounce gather rays -> diffuse-map radiance at the
    secondary hit (photonintegr.cc finalGathering :647).  With a radiance
    cache the per-hit density estimate + BRDF eval collapses to one cell
    lookup (photonintegr.cc radiance-map precompute :42-107,574)."""
    n = max(1, opts.fg_samples)
    offs = (np.uint32(n) * pixel_sample.astype(jnp.uint32) + sampling_offs)
    acc = jnp.zeros_like(wo)
    for i in range(n):
        s1 = qmc.ri_vdc(offs + np.uint32(i))
        s2 = qmc.scr_halton(2, offs + np.uint32(i))
        sres = detach_sample(dispatch.sample_bsdf(
            types_present, p, sp, wo, s1, s2,
            BSDF.DIFFUSE | BSDF.REFLECT))
        rays = Rays(o=sp.p, d=sres.wi,
                    tmin=jnp.full_like(s1, MIN_RAYDIST),
                    tmax=jnp.full_like(s1, -1.0))
        hits = scene_mod.closest_hit(scene, rays, exclude_prim=sp.prim)
        gsp = scene_mod.surface_points(scene, rays, hits)
        if cache is not None:
            li = pmap_mod.lookup_radiance(cache, gsp.p)
        else:
            gp = scene_mod.material_params(scene, gsp)
            irr = pmap_mod.estimate_irradiance(dmap, gsp.p, gsp.n,
                                               opts.diffuse_radius)
            # radiance leaving the gather hit: albedo/pi * irradiance
            alb = dispatch.eval_bsdf(types_present, gp, gsp, -sres.wi,
                                     gsp.n, BSDF.ALL)
            li = alb * irr / np.pi
        ok = active & hits.valid & (sres.pdf > 1e-6)
        acc = acc + jnp.where(ok[..., None],
                              sres.col * li * sres.w[..., None], 0.0)
    return acc / n


def _shade_hit(scene, types_present, rays, hits, pixel_sample, sampling_offs,
               include_lights, opts: PhotonOptions, aux, diff=None):
    """Photon-map shading at given hits (emission + direct + caustic map +
    indirect via final gather / direct radiance estimate); the per-hit body
    shared by the primary wavefront and the specular/glossy chains.
    Returns (col [N,3], sp, p)."""
    sp = scene_mod.surface_points(scene, rays, hits)
    lod = None
    if diff is not None:
        from core_tpu.differentials import texture_lod
        lod = texture_lod(scene, sp, rays, diff[0], diff[1])
    p = scene_mod.material_params(scene, sp, lod=lod)
    wo = -rays.d
    active = hits.valid

    col = jnp.zeros_like(rays.d)
    emit_c = dispatch.emit(types_present, p)
    col = col + jnp.where((active & include_lights)[..., None], emit_c, 0.0)
    has_diffuse = (p.flags & BSDF.DIFFUSE) != 0
    col = col + common.estimate_all_direct(scene, types_present, p, sp, wo,
                                           pixel_sample, sampling_offs,
                                           active)
    if "caustic" in aux:
        cc = _caustic_radiance(aux["caustic"], p, sp, wo, types_present,
                               opts.caustic_radius)
        col = col + jnp.where((active & has_diffuse)[..., None], cc, 0.0)
    if "diffuse" in aux:
        if opts.final_gather:
            ind = _final_gather(scene, types_present, aux["diffuse"], p, sp,
                                wo, pixel_sample, sampling_offs,
                                active & has_diffuse, opts,
                                cache=aux.get("fg_cache"))
        else:
            irr = pmap_mod.estimate_irradiance(aux["diffuse"], sp.p, sp.n,
                                               opts.diffuse_radius)
            alb = dispatch.eval_bsdf(types_present, p, sp, wo, sp.n, BSDF.ALL)
            ind = alb * irr / np.pi
        col = col + jnp.where((active & has_diffuse)[..., None], ind, 0.0)
    return col, sp, p


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: PhotonOptions, aux=None, diff=None):
    """integrate() (photonintegr.cc:791-860): emission + direct + caustic
    photons + final-gathered indirect; specular/glossy chains through the
    shared recursiveRaytrace (photonintegr.cc:791-860 recurses the same
    way as directlight)."""
    from core_tpu.integrators import raytrace
    assert aux is not None, "photonmapping requires preprocess() aux maps"
    n = rays.o.shape[0]
    hits = scene_mod.closest_hit(scene, rays)
    primary_valid = hits.valid

    col, sp, p = _shade_hit(scene, types_present, rays, hits, pixel_sample,
                            sampling_offs, jnp.ones(n, bool), opts, aux,
                            diff=diff)

    chain = scene.has_specular or raytrace.has_glossy(types_present)
    if chain and opts.raydepth > 0:
        def shade_fn(nrays, nhits, include_lights, active):
            return _shade_hit(scene, types_present, nrays, nhits,
                              pixel_sample, sampling_offs, include_lights,
                              opts, aux)

        col = col + raytrace.recursive_raytrace(
            scene, types_present, rays, hits, sp, p, shade_fn,
            pixel_sample, sampling_offs, opts.raydepth)

    bg = eval_background(scene.background, rays.d)
    col = jnp.where(primary_valid[..., None], col, bg)
    alpha = jnp.where(primary_valid, 1.0,
                      0.0 if opts.transp_background else 1.0)
    return jnp.concatenate([col, alpha[..., None]], axis=-1)
