"""Unidirectional path tracer, wavefront form.

Reference: src/integrators/pathtracer.cc:134-333 — per camera hit:
emission + MIS direct lighting, then `path_samples` independent paths of
up to `bounces` vertices; each bounce does next-event estimation with one
Halton-chosen light (estimateOneDirectLight) and adds emission only on
caustic (specular/glossy/filter) bounces; background contributes on caustic
misses.  Specular camera-visible chains go through the same stochastic
recursiveRaytrace as the direct integrator.

QMC dimensions match the reference: path sample i uses
  offs = n_paths * pixel_sample + sampling_offs + i
  first bounce: s1 = RI_vdC(offs), s2 = scrHalton(2, offs)
  depth d >= 1: s1 = scrHalton(4d+3, offs), s2 = scrHalton(4d+4, offs).
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
from core_tpu.materials import dispatch
from core_tpu.materials.base import BSDF, gather_params, detach_sample
from core_tpu.integrators import common
from core_tpu.integrators import direct as direct_mod
from core_tpu.backgrounds import eval_background


@dataclass(frozen=True)
class PathOptions:
    path_samples: int = 32        # reference "path_samples" (nPaths)
    bounces: int = 5              # reference "bounces" (maxBounces)
    raydepth: int = 5             # specular recursion depth
    no_recursive: bool = False
    caustic_type: str = "path"    # none|path|photon|both
    transp_background: bool = False
    use_ao: bool = False
    ao_samples: int = 32
    ao_dist: float = 1.0
    ao_color: tuple = (1.0, 1.0, 1.0)


def _one_path(scene, types_present, sp0, p0, wo0, offs, pixel_sample,
              sampling_offs, active0, opts: PathOptions):
    """Trace one indirect path from the camera hit; returns [N,3]."""
    trace_caustics = opts.caustic_type in ("path", "both")
    path_col = jnp.zeros_like(wo0)

    # first bounce, sampled from diffuse-ish components only
    s1 = qmc.ri_vdc(offs)
    s2 = qmc.scr_halton(2, offs)
    first_flags = BSDF.DIFFUSE | BSDF.REFLECT | BSDF.TRANSMIT
    sres = detach_sample(dispatch.sample_bsdf(types_present, p0, sp0, wo0,
                                              s1, s2, first_flags))
    throughput = sres.col * sres.w[..., None]
    rays = Rays(o=sp0.p, d=sres.wi,
                tmin=jnp.full_like(s1, MIN_RAYDIST),
                tmax=jnp.full_like(s1, -1.0))
    hits = scene_mod.closest_hit(scene, rays, exclude_prim=sp0.prim)
    active = active0 & hits.valid & (sres.pdf > 0.0)

    sp = scene_mod.surface_points(scene, rays, hits)
    p = scene_mod.material_params(scene, sp)
    wo = -rays.d
    lcol = common.estimate_one_direct(scene, types_present, p, sp, wo, offs,
                                      pixel_sample, sampling_offs, active)
    emit_c = dispatch.emit(types_present, p)
    has_emit = (p.flags & BSDF.EMIT) != 0
    lcol = lcol + jnp.where(has_emit[..., None], emit_c, 0.0)
    path_col = path_col + jnp.where(active[..., None], lcol * throughput, 0.0)

    for depth in range(1, opts.bounces):
        d4 = 4 * depth
        s1 = qmc.scr_halton(d4 + 3, offs)
        s2 = qmc.scr_halton(d4 + 4, offs)
        sres = detach_sample(
            dispatch.sample_bsdf(types_present, p, sp, wo, s1, s2, BSDF.ALL))
        scol = sres.col * sres.w[..., None]
        alive = active & (luminance(scol) > 0.0)
        throughput = throughput * scol
        caustic = trace_caustics & True
        caustic_mask = (sres.flags & (BSDF.SPECULAR | BSDF.GLOSSY
                                      | BSDF.FILTER)) != 0
        caustic_mask = caustic_mask if trace_caustics else jnp.zeros_like(alive)

        rays = Rays(o=sp.p, d=sres.wi,
                    tmin=jnp.full_like(s1, MIN_RAYDIST),
                    tmax=jnp.full_like(s1, -1.0))
        hits = scene_mod.closest_hit(scene, rays, exclude_prim=sp.prim)
        miss = alive & (~hits.valid)
        if scene.background is not None:
            bg = eval_background(scene.background, sres.wi)
            path_col = path_col + jnp.where((miss & caustic_mask)[..., None],
                                            throughput * bg, 0.0)
        active = alive & hits.valid

        sp = scene_mod.surface_points(scene, rays, hits)
        p = scene_mod.material_params(scene, sp)
        wo = -rays.d
        has_diffuse = (p.flags & BSDF.DIFFUSE) != 0
        lcol = common.estimate_one_direct(scene, types_present, p, sp, wo,
                                          offs, pixel_sample, sampling_offs,
                                          active & has_diffuse)
        emit_c = dispatch.emit(types_present, p)
        has_emit = (p.flags & BSDF.EMIT) != 0
        lcol = lcol + jnp.where((has_emit & caustic_mask)[..., None], emit_c, 0.0)
        path_col = path_col + jnp.where(active[..., None], lcol * throughput, 0.0)
    return path_col


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: PathOptions):
    """Full path-tracer integrate() for a camera wavefront -> rgba [N,4]."""
    n = rays.o.shape[0]
    hits = scene_mod.closest_hit(scene, rays)
    primary_valid = hits.valid

    sp = scene_mod.surface_points(scene, rays, hits)
    p = scene_mod.material_params(scene, sp)
    wo = -rays.d

    col = jnp.zeros_like(rays.d)
    emit_c = dispatch.emit(types_present, p)
    col = col + jnp.where(primary_valid[..., None], emit_c, 0.0)
    has_diffuse = (p.flags & BSDF.DIFFUSE) != 0
    col = col + common.estimate_all_direct(scene, types_present, p, sp, wo,
                                           pixel_sample, sampling_offs,
                                           primary_valid & has_diffuse)

    # indirect paths
    n_paths = max(1, opts.path_samples)
    base = np.uint32(n_paths) * pixel_sample.astype(jnp.uint32) + sampling_offs

    def path_body(i, acc):
        offs = base + i.astype(jnp.uint32)
        return acc + _one_path(scene, types_present, sp, p, wo, offs,
                               pixel_sample, sampling_offs,
                               primary_valid & has_diffuse, opts)

    path_col = jax.lax.fori_loop(0, n_paths, path_body, jnp.zeros_like(col))
    col = col + path_col / float(n_paths)

    # background on primary miss
    bg = eval_background(scene.background, rays.d)
    col = jnp.where(primary_valid[..., None], col, bg)
    alpha = jnp.where(primary_valid, 1.0,
                      0.0 if opts.transp_background else 1.0)

    # camera-visible specular chains: same machinery as the direct integrator
    if scene.has_specular and opts.raydepth > 0:
        dopts = direct_mod.DirectOptions(raydepth=opts.raydepth)
        col = col + _specular_chains(scene, types_present, rays, hits, sp, p,
                                     pixel_sample, sampling_offs, opts, dopts)
    return jnp.concatenate([col, alpha[..., None]], axis=-1)


def _specular_chains(scene, types_present, rays, hits, sp, p, pixel_sample,
                     sampling_offs, opts: PathOptions, dopts):
    """Stochastic single-branch specular recursion; each specular hit is
    shaded with full path-traced lighting minus double-counted emission."""
    n = rays.o.shape[0]
    col = jnp.zeros(rays.d.shape, jnp.float32)
    throughput = jnp.ones_like(col)
    cur_sp, cur_p = sp, p
    cur_wo = -rays.d
    active = hits.valid
    exclude = sp.prim
    for depth in range(opts.raydepth):
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
        throughput = throughput * branch_col / jnp.maximum(branch_p, 1e-6)[..., None]

        nrays = Rays(o=cur_sp.p, d=branch_dir,
                     tmin=jnp.full(n, MIN_RAYDIST), tmax=jnp.full(n, -1.0))
        nhits = scene_mod.closest_hit(scene, nrays, exclude_prim=exclude)
        hit_ok = nhits.valid & cont
        bg2 = eval_background(scene.background, branch_dir)
        col = col + jnp.where((cont & ~nhits.valid)[..., None],
                              throughput * bg2, 0.0)

        nsp = scene_mod.surface_points(scene, nrays, nhits)
        np_ = scene_mod.material_params(scene, nsp)
        nwo = -branch_dir
        emit_c = dispatch.emit(types_present, np_)
        has_emit = (np_.flags & BSDF.EMIT) != 0
        scol = jnp.where(has_emit[..., None], emit_c, 0.0)
        nhas_diff = (np_.flags & BSDF.DIFFUSE) != 0
        scol = scol + common.estimate_all_direct(
            scene, types_present, np_, nsp, nwo, pixel_sample, sampling_offs,
            hit_ok & nhas_diff)
        col = col + jnp.where(hit_ok[..., None], throughput * scol, 0.0)
        cur_sp, cur_p = nsp, np_
        cur_wo = nwo
        exclude = nsp.prim
        active = hit_ok
    return col
