"""Bidirectional path tracer, wavefront form.

Reference: src/integrators/bidirpath.cc + include/integrators/bdpt.h —
eye and light subpaths (MAX_PATH_LENGTH bounded), vertex connections
(connectPaths/connectLPath), per-technique weighting, s=1 splats.

TPU-native shape: both subpaths are fixed-depth wavefront loops storing one
vertex record per depth (SoA pytrees, no recursion); every (eye_i, light_j)
vertex pair is connected with one batched visibility kernel launch and two
batched BSDF evals.  Every lane advances in lockstep under masks.

Weighting (documented deviation): the reference weighs techniques by exact
pdf ratios (bidirpath.cc pathWeight); here each complete path of length k is
weighted uniformly over the techniques that can produce length k
(1/n_k, the classic unbiased uniform combination) — same expectation,
higher variance on caustic-heavy scenes.

Strategies per path length k (k segments):
  s=0  eye path hits an emitter            (emission term)
  s=1  next-event estimation at eye vertex (one light sample)
  s>=2 connection eye_i <-> light_j (j = s-1 surface vertices from light)
  t=1  light vertex connected to the camera — splatted into the film's
       light image (the reference's density buffer: bidirpath.cc:239-262
       connectPathE/evalPathE -> imageFilm_t::addDensitySample), merged at
       flush scaled by w*h/n_paths (imagefilm.cc:402,411).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, luminance, MIN_RAYDIST, SHADOW_BIAS
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials.base import BSDF, detach_sample
from core_tpu.integrators import common
from core_tpu.backgrounds import eval_background
from core_tpu.photon import emit as emit_mod


@dataclass(frozen=True)
class BidirOptions:
    eye_depth: int = 3          # eye subpath surface vertices
    light_depth: int = 3        # light subpath surface vertices
    transp_background: bool = False
    do_light_image: bool = True  # t=1 light-tracing splats (_DO_LIGHTIMAGE)


class _Vertex:
    """One wavefront of subpath vertices (host-side container)."""

    def __init__(self, sp, p, wo, throughput, active):
        self.sp = sp
        self.p = p
        self.wo = wo                  # direction toward the previous vertex
        self.throughput = throughput  # [N,3] accumulated weight up to here
        self.active = active


def _walk(scene, types_present, rays, throughput0, active0, depth, base,
          dim0, exclude0=None):
    """Trace a subpath; returns list of _Vertex (one per surface hit)."""
    verts = []
    throughput = throughput0
    active = active0
    exclude = exclude0
    cur = rays
    dim = dim0
    for d in range(depth):
        hits = scene_mod.closest_hit(scene, cur, exclude_prim=exclude)
        active = active & hits.valid
        sp = scene_mod.surface_points(scene, cur, hits)
        p = scene_mod.material_params(scene, sp)
        wo = -cur.d
        verts.append(_Vertex(sp, p, wo, throughput, active))
        if d == depth - 1:
            break
        s1 = qmc.scr_halton(dim, base)
        s2 = qmc.scr_halton(dim + 1, base)
        dim += 2
        sres = detach_sample(dispatch.sample_bsdf(
            types_present, p, sp, wo, s1, s2, BSDF.ALL))
        throughput = throughput * sres.col * sres.w[..., None]
        active = active & (sres.pdf > 0) & (luminance(throughput) > 0)
        cur = Rays(o=sp.p, d=sres.wi,
                   tmin=jnp.full_like(s1, MIN_RAYDIST),
                   tmax=jnp.full_like(s1, -1.0))
        exclude = sp.prim
    return verts


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: BidirOptions):
    """BDPT integrate() for a camera wavefront -> rgba [N,4]."""
    n = rays.o.shape[0]
    base = pixel_sample.astype(jnp.uint32) * np.uint32(7919) + sampling_offs
    n_lights = len(scene.lights)

    # ---- eye subpath ----
    eye = _walk(scene, types_present, rays, jnp.ones((n, 3), jnp.float32),
                jnp.ones(n, bool), opts.eye_depth, base, dim0=2)
    primary_valid = eye[0].active

    # ---- light subpath ----
    light_verts = []
    if n_lights > 0 and opts.light_depth > 0:
        s1 = qmc.scr_halton(20, base)
        s2 = qmc.scr_halton(21, base)
        s3 = qmc.scr_halton(22, base)
        s4 = qmc.scr_halton(23, base)
        pick = jnp.minimum((qmc.scr_halton(24, base)
                            * n_lights).astype(jnp.int32), n_lights - 1)
        from core_tpu.integrators.photonmap import scene_center_radius
        center, radius = scene_center_radius(scene)
        o = jnp.zeros((n, 3))
        d = jnp.zeros((n, 3))
        col = jnp.zeros((n, 3))
        ipdf = jnp.zeros((n,))
        for li, light in enumerate(scene.lights):
            lo, ld, lc, lip = emit_mod.emit_photon(light, s1, s2, s3, s4,
                                                   center, radius)
            m = pick == li
            o = jnp.where(m[..., None], lo, o)
            d = jnp.where(m[..., None], ld, d)
            col = jnp.where(m[..., None], lc, col)
            ipdf = jnp.where(m, lip, ipdf)
        lpow = col * (ipdf * n_lights)[..., None]
        lrays = Rays(o=o, d=d, tmin=jnp.full(n, MIN_RAYDIST),
                     tmax=jnp.full(n, -1.0))
        light_verts = _walk(scene, types_present, lrays, lpow,
                            jnp.ones(n, bool), opts.light_depth, base,
                            dim0=25)

    L = len(light_verts)
    light_image = opts.do_light_image and L > 0 \
        and scene.camera is not None

    def n_strategies(k: int) -> float:
        """Techniques producing a complete length-k path: s=0, s=1,
        connections with j=1..min(L, k-2) light surface vertices, and (when
        the light image is on) the t=1 camera splat for 2 <= k <= L+1."""
        n = 2 + max(0, min(L, k - 2))
        if light_image and 2 <= k <= L + 1:
            n += 1
        return float(n)

    col = jnp.zeros((n, 3), jnp.float32)

    for i, ev in enumerate(eye):
        # path length for emission at this vertex: i+1 segments
        k_emit = i + 1
        emit_c = dispatch.emit(types_present, ev.p)
        has_emit = (ev.p.flags & BSDF.EMIT) != 0
        w = 1.0 / n_strategies(k_emit)
        col = col + jnp.where((ev.active & has_emit)[..., None],
                              ev.throughput * emit_c * w, 0.0)

        # s=1: NEE at this eye vertex; completes a path of i+2 segments
        has_diffuse = (ev.p.flags & BSDF.DIFFUSE) != 0
        nee = common.estimate_one_direct(
            scene, types_present, ev.p, ev.sp, ev.wo,
            base + np.uint32(31 * i), pixel_sample, sampling_offs,
            ev.active & has_diffuse)
        w = 1.0 / n_strategies(i + 2)
        col = col + ev.throughput * nee * w

        # s>=2: connect to every light surface vertex
        for j, lv in enumerate(light_verts):
            k = i + 1 + (j + 1) + 1           # total segments
            w = 1.0 / n_strategies(k)
            delta = lv.sp.p - ev.sp.p
            r2 = jnp.sum(delta * delta, axis=-1)
            r = jnp.sqrt(jnp.maximum(r2, 1e-12))
            cdir = delta / r[..., None]
            cos_e = jnp.abs(dot(ev.sp.n, cdir))
            cos_l = jnp.abs(dot(lv.sp.n, -cdir))
            g = cos_e * cos_l / jnp.maximum(r2, 1e-8)
            f_e = dispatch.eval_bsdf(types_present, ev.p, ev.sp, ev.wo,
                                     cdir, BSDF.ALL)
            f_l = dispatch.eval_bsdf(types_present, lv.p, lv.sp, lv.wo,
                                     -cdir, BSDF.ALL)
            vray = Rays(o=ev.sp.p, d=cdir,
                        tmin=jnp.full(n, SHADOW_BIAS),
                        tmax=r - SHADOW_BIAS)
            shadowed = scene_mod.any_hit(scene, vray, exclude_prim=ev.sp.prim,
                                         exclude_prim2=lv.sp.prim)
            ok = ev.active & lv.active & (~shadowed) & (r2 > 1e-8)
            contrib = ev.throughput * f_e * g[..., None] * f_l \
                * lv.throughput * w
            col = col + jnp.where(ok[..., None], contrib, 0.0)

    # ---- t=1: connect each light vertex to the camera (light image) ----
    splat = None
    if light_image:
        from core_tpu.cameras import project
        cam = scene.camera
        sxs, sys, scols, smasks = [], [], [], []
        for j, lv in enumerate(light_verts):
            k = j + 2                      # light->v0, j internal, v_j->eye
            w = 1.0 / n_strategies(k)
            delta = cam.pos[None] - lv.sp.p
            r2 = jnp.sum(delta * delta, axis=-1)
            r = jnp.sqrt(jnp.maximum(r2, 1e-12))
            dir_le = delta / r[..., None]  # light vertex -> eye
            px, py, cos_e, okp = project(cam, -dir_le)
            f_l = dispatch.eval_bsdf(types_present, lv.p, lv.sp, lv.wo,
                                     dir_le, BSDF.ALL)
            cos_l = jnp.abs(dot(lv.sp.n, dir_le))
            vray = Rays(o=lv.sp.p, d=dir_le,
                        tmin=jnp.full(n, SHADOW_BIAS),
                        tmax=r - SHADOW_BIAS)
            shadowed = scene_mod.any_hit(scene, vray,
                                         exclude_prim=lv.sp.prim)
            # pixel-area-per-solid-angle Jacobian of the image-plane map:
            # the plane sits at distance `focal` with world area
            # 1 x aspect_ratio, so d(normalized pixel area)/dw =
            # focal^2 / (cos^3 * aspect); flush's w*h/n_paths supplies the
            # per-pixel scale (imagefilm.cc:402)
            cos_e3 = jnp.maximum(cos_e, 1e-6) ** 3
            jac = (cam.focal * cam.focal) / (cos_e3 * cam.aspect_ratio)
            contrib = lv.throughput * f_l \
                * (cos_l / jnp.maximum(r2, 1e-8) * jac * w)[..., None]
            ok = lv.active & okp & (~shadowed)
            sxs.append(px)
            sys.append(py)
            scols.append(jnp.where(ok[..., None], contrib, 0.0))
            smasks.append(ok)
        splat = (jnp.concatenate(sxs), jnp.concatenate(sys),
                 jnp.concatenate(scols), jnp.concatenate(smasks),
                 jnp.asarray(float(n), jnp.float32))

    # background on primary miss
    bg = eval_background(scene.background, rays.d) \
        if scene.background is not None else jnp.zeros_like(rays.d)
    col = jnp.where(primary_valid[..., None], col, bg)
    alpha = jnp.where(primary_valid, 1.0,
                      0.0 if opts.transp_background else 1.0)
    return jnp.concatenate([col, alpha[..., None]], axis=-1), splat
