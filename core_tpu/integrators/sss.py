"""Subsurface scattering: volumetric photon tracing + dipole diffusion.

TheBounty's distinguishing feature over stock YafaRay (reference
src/yafraycore/mcintegrator.cc): createSSSMapsByPhotonTracing (:936) traces
photons from the lights, refracts them into `translucent` objects and stores
interior scatter events per object; estimateSSSMaps (:1457) then sums the
classic Jensen dipole diffusion profile RdQdRm (:1257) over the stored
photons at each camera hit on a translucent surface.

TPU-native design:
- photon tracing is a fixed-depth wavefront loop (like photon/map.py):
  surface bounces interleaved with interior random-walk steps; every lane
  advances in lockstep, masks select translucent-interior lanes.
- the dipole gather is NOT a k-NN query: all stored photons contribute
  (the dipole kernel decays exponentially), so the estimate is an exact
  sum evaluated with an MXU matmul for the pairwise distances
  (r^2 = |x|^2 + |xi|^2 - 2 x.xi) and a per-channel matvec against photon
  powers — no kd-tree, no gather ops.

Deviations from the reference (documented): photons that exit the medium
terminate instead of continuing outside; single-scattering inside the
medium (estimateSSSSingleSImportantSampling, :1622) is approximated by the
dipole term.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import (dot, normalize, refract_dir, create_cs,
                                fresnel_dielectric, MIN_RAYDIST)
from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.sampling import qmc
from core_tpu.materials import dispatch
from core_tpu.materials.base import BSDF, MatType, detach_sample
from core_tpu.photon import emit as emit_mod


class SSSMap(NamedTuple):
    """Interior photon deposits. pos [P,3], power [P,3], obj [P], valid [P]."""
    pos: jnp.ndarray
    power: jnp.ndarray
    obj: jnp.ndarray
    valid: jnp.ndarray


def _sample_hg(d, g, s1, s2):
    """Henyey-Greenstein direction around d (reference samplePhaseFunc)."""
    g = jnp.clip(g, -0.999, 0.999)
    iso = jnp.abs(g) < 1e-3
    cos_t_iso = 1.0 - 2.0 * s1
    sq = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * s1, 1e-6)
    cos_t_hg = (1.0 + g * g - sq * sq) / jnp.maximum(2.0 * g, 1e-6)
    cos_t = jnp.clip(jnp.where(iso, cos_t_iso, cos_t_hg), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * np.pi * s2
    u, v = create_cs(d)
    return normalize(u * (sin_t * jnp.cos(phi))[..., None]
                     + v * (sin_t * jnp.sin(phi))[..., None]
                     + d * cos_t[..., None])


def build_sss_map(scene, types_present, n_photons: int = 8192,
                  surface_bounces: int = 2, interior_steps: int = 4,
                  seed: int = 0) -> SSSMap:
    """Trace photons into translucent objects; returns interior deposits.

    Mirrors createSSSMapsByPhotonTracing (mcintegrator.cc:936): emit from
    lights (uniform light pick, 1/k compensated), refract into TRANSLUCENT
    surfaces, exponential free-flight sampling with sigma_t, deposit at each
    interior scatter event with albedo-attenuated power, HG redirection."""
    n_lights = len(scene.lights)
    assert n_lights > 0
    base = jnp.arange(n_photons, dtype=jnp.uint32) + np.uint32(seed * 77771)
    s1 = qmc.ri_vdc(base)
    s2 = qmc.scr_halton(2, base)
    s3 = qmc.scr_halton(3, base)
    s4 = qmc.scr_halton(4, base)
    pick = jnp.minimum((qmc.scr_halton(5, base) * n_lights).astype(jnp.int32),
                       n_lights - 1)
    o = jnp.zeros((n_photons, 3))
    d = jnp.zeros((n_photons, 3))
    col = jnp.zeros((n_photons, 3))
    ipdf = jnp.zeros((n_photons,))
    from core_tpu.integrators.photonmap import scene_center_radius
    center, radius = scene_center_radius(scene)
    for li, light in enumerate(scene.lights):
        lo, ld, lc, lip = emit_mod.emit_photon(light, s1, s2, s3, s4,
                                               center, radius)
        m = (pick == li)
        o = jnp.where(m[..., None], lo, o)
        d = jnp.where(m[..., None], ld, d)
        col = jnp.where(m[..., None], lc, col)
        ipdf = jnp.where(m, lip, ipdf)
    power = col * (ipdf * n_lights / n_photons)[..., None]
    alive = jnp.ones(n_photons, bool)

    dep_pos, dep_pow, dep_obj, dep_ok = [], [], [], []
    rays = Rays(o=o, d=d, tmin=jnp.full(n_photons, MIN_RAYDIST),
                tmax=jnp.full(n_photons, -1.0))
    exclude = None
    dim = 6
    for bounce in range(surface_bounces):
        hits = scene_mod.closest_hit(scene, rays, exclude_prim=exclude)
        alive = alive & hits.valid
        sp = scene_mod.surface_points(scene, rays, hits)
        p = scene_mod.material_params(scene, sp)
        wo = -rays.d
        is_sss = alive & (p.mtype == int(MatType.TRANSLUCENT))

        # --- interior walk for translucent lanes ---
        # refract in; Fresnel transmission weight (mcintegrator.cc:1050)
        cos_i = jnp.abs(dot(sp.n, wo))
        kr = fresnel_dielectric(cos_i, p.ior)
        rvalid, rdir = refract_dir(sp.n, wo, p.ior)
        in_dir = jnp.where(rvalid[..., None], rdir, -wo)
        in_pos = sp.p
        in_pow = power * (1.0 - kr)[..., None]
        in_alive = is_sss
        sigma_t = jnp.maximum(
            jnp.mean(p.absorption + p.sigma_s, axis=-1), 1e-4)
        albedo = p.sigma_s / jnp.maximum(p.absorption + p.sigma_s, 1e-6)
        for step in range(interior_steps):
            u = qmc.scr_halton(dim, base)
            u2 = qmc.scr_halton(dim + 1, base)
            u3 = qmc.scr_halton(dim + 2, base)
            dim += 3
            dist = -jnp.log(jnp.maximum(1.0 - u, 1e-7)) / sigma_t
            # exit check: photon leaves the object before the scatter point
            irays = Rays(o=in_pos, d=in_dir,
                         tmin=jnp.full(n_photons, MIN_RAYDIST),
                         tmax=jnp.full(n_photons, -1.0))
            ihits = scene_mod.closest_hit(scene, irays)
            exits = ihits.valid & (ihits.t < dist)
            in_alive = in_alive & (~exits) & ihits.valid
            in_pos = in_pos + in_dir * dist[..., None]
            in_pow = in_pow * albedo
            dep_pos.append(in_pos)
            dep_pow.append(in_pow)
            dep_obj.append(sp.obj)
            dep_ok.append(in_alive)
            in_dir = _sample_hg(in_dir, p.sss_g, u2, u3)

        # --- non-translucent lanes: ordinary scatter and continue ---
        bs1 = qmc.scr_halton(dim, base)
        bs2 = qmc.scr_halton(dim + 1, base)
        dim += 2
        sres = detach_sample(dispatch.sample_bsdf(
            types_present, p, sp, wo, bs1, bs2, BSDF.ALL))
        power = power * sres.col * sres.w[..., None]
        alive = alive & (~is_sss) & (sres.pdf > 0)
        rays = Rays(o=sp.p, d=sres.wi,
                    tmin=jnp.full(n_photons, MIN_RAYDIST),
                    tmax=jnp.full(n_photons, -1.0))
        exclude = sp.prim

    return SSSMap(pos=jnp.concatenate(dep_pos),
                  power=jnp.concatenate(dep_pow),
                  obj=jnp.concatenate(dep_obj),
                  valid=jnp.concatenate(dep_ok))


def dipole_rd_1ch(r2, sigma_a, sigma_s, g, ior):
    """Jensen et al. 2001 dipole diffusion profile Rd(r), one color channel
    (reference RdQdRm, mcintegrator.cc:1257).  r2: [N,C]; coeffs: [N,1]."""
    sigma_sp = sigma_s * (1.0 - g)
    sigma_tp = jnp.maximum(sigma_a + sigma_sp, 1e-6)
    alpha_p = sigma_sp / sigma_tp
    sigma_tr = jnp.sqrt(3.0 * sigma_a * sigma_tp)
    fdr = -1.440 / (ior * ior) + 0.710 / ior + 0.668 + 0.0636 * ior
    a_coef = (1.0 + fdr) / jnp.maximum(1.0 - fdr, 1e-6)
    zr = 1.0 / sigma_tp
    zv = zr * (1.0 + 4.0 / 3.0 * a_coef)
    dr = jnp.sqrt(r2 + zr * zr)
    dv = jnp.sqrt(r2 + zv * zv)
    c1 = zr * (sigma_tr * dr + 1.0) * jnp.exp(-sigma_tr * dr) \
        / (sigma_tp * dr ** 3)
    c2 = zv * (sigma_tr * dv + 1.0) * jnp.exp(-sigma_tr * dv) \
        / (sigma_tp * dv ** 3)
    return jnp.maximum(alpha_p / (4.0 * np.pi) * (c1 + c2), 0.0)


def estimate_sss(sss_map: SSSMap, sp, p, wo, active, chunk: int = 256):
    """Dipole-diffusion radiance at translucent surface points -> [N,3]
    (reference estimateSSSMaps, mcintegrator.cc:1457).

    Pairwise distances via one MXU matmul per photon chunk:
    r^2 = |x|^2 + |xi|^2 - 2 x.xi; per-channel Rd matvec'd against photon
    powers.  Photons only couple to hits on the same object id."""
    n = sp.p.shape[0]
    is_sss = active & (p.mtype == int(MatType.TRANSLUCENT))
    x = sp.p                                     # [N,3]
    x2 = jnp.sum(x * x, axis=-1)                 # [N]
    total = [jnp.zeros((n,), jnp.float32) for _ in range(3)]
    P = sss_map.pos.shape[0]
    hi = jax.lax.Precision.HIGHEST
    for c0 in range(0, P, chunk):
        xi = sss_map.pos[c0:c0 + chunk]          # [C,3]
        pw = sss_map.power[c0:c0 + chunk]        # [C,3]
        ok = sss_map.valid[c0:c0 + chunk]
        same = sss_map.obj[c0:c0 + chunk][None, :] == sp.obj[:, None]
        xi2 = jnp.sum(xi * xi, axis=-1)
        cross = jnp.dot(x, xi.T, precision=hi)   # [N,C] MXU
        r2 = jnp.maximum(x2[:, None] + xi2[None, :] - 2.0 * cross, 0.0)
        w = (ok[None, :] & same).astype(jnp.float32)
        for k in range(3):
            rd = dipole_rd_1ch(r2, p.absorption[:, k:k + 1],
                               p.sigma_s[:, k:k + 1], p.sss_g[:, None],
                               p.ior[:, None])              # [N,C]
            total[k] = total[k] + jnp.dot(rd * w, pw[:, k], precision=hi)
    # outgoing Fresnel transmission (mcintegrator.cc:1530)
    ft = 1.0 - fresnel_dielectric(jnp.abs(dot(sp.n, wo)), p.ior)
    col = jnp.stack(total, axis=-1) * ft[..., None] / np.pi
    return jnp.where(is_sss[..., None], col, 0.0)
