"""Photon map: wavefront shooting + uniform-grid storage + radius gather.

Reference: photon shooting loops in mcIntegrator_t::createCausticMap
(src/yafraycore/mcintegrator.cc:197-383) and photonIntegrator_t::preprocess
(src/integrators/photonintegr.cc:126-640); storage is either a balanced
kd-tree (include/yafraycore/pkdtree.h) or a spatial hash grid
(src/yafraycore/hashgrid.cc).  TPU-native choice (SURVEY §7): a sorted
uniform grid — photons are binned to cells of size = gather radius, sorted
by cell id (one argsort), gathered by scanning the 27 neighbor cells with a
static per-cell photon cap.  Density estimation uses the reference's
`ckernel` quadratic kernel (include/utilities/sample_utils.h:180).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu.mathutils import MIN_RAYDIST
from core_tpu.materials.base import BSDF, detach_sample
from core_tpu.materials import dispatch
from core_tpu.sampling import qmc
from core_tpu import scene as scene_mod
from core_tpu.photon import emit as emit_mod

MAX_PER_CELL = 32


class PhotonMap(NamedTuple):
    pos: jnp.ndarray        # [P,3]
    power: jnp.ndarray      # [P,3] flux
    dirn: jnp.ndarray       # [P,3] incoming direction
    valid: jnp.ndarray      # [P] bool
    order: jnp.ndarray      # [P] i32 photon ids sorted by cell
    cell_start: jnp.ndarray  # [C+2] i32 CSR offsets (last bucket: invalid)
    bmin: jnp.ndarray       # [3]
    inv_cell: jnp.ndarray   # []
    dims: tuple             # static (nx, ny, nz)
    n_valid: jnp.ndarray    # [] i32


def shoot_photons(scene, types_present, n_photons: int, max_bounces: int,
                  seed: int, mode: str,
                  scene_center, scene_radius, with_surface: bool = False,
                  start_index=0, power_norm: int | None = None):
    """Trace a photon wavefront; returns per-deposit arrays
    (pos, power, dirn, valid) of shape [(max_bounces+1) * n_photons, ...].
    with_surface=True appends (normal, albedo) per deposit — the surface
    data the radiance-map precompute needs (photonintegr.cc:574
    radiancePhoton gathering evaluates the deposit surface's BRDF).

    mode selects the deposit rule via the reference's per-photon
    direct/caustic flag state machine (photonintegr.cc:253-254,318-320;
    sppm.cc:387-403,433-434).  Flags start direct=True, caustic=False and
    update after every scatter with sampled flags f:
        caustic' = (f & (GLOSSY|SPECULAR|DISPERSIVE)) & direct
                 | (f & (GLOSSY|SPECULAR|FILTER|DISPERSIVE)) & caustic
        direct'  = (f & FILTER) & direct
    Deposit conditions:
      "diffuse": DIFFUSE surface & !caustic           (photonintegr.cc:285;
                 direct photons ARE stored — final gather consumes them at
                 secondary hits)
      "caustic": (DIFFUSE|GLOSSY) surface & caustic   (mcintegrator.cc:309-
                 312; photons that are neither caustic nor direct die,
                 mcintegrator.cc:339)
      "sppm":    !direct & (!caustic & DIFFUSE
                            | caustic & (DIFFUSE|GLOSSY))  (sppm.cc:387,403
                 — direct light is estimated by the SPPM eye pass, so
                 direct photons must NOT enter the map)

    Photon power is additionally attenuated through absorbing interiors
    (Beer; the reference routes this through the material volume handler
    at photonintegr.cc:270-276) and dispersive scatters go monochromatic
    with a per-photon wavelength (photonintegr.cc:472-479).

    Light choice: uniform over scene lights with 1/k pdf compensation (the
    reference picks by a power CDF, photonintegr.cc:160; uniform keeps the
    build jit-only — documented deviation, same expectation).
    """
    assert mode in ("diffuse", "caustic", "sppm"), mode
    n_lights = len(scene.lights)
    assert n_lights > 0
    # seed may be a traced scalar (SPPM threads its pass index in so each
    # pass shoots a fresh photon population, sppm.cc prePass per-pass QMC)
    # start_index/power_norm: device-sharded shooting (sharding.py
    # render_sppm_rowsharded) — shard k traces photons
    # [k*m, (k+1)*m) of the SAME global QMC stream and normalizes by the
    # total population, so the merged map is identical to one device
    # shooting power_norm photons
    base = (jnp.arange(n_photons, dtype=jnp.uint32)
            + jnp.asarray(start_index, jnp.uint32)
            + jnp.asarray(seed, jnp.uint32) * np.uint32(77771))

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
    for li, light in enumerate(scene.lights):
        lo, ld, lc, lip = emit_mod.emit_photon(light, s1, s2, s3, s4,
                                               scene_center, scene_radius)
        m = (pick == li)
        o = jnp.where(m[..., None], lo, o)
        d = jnp.where(m[..., None], ld, d)
        col = jnp.where(m[..., None], lc, col)
        ipdf = jnp.where(m, lip, ipdf)

    # photon power (mcintegrator.cc:262): col * ipdf * nLights / nPhotons
    power = col * (ipdf * n_lights
                   / (power_norm or n_photons))[..., None]
    alive = jnp.ones(n_photons, bool)
    direct = jnp.ones(n_photons, bool)     # photonintegr.cc:254
    caustic = jnp.zeros(n_photons, bool)   # photonintegr.cc:253

    # per-photon wavelength for dispersive scatters (photonintegr.cc:472)
    from core_tpu.materials.base import MatType as _MT
    disperse_possible = int(_MT.GLASS) in [int(t) for t in types_present]
    chromatic = jnp.zeros(n_photons, bool)
    wl = qmc.scr_halton(47, base)

    dep_pos, dep_pow, dep_dir, dep_ok = [], [], [], []
    dep_nrm, dep_alb = [], []
    rays = Rays(o=o, d=d, tmin=jnp.full(n_photons, MIN_RAYDIST),
                tmax=jnp.full(n_photons, -1.0))
    exclude = None
    for bounce in range(max_bounces + 1):
        hits = scene_mod.closest_hit(scene, rays, exclude_prim=exclude)
        alive = alive & hits.valid
        sp = scene_mod.surface_points(scene, rays, hits)
        p = scene_mod.material_params(scene, sp)
        wo = -rays.d
        # Beer attenuation through absorbing interiors: a backface hit
        # means the segment just traveled ran inside the hit object (the
        # reference asks the previous material's volume handler,
        # photonintegr.cc:270-276; equivalent for closed single-material
        # objects)
        if bounce > 0:
            inside = jnp.sum(sp.ng * wo, axis=-1) < 0.0
            att = jnp.exp(-p.absorption * hits.t[..., None])
            power = jnp.where((alive & inside)[..., None], power * att,
                              power)
        is_diffuse = (p.flags & BSDF.DIFFUSE) != 0
        has_dg = (p.flags & (BSDF.DIFFUSE | BSDF.GLOSSY)) != 0
        if mode == "diffuse":
            deposit = alive & is_diffuse & (~caustic)
        elif mode == "caustic":
            deposit = alive & has_dg & caustic
        else:  # sppm
            deposit = alive & (~direct) & (
                ((~caustic) & is_diffuse) | (caustic & has_dg))
        dep_pos.append(sp.p)
        dep_pow.append(power)
        dep_dir.append(rays.d)
        dep_ok.append(deposit)
        if with_surface:
            dep_nrm.append(sp.n)
            # this framework's eval() convention omits the Lambert 1/pi
            # (shinydiffuse.py docstring), so eval(n, n) IS the albedo —
            # same factor the direct final-gather path applies
            dep_alb.append(dispatch.eval_bsdf(
                types_present, p, sp, sp.n, sp.n, BSDF.ALL))

        if bounce == max_bounces:
            break
        # dispersion: Cauchy IOR + one-shot wl2rgb on dispersive glass
        # (photonintegr.cc:472-479 chromatic handling)
        if disperse_possible:
            from core_tpu.integrators.raytrace import apply_dispersion
            p, chromatic, power = apply_dispersion(p, chromatic, wl, power)
        # scatter (material_t::scatterPhoton default MC, material.cc:77)
        bs1 = qmc.scr_halton(5 + 2 * bounce, base)
        bs2 = qmc.scr_halton(6 + 2 * bounce, base)
        sres = detach_sample(dispatch.sample_bsdf(
            types_present, p, sp, wo, bs1, bs2, BSDF.ALL))
        new_power = power * sres.col * sres.w[..., None]
        # russian roulette on throughput ratio
        lum_new = jnp.mean(new_power, axis=-1)
        lum_old = jnp.maximum(jnp.mean(power, axis=-1), 1e-12)
        keep_p = jnp.clip(lum_new / lum_old, 0.05, 1.0)
        rr = qmc.scr_halton(7 + 2 * bounce, base)
        alive = alive & (sres.pdf > 0) & (rr < keep_p)
        power = new_power / keep_p[..., None]
        # flag transitions (photonintegr.cc:318-320)
        f = sres.flags
        caus_set = (f & (BSDF.GLOSSY | BSDF.SPECULAR
                         | BSDF.DISPERSIVE)) != 0
        caus_keep = (f & (BSDF.GLOSSY | BSDF.SPECULAR | BSDF.FILTER
                          | BSDF.DISPERSIVE)) != 0
        caustic = (caus_set & direct) | (caus_keep & caustic)
        direct = ((f & BSDF.FILTER) != 0) & direct
        if mode == "caustic":
            # caustic-only shoot can stop once neither flag holds
            # (mcintegrator.cc:339)
            alive = alive & (caustic | direct)
        rays = Rays(o=sp.p, d=sres.wi,
                    tmin=jnp.full(n_photons, MIN_RAYDIST),
                    tmax=jnp.full(n_photons, -1.0))
        exclude = sp.prim

    out = (jnp.concatenate(dep_pos), jnp.concatenate(dep_pow),
           jnp.concatenate(dep_dir), jnp.concatenate(dep_ok))
    if with_surface:
        out = out + (jnp.concatenate(dep_nrm), jnp.concatenate(dep_alb))
    return out


def build_photon_grid(pos, power, dirn, valid, radius: float,
                      bmin, bmax) -> PhotonMap:
    """Sort photons into a uniform grid with cell size = gather radius.

    bmin/bmax must be HOST values (numpy/tuple): the grid dimensions are
    static shape parameters, so they cannot be traced.
    """
    bmin_np = np.asarray(bmin, np.float64)
    bmax_np = np.asarray(bmax, np.float64)
    extent = np.maximum(bmax_np - bmin_np, 1e-6)
    dims = tuple(int(min(256, max(1, np.ceil(e / radius))))
                 for e in extent)
    bmin = jnp.asarray(bmin_np, jnp.float32)
    nx, ny, nz = dims
    inv_cell = jnp.asarray(1.0 / radius, jnp.float32)

    rel = (pos - bmin[None]) * inv_cell
    ix = jnp.clip(rel[..., 0].astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(rel[..., 1].astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(rel[..., 2].astype(jnp.int32), 0, nz - 1)
    cell = (ix * ny + iy) * nz + iz
    n_cells = nx * ny * nz
    cell = jnp.where(valid, cell, n_cells)          # invalid -> spill bucket
    order = jnp.argsort(cell)
    sorted_cells = cell[order]
    cell_start = jnp.searchsorted(sorted_cells,
                                  jnp.arange(n_cells + 2, dtype=cell.dtype))
    return PhotonMap(pos=pos, power=power, dirn=dirn, valid=valid,
                     order=order.astype(jnp.int32),
                     cell_start=cell_start.astype(jnp.int32),
                     bmin=bmin, inv_cell=inv_cell, dims=dims,
                     n_valid=jnp.sum(valid.astype(jnp.int32)))


def gather_photons(pmap: PhotonMap, q, qn, radius: float,
                   max_per_cell: int = MAX_PER_CELL):
    """Radius gather around query points q [N,3] with surface normals qn.

    Returns (flux_sum [N,3], count [N]) — kernel-weighted flux of photons
    within `radius` whose direction opposes the surface normal (same
    filtering as photonIntegrator_t::integrate, photonintegr.cc:791-860).

    Density cap: at most max_per_cell photons per cell are inspected, but
    each inspected photon's contribution is scaled by k/m (k = photons in
    the cell, m = inspected) — an unbiased subsample compensation: photon
    order within a cell is the emission order, independent of position,
    so the first m are a random sample.  Without it, dense maps (say 200k
    photons at radius 40 in a Cornell box: ~2,400 photons/cell) would
    undercount flux ~5-8x.
    """
    nx, ny, nz = pmap.dims
    rel = (q - pmap.bmin[None]) * pmap.inv_cell
    ix = jnp.clip(rel[..., 0].astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(rel[..., 1].astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(rel[..., 2].astype(jnp.int32), 0, nz - 1)
    r2 = radius * radius
    flux = jnp.zeros(q.shape, jnp.float32)
    count = jnp.zeros(q.shape[:-1], jnp.float32)
    n_photons = pmap.order.shape[0]
    for dxc in (-1, 0, 1):
        for dyc in (-1, 0, 1):
            for dzc in (-1, 0, 1):
                cx = jnp.clip(ix + dxc, 0, nx - 1)
                cy = jnp.clip(iy + dyc, 0, ny - 1)
                cz = jnp.clip(iz + dzc, 0, nz - 1)
                cid = (cx * ny + cy) * nz + cz
                start = pmap.cell_start[cid]
                end = pmap.cell_start[cid + 1]
                in_cell_n = (end - start).astype(jnp.float32)
                # unbiased subsample compensation (docstring)
                comp = jnp.maximum(in_cell_n, 1.0) \
                    / jnp.minimum(jnp.maximum(in_cell_n, 1.0),
                                  float(max_per_cell))

                def body(k, carry):
                    flux, count = carry
                    slot = jnp.clip(start + k, 0, n_photons - 1)
                    pid = pmap.order[slot]
                    in_cell = (start + k) < end
                    pp = pmap.pos[pid]
                    dvec = pp - q
                    d2 = jnp.sum(dvec * dvec, axis=-1)
                    facing = jnp.sum(pmap.dirn[pid] * qn, axis=-1) < 0.0
                    ok = in_cell & (d2 < r2) & facing & pmap.valid[pid]
                    # ckernel quadratic kernel (sample_utils.h:184)
                    w = 3.0 / (r2 * np.pi) * (1.0 - d2 / r2) * comp
                    flux = flux + jnp.where(ok[..., None],
                                            pmap.power[pid] * w[..., None],
                                            0.0)
                    count = count + jnp.where(ok, comp, 0.0)
                    return flux, count

                flux, count = jax.lax.fori_loop(0, max_per_cell, body,
                                                (flux, count))
    return flux, count.astype(jnp.int32)


def estimate_irradiance(pmap: PhotonMap, q, qn, radius: float):
    """Kernel density estimate -> irradiance [N,3] (estimateCausticPhotons,
    mcintegrator.cc:384; the kernel already normalizes by pi r^2)."""
    flux, _ = gather_photons(pmap, q, qn, radius)
    return flux


class RadianceCache(NamedTuple):
    """Per-cell precomputed outgoing radiance — the TPU analog of the
    reference's radiance map (photonintegr.cc:42-107,574: irradiance
    pre-gathered at photon positions by worker threads, looked up by
    nearest radiance photon during final gathering).  Gridded: one value
    per photon-grid cell means a final-gather ray pays ONE table gather
    instead of a full 27-cell density estimate."""
    cell_rad: jnp.ndarray   # [C,3] mean albedo/pi * irradiance per cell
    bmin: jnp.ndarray       # [3]
    inv_cell: jnp.ndarray   # []
    dims: tuple             # static (nx, ny, nz)


def build_radiance_cache(pmap: PhotonMap, normal, albedo,
                         radius: float) -> RadianceCache:
    """Precompute per-cell outgoing radiance from a built photon grid.

    normal/albedo: per-photon surface data from shoot_photons
    (with_surface=True).  Radiance of a deposit = albedo/pi * E(pos, n);
    cells average their deposits' radiance (empty cells -> 0).
    """
    irr = estimate_irradiance(pmap, pmap.pos, normal, radius)
    rad = albedo * irr / np.pi
    nx, ny, nz = pmap.dims
    rel = (pmap.pos - pmap.bmin[None]) * pmap.inv_cell
    ix = jnp.clip(rel[..., 0].astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(rel[..., 1].astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(rel[..., 2].astype(jnp.int32), 0, nz - 1)
    cid = (ix * ny + iy) * nz + iz
    n_cells = nx * ny * nz
    w = pmap.valid.astype(jnp.float32)
    sums = jnp.zeros((n_cells, 3), jnp.float32).at[cid].add(
        rad * w[..., None])
    counts = jnp.zeros((n_cells,), jnp.float32).at[cid].add(w)
    cell_rad = sums / jnp.maximum(counts, 1.0)[..., None]
    return RadianceCache(cell_rad=cell_rad, bmin=pmap.bmin,
                         inv_cell=pmap.inv_cell, dims=pmap.dims)


def lookup_radiance(cache: RadianceCache, q):
    """One-gather cell lookup of precomputed outgoing radiance [N,3]."""
    nx, ny, nz = cache.dims
    rel = (q - cache.bmin[None]) * cache.inv_cell
    ix = jnp.clip(rel[..., 0].astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(rel[..., 1].astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(rel[..., 2].astype(jnp.int32), 0, nz - 1)
    cid = (ix * ny + iy) * nz + iz
    return cache.cell_rad[cid]
