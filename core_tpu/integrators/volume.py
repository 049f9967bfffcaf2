"""Volume integrators: emission-only and single-scattering ray marching.

Reference: src/integrators/EmissionIntegrator.cc (emission + tau
transmittance) and src/integrators/SingleScatterIntegrator.cc (fixed-step
march, per-step light sampling with geometric shadow + volumetric
attenuation, Schlick phase).  The reference's adaptive stepping and
per-light attenuation-grid cache ("optimize" mode) map to a static step
count here (TPU static shapes).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu.mathutils import SHADOW_BIAS
from core_tpu.volumes import regions as vr
from core_tpu.lights import base as light_base


@dataclass(frozen=True)
class VolumeOptions:
    integrator: str = "none"      # none | emission | singlescatter | sky
    steps: int = 16               # march steps per volume
    step_size: float = 1.0        # reference stepSize (world units); the
    #                               builder converts it to `steps` from the
    #                               volume bounds (static TPU march count)
    # SkyIntegrator params (SkyIntegrator.cc factory :264-272)
    sky_alpha: float = 0.5        # exponential density steepness
    sky_scale: float = 0.1        # reference "sigma_t" (world scale)
    sky_turbidity: float = 3.0
    # SingleScatter "optimize" mode (SingleScatterIntegrator.cc:16,
    # 494-496 + volume.h attenuationGridMap): per-light volumetric
    # attenuation is precomputed on a grid over each volume's bounds and
    # looked up trilinearly during the march instead of re-marching a
    # transmittance ray per step per light
    optimize: bool = False
    att_grid_res: int = 16        # reference attgridScale-sized grid


# march resolution for volumetric attenuation of surface-NEE shadow rays
# (the reference runs the full volume integrator per light sample,
# mcintegrator.cc:96,131,181; a shorter fixed march bounds the cost of the
# batched NEE wavefront)
NEE_VOL_STEPS = 8


def transmittance_nee_s(scene, o3, wi3, dist, steps: int = NEE_VOL_STEPS):
    """Volumetric attenuation along surface-NEE shadow rays, SoA inputs.

    o3/wi3: V3 [N] origin/direction; dist: [N] light distance (<= 0 means
    unbounded — bg/sun sentinel).  Returns [N,3] transmittance.
    Reference: doLightEstimation multiplies every light sample by
    scene->volIntegrator->transmittance (mcintegrator.cc:96,131,181).
    """
    from core_tpu import vec
    o = vec.aos(o3)
    d = vec.aos(wi3)
    n = dist.shape[0]
    tmax = jnp.where(dist > 0, dist, 3.0e38)
    rays = Rays(o=o, d=d, tmin=jnp.full(n, SHADOW_BIAS), tmax=tmax)
    return transmittance(scene, rays, steps=steps)


def transmittance(scene, rays: Rays, steps: int = 16) -> jnp.ndarray:
    """exp(-sum tau) over all scene volumes -> [N,3]."""
    if not scene.volumes:
        return jnp.ones(rays.o.shape, jnp.float32)
    acc = jnp.zeros(rays.o.shape, jnp.float32)
    for vol in scene.volumes:
        acc = acc + vr.tau(vol, rays, n_steps=steps)
    return jnp.exp(-acc)


def precompute_attenuation(scene, opts: VolumeOptions):
    """Per-(volume, light) attenuation grids (the reference's
    attenuationGridMap filled by SingleScatter's optimize mode).  Returns
    a tuple of [L, R, R, R, 3] transmittance grids (one per volume) or
    None when disabled.  Runs once per render, outside the chunk loop."""
    if opts.integrator != "singlescatter" or not opts.optimize \
            or not scene.volumes or not scene.lights:
        return None
    r = opts.att_grid_res
    grids = []
    for vol in scene.volumes:
        fr = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
        gx = vol.bmin[0] + fr * (vol.bmax[0] - vol.bmin[0])
        gy = vol.bmin[1] + fr * (vol.bmax[1] - vol.bmin[1])
        gz = vol.bmin[2] + fr * (vol.bmax[2] - vol.bmin[2])
        X, Y, Z = jnp.meshgrid(gx, gy, gz, indexing="ij")
        pts = jnp.stack([X.reshape(-1), Y.reshape(-1), Z.reshape(-1)], -1)
        fake_sp = _point_sp(pts)
        per_light = []
        for light in scene.lights:
            if light_base.dirac(light):
                ls = light_base.illuminate(light, fake_sp)
            else:
                s = jnp.full(pts.shape[0], 0.5, jnp.float32)
                ls = light_base.illum_sample(light, fake_sp, s, s)
            sray = Rays(o=pts, d=ls.wi,
                        tmin=jnp.full(pts.shape[0], SHADOW_BIAS),
                        tmax=jnp.where(ls.dist > 0,
                                       ls.dist - SHADOW_BIAS, -1.0))
            tr = transmittance(scene, sray, steps=opts.steps)
            per_light.append(tr.reshape(r, r, r, 3))
        grids.append(jnp.stack(per_light))
    return tuple(grids)


def _att_lookup(grid, bmin, bmax, p):
    """Trilinear [R,R,R,3] attenuation lookup at world points p [N,3]."""
    r = grid.shape[0]
    f = (p - bmin[None]) / jnp.maximum(bmax - bmin, 1e-9)[None] * r - 0.5
    f = jnp.clip(f, 0.0, r - 1.0)
    i0 = jnp.floor(f).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, r - 1)
    w = f - i0.astype(jnp.float32)
    out = 0.0
    for dx_ in (0, 1):
        for dy_ in (0, 1):
            for dz_ in (0, 1):
                ix = i1[..., 0] if dx_ else i0[..., 0]
                iy = i1[..., 1] if dy_ else i0[..., 1]
                iz = i1[..., 2] if dz_ else i0[..., 2]
                wt = (w[..., 0] if dx_ else 1 - w[..., 0]) \
                    * (w[..., 1] if dy_ else 1 - w[..., 1]) \
                    * (w[..., 2] if dz_ else 1 - w[..., 2])
                out = out + grid[ix, iy, iz] * wt[..., None]
    return out


def integrate(scene, rays: Rays, hits_t, pixel_sample, sampling_offs,
              opts: VolumeOptions, vol_aux=None) -> jnp.ndarray:
    """In-scattered (+emitted) radiance along camera rays -> [N,3].

    hits_t: [N] surface-hit distance (<0 => miss/unbounded) caps the march.
    vol_aux: precompute_attenuation grids (optimize mode).
    """
    if not scene.volumes or opts.integrator == "none":
        return jnp.zeros(rays.o.shape, jnp.float32)
    capped = Rays(o=rays.o, d=rays.d, tmin=rays.tmin,
                  tmax=jnp.where(hits_t > 0, hits_t, rays.tmax))
    col = jnp.zeros(rays.o.shape, jnp.float32)
    for vol_idx, vol in enumerate(scene.volumes):
        hit, t0, t1 = vr.cross_bb(vol, capped)
        dt = (t1 - t0) / opts.steps
        trans = jnp.ones(rays.o.shape, jnp.float32)
        vcol = jnp.zeros(rays.o.shape, jnp.float32)
        for i in range(opts.steps):
            # sample at the step START and include the CURRENT step's
            # extinction in the accumulated transmittance before adding
            # its in-scatter — the reference's exact loop shape
            # (SingleScatterIntegrator.cc:415-460: stepTau += sigma_t *
            # step; trTmp = exp(-stepTau); result += trTmp * ... * step)
            t = t0 + i * dt
            p = rays.o + rays.d * t[..., None]
            st = vr.sigma_t(vol, p)
            trans = trans * jnp.exp(-st * dt[..., None])
            vcol = vcol + trans * vr.emission(vol, p) * dt[..., None]
            if opts.integrator == "singlescatter":
                ss = vr.sigma_s(vol, p)
                fake_sp = _point_sp(p)
                for li, light in enumerate(scene.lights):
                    if light_base.dirac(light):
                        ls = light_base.illuminate(light, fake_sp)
                    else:
                        # one deterministic sample per step (the reference
                        # uses per-light sample loops; 1 is its default)
                        s1 = jnp.full(p.shape[:-1], 0.5, jnp.float32)
                        ls = light_base.illum_sample(light, fake_sp, s1, s1)
                    from core_tpu import scene as scene_mod
                    sray = Rays(o=p, d=ls.wi,
                                tmin=jnp.full(p.shape[:-1], SHADOW_BIAS),
                                tmax=ls.dist - SHADOW_BIAS)
                    shadowed = scene_mod.any_hit(scene, sray)
                    if vol_aux is not None:
                        ltr = _att_lookup(vol_aux[vol_idx][li],
                                          vol.bmin, vol.bmax, p)
                    else:
                        ltr = transmittance(scene, sray,
                                            steps=max(4, opts.steps // 4))
                    # NO phase factor: the reference's single-scatter
                    # never evaluates VolumeRegion::p() — getInScatter
                    # returns sum(lightTr * lcol / pdf) and each step
                    # adds trTmp * inScatter * sigma_s * step
                    # (SingleScatterIntegrator.cc:152-280,460).  The
                    # round-5 volume golden measured the physically-
                    # normalized HG/(4pi) factor 12.6x darker than the
                    # oracle, so parity means matching the convention.
                    contrib = ss * ls.col * ltr \
                        / jnp.maximum(ls.pdf, 1e-12)[..., None]
                    ok = ls.valid & (~shadowed) & hit
                    vcol = vcol + jnp.where(ok[..., None],
                                            trans * contrib * dt[..., None],
                                            0.0)
        col = col + jnp.where(hit[..., None], vcol, 0.0)
    # the reference CLAMPS the in-scatter to [0,1] before returning
    # ("povman test: clamping all color values to right range",
    # SingleScatterIntegrator.cc:484 clampRGBA01) — bright shafts
    # saturate at 1.0 in TheBounty and the golden encodes that
    return jnp.clip(col, 0.0, 1.0)


# ---------------------------------------------------------------------------
# SkyIntegrator: analytic exponential atmosphere with split Rayleigh/Mie
# scattering, lit by the scene background (SkyIntegrator.cc:55-272).
# Round 2 aliased this to a fixed-step singlescatter over a SkyVolume;
# this is the real marcher.
# ---------------------------------------------------------------------------

# piecewise-linear Mie angular scatter table (SkyIntegrator.cc mieScatter)
_MIE_DEG = np.array([0.0, 1.0, 4.0, 7.0, 10.0, 30.0, 60.0, 80.0, 180.0],
                    np.float32)
_MIE_VAL = np.array([4.192, 4.192, 3.311, 2.860, 2.518, 1.122, 0.3324,
                     0.1644, 0.1], np.float32)


def sky_constants(alpha: float, turbidity: float):
    """Rayleigh/Mie extinction coefficients (SkyIntegrator.cc ctor)."""
    alpha_r = 0.1136 * alpha
    alpha_m = 0.8333 * alpha
    N, n, p_n, l = 2.545e25, 1.0003, 0.035, 500e-9
    b_r = (8 * np.pi ** 3 * (n * n - 1) ** 2 / (3 * N * l ** 4)
           * (6 + 3 * p_n) / (6 - 7 * p_n))
    T = turbidity
    c = (0.6544 * T - 0.651) * 1e-16
    v, K = 4.0, 0.67
    b_m = 0.434 * c * np.pi * (2 * np.pi / l) ** (v - 2) * K * 0.01
    return float(b_r), float(b_m), float(alpha_r), float(alpha_m)


def _sky_tau(beta, alpha, h0, cos_theta, s):
    """Analytic optical depth of the exponential atmosphere over [0, s]
    (SkyIntegrator.cc skyTau): beta*exp(-a h0)(1-exp(-a cos s))/(a cos)."""
    denom = alpha * jnp.where(jnp.abs(cos_theta) < 1e-5,
                              jnp.where(cos_theta < 0, -1e-5, 1e-5),
                              cos_theta)
    return beta * jnp.exp(-alpha * h0) * (1.0 - jnp.exp(-denom * s)) / denom


def sky_transmittance(rays: Rays, opts: VolumeOptions) -> jnp.ndarray:
    """exp(-(tau_m + tau_r)) along rays -> [N,3] (grayscale, the
    reference's colorA_t(exp(-energy)))."""
    b_r, b_m, a_r, a_m = sky_constants(opts.sky_alpha, opts.sky_turbidity)
    bounded = rays.tmax > 0
    s = jnp.where(bounded, rays.tmax, 0.0) * opts.sky_scale
    h0 = rays.o[..., 2] * opts.sky_scale
    cos_t = rays.d[..., 2]
    tau = _sky_tau(b_m, a_m, h0, cos_t, s) \
        + _sky_tau(b_r, a_r, h0, cos_t, s)
    tr = jnp.exp(-jnp.where(bounded, tau, 0.0))
    return jnp.repeat(tr[..., None], 3, axis=-1)


def sky_integrate(scene, rays: Rays, hits_t, opts: VolumeOptions,
                  n_dirs_theta: int = 3, n_dirs_phi: int = 8):
    """In-scattered sky radiance along rays -> [N,3]
    (SkyIntegrator.cc integrate :185-260): S0 = hemisphere sum of
    background radiance times the angular Rayleigh/Mie coefficients, then
    an exponential-atmosphere march accumulates Tr * density * step."""
    from core_tpu.backgrounds import eval_background
    if scene.background is None:
        return jnp.zeros(rays.o.shape, jnp.float32)
    b_r, b_m, a_r, a_m = sky_constants(opts.sky_alpha, opts.sky_turbidity)
    n = rays.o.shape[0]
    K = 0.67

    s0_r = jnp.zeros((n, 3), jnp.float32)
    s0_m = jnp.zeros((n, 3), jnp.float32)
    mie_deg = jnp.asarray(_MIE_DEG)
    mie_val = jnp.asarray(_MIE_VAL)
    for v in range(n_dirs_theta):
        theta = (v * 0.3 + 0.2) * 0.5 * np.pi
        for u in range(n_dirs_phi):
            phi = u * 2.0 * np.pi / n_dirs_phi
            w = jnp.asarray([np.sin(theta) * np.cos(phi),
                             np.sin(theta) * np.sin(phi),
                             np.cos(theta)], jnp.float32)
            L_s = eval_background(scene.background,
                                  jnp.broadcast_to(w, (1, 3)))
            cos_wd = jnp.sum(w[None] * rays.d, axis=-1)
            b_r_ang = b_r * 3.0 / (2.0 * np.pi * 8.0) * (1.0 + cos_wd ** 2)
            ang_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_wd, -1.0, 1.0)))
            b_m_ang = b_m / (2.0 * K * np.pi) * jnp.interp(ang_deg, mie_deg,
                                                           mie_val)
            s0_m = s0_m + L_s * b_m_ang[..., None]
            s0_r = s0_r + L_s * b_r_ang[..., None]
    inv_uv = 1.0 / (n_dirs_theta * n_dirs_phi)
    s0_r = s0_r * inv_uv
    s0_m = s0_m * inv_uv

    bounded = hits_t > 0
    s = jnp.where(bounded, hits_t, 0.0) * opts.sky_scale
    h0 = rays.o[..., 2] * opts.sky_scale
    cos_t = rays.d[..., 2]
    step = s / opts.steps
    i_r = jnp.zeros(n, jnp.float32)
    i_m = jnp.zeros(n, jnp.float32)
    for i in range(opts.steps):
        pos = (i + 0.5) * step
        u_r = jnp.exp(-a_r * (h0 + pos * cos_t))
        u_m = jnp.exp(-a_m * (h0 + pos * cos_t))
        tr_r = jnp.exp(-_sky_tau(b_r, a_r, h0, cos_t, pos))
        tr_m = jnp.exp(-_sky_tau(b_m, a_m, h0, cos_t, pos))
        i_r = i_r + tr_r * u_r * step
        i_m = i_m + tr_m * u_m * step
    out = s0_r * i_r[..., None] + s0_m * i_m[..., None]
    return jnp.where(bounded[..., None], out, 0.0)


def _point_sp(p):
    """Minimal surface-point stand-in for light sampling at a volume point."""
    from core_tpu.types import SurfacePoints
    n = p.shape[0]
    up = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    z = jnp.zeros((n,), jnp.int32)
    return SurfacePoints(p=p, n=up, ng=up, nu=up, nv=up,
                         uv=jnp.zeros((n, 2)), mat=z,
                         light=jnp.full((n,), -1, jnp.int32), prim=z, obj=z)
