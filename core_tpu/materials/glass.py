"""Glass (perfect specular dielectric) + rough glass (GGX microfacet).

Reimplements the reference glassMat_t (src/materials/glass.cc) and
roughGlassMat_t (src/materials/roughglass.cc) with the microfacet helpers
(include/materials/microfacet.h: GGX_Sample/GGX_D/GGX_G/GGX_Pdf,
refractMicrofacet/reflectMicrofacet, microfacetFresnel).

Conventions matched:
- glass.sample: refract with prob pKt = 0.01+0.99*Kt, reflect with pKr,
  W = 1, returned color = filterCol / specRefCol (glass.cc:84-190)
- glass.getSpecular: refr = Kt*filterCol, refl = mirror*Kr, TIR -> white
  reflection (glass.cc:205-250)
- glass.getTransparency (fake shadows): Kt * filterCol (glass.cc:192-198)
- roughglass.sample: GGX half-vector, Walter-style refraction Jacobian
  (roughglass.cc:55-146)
Beer-law absorption (glass.cc "absorption" -> beer volume handler,
src/materials/beer.cc) is applied by the integrators along interior
specular-chain segments using the material's `absorption` column.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from core_tpu.mathutils import (dot, normalize, reflect_dir, refract_dir,
                                fresnel_dielectric)
from core_tpu.materials.base import BSDF, MatType, MaterialTable
from core_tpu.materials.shinydiffuse import (face_forward, SampleResult,
                                             SpecularResult)


def _fresnel_kr_kt(wo, n, ior):
    """Reference fresnel() (vector3d.h): g/c dielectric form on |cos|."""
    kr = fresnel_dielectric(dot(wo, n), ior)
    return kr, 1.0 - kr


def _glass_normal(sp, wo):
    """glass.cc sample(): use sp.N but push it to wo's hemisphere when
    interpolated normals disagree with Ng."""
    outside = dot(sp.ng, wo) > 0.0
    cos_wo_n = dot(sp.n, wo)
    bad = jnp.where(outside, cos_wo_n < 0.0, cos_wo_n > 0.0)
    fixed = normalize(sp.n - (1.00001 * cos_wo_n)[..., None] * wo)
    return jnp.where(bad[..., None], fixed, sp.n), outside


def _is_rough(p: MaterialTable):
    return p.mtype == int(MatType.ROUGH_GLASS)


# ---------------- perfect specular glass ----------------

def _glass_sample(p, sp, wo, s1, s2, req_flags):
    n, outside = _glass_normal(sp, wo)
    can_refract, refdir = refract_dir(n, wo, p.ior)
    kr, kt = _fresnel_kr_kt(wo, n, p.ior)
    p_kr = 0.01 + 0.99 * kr
    p_kt = 0.01 + 0.99 * kt

    want_trans = bool(req_flags & BSDF.TRANSMIT)
    want_refl = bool(req_flags & (BSDF.SPECULAR | BSDF.REFLECT))
    take_refract = can_refract & (s1 < p_kt) & want_trans

    refl_dir = reflect_dir(n, wo)
    tcol = jnp.broadcast_to(p.filter_color, wo.shape)
    rcol = jnp.broadcast_to(p.mirror_color, wo.shape)
    tir = ~can_refract

    wi = jnp.where(take_refract[..., None], refdir, refl_dir)
    col = jnp.where(take_refract[..., None], tcol,
                    jnp.where(tir[..., None], jnp.ones_like(rcol), rcol))
    pdf = jnp.where(take_refract, p_kt, jnp.where(tir, 1.0, p_kr))
    valid = take_refract | want_refl
    # refract sampledFlags = tmFlags (glass.cc:147): FILTER|TRANSMIT with
    # fake_shadows, else SPECULAR|TRANSMIT — the distinction drives the
    # photon direct/caustic flag machine (photonintegr.cc:318-320)
    fake = (p.flags & BSDF.FILTER) != 0
    refr_flags = jnp.where(fake, BSDF.FILTER | BSDF.TRANSMIT,
                           BSDF.SPECULAR | BSDF.TRANSMIT)
    flags = jnp.where(take_refract, refr_flags,
                      BSDF.SPECULAR | BSDF.REFLECT).astype(jnp.int32)
    pdf = jnp.where(valid, pdf, 0.0)
    col = jnp.where(valid[..., None], col, 0.0)
    w = jnp.ones_like(pdf)   # glass.cc: W = 1 on all branches
    return SampleResult(wi=wi, col=col, pdf=pdf,
                        flags=jnp.where(valid, flags, BSDF.NONE), w=w)


# ---------------- rough glass (GGX) ----------------

def _ggx_sample_h(alpha2, s1, s2):
    """GGX_Sample (microfacet.h:119): local half vector."""
    tan2 = alpha2 * (s1 / (1.00001 - s1))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.00001 - cos_t * cos_t, 0.0))
    phi = 2.0 * np.pi * s2
    return sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t


def _ggx_d(alpha2, cos_t2, tan_t2):
    cos_t4 = cos_t2 * cos_t2
    a_tan = alpha2 + tan_t2
    return alpha2 / (np.pi * cos_t4 * a_tan * a_tan)


def _ggx_g(alpha2, wo_n, wi_n):
    def g1(c):
        c2 = jnp.maximum(c * c, 1e-12)
        return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha2 * (1.0 - c2) / c2))
    return g1(wo_n) * g1(wi_n)


def _refract_micro(eta, wo, h, wo_h):
    """refractMicrofacet (microfacet.h:173): Walter-style refraction of -wo
    through microfacet normal h.  Returns (ok, wi, kr, kt)."""
    c = -wo_h
    sign = jnp.where(c > 0.0, 1.0, -1.0)
    t1 = 1.0 - eta * eta * (1.0 - c * c)
    ok = t1 >= 0.0
    wi = -(eta[..., None] * wo + (eta * c - sign * jnp.sqrt(
        jnp.maximum(t1, 0.0)))[..., None] * h)
    kr = fresnel_dielectric(wo_h, 1.0 / jnp.maximum(eta, 1e-8))
    kt = 1.0 - kr
    ok = ok & (kr < 1.0)
    return ok, wi, kr, kt


def _rough_sample(p, sp, wo, s1, s2, req_flags):
    n = face_forward(sp.ng, sp.n, wo)
    outside = dot(sp.ng, wo) > 0.0
    alpha2 = p.alpha_rough * p.alpha_rough

    hx, hy, hz = _ggx_sample_h(alpha2, s1, s2)
    h = normalize(hx[..., None] * sp.nu + hy[..., None] * sp.nv
                  + hz[..., None] * n)
    cos_t = dot(h, n)
    cos_t2 = jnp.where(cos_t > 1e-6, cos_t * cos_t, 1.0)  # NaN-safe grad
    tan_t2 = (1.0 - cos_t2) / (cos_t2 * 0.99 + 0.01)
    d = jnp.where(cos_t > 1e-6, _ggx_d(alpha2, cos_t2, tan_t2), 0.0)

    wo_h = dot(wo, h)
    wo_n = dot(wo, n)
    eta = jnp.where(outside, 1.0 / p.ior, p.ior)
    ok_refr, wi_t, kr, kt = _refract_micro(eta, wo, h, wo_h)

    # transmission branch
    wi_t_n = dot(wi_t, n)
    wi_t_h = dot(wi_t, h)
    g_t = jnp.where((wi_t_h * wi_t_n > 0.0) & (wo_h * wo_n > 0.0),
                    _ggx_g(alpha2, wi_t_n, wo_n), 0.0)
    ior_wi = jnp.where(outside, p.ior, 1.0)
    ior_wo = jnp.where(outside, 1.0, p.ior)
    ht = ior_wo * wo_h + ior_wi * wi_t_h
    jac_t = (ior_wi * ior_wi) / jnp.maximum(ht * ht, 1e-8)
    tn_denom = wi_t_n * wo_n
    tn_safe = jnp.where(jnp.abs(tn_denom) > 1e-8, tn_denom, 1.0)
    glossy_t = jnp.abs(wo_h * wi_t_h / tn_safe) * kt * g_t * d * jac_t
    pdf_t = d * cos_t * jac_t * jnp.abs(wi_t_h)

    # reflection branch (reflectMicrofacet: wi = reflect wo about h)
    wi_r = reflect_dir(h, wo)
    wi_r_n = dot(wi_r, n)
    wi_r_h = dot(wi_r, h)
    g_r = _ggx_g(alpha2, wi_r_n, wo_n)
    jac_r = 1.0 / (4.0 * jnp.abs(wi_r_h) * 0.99 + 0.01)
    glossy_r = (kr * g_r * d) / (4.0 * jnp.abs(wo_n * wi_r_n) * 0.99 + 0.01)
    pdf_r = d * cos_t * jac_r

    want_trans = bool(req_flags & BSDF.TRANSMIT)
    want_refl = bool(req_flags & BSDF.REFLECT)
    take_trans = ok_refr & (s1 < kt) & want_trans
    tir = ~ok_refr

    wi = jnp.where(take_trans[..., None], wi_t,
                   jnp.where(tir[..., None], reflect_dir(h, wo), wi_r))
    col = jnp.where(take_trans[..., None],
                    glossy_t[..., None] * p.filter_color,
                    jnp.where(tir[..., None], jnp.ones_like(wo),
                              glossy_r[..., None] * p.mirror_color))
    pdf = jnp.where(take_trans, pdf_t, jnp.where(tir, 1.0, pdf_r))
    valid = take_trans | (want_refl & (ok_refr | tir))
    # hemisphere rejection: the reference reuses s1 for both the GGX half
    # vector and the Fresnel branch pick and never checks the resulting
    # hemisphere (roughglass.cc:89-146), which can leak reflection rays
    # below the surface; reject those lanes instead (slightly darker, no
    # leak).
    cos_wi_n = dot(wi, n)
    right_side = jnp.where(take_trans, cos_wi_n * wo_n < 0.0,
                           cos_wi_n * wo_n > 0.0)
    valid = valid & right_side
    flags = jnp.where(take_trans, BSDF.GLOSSY | BSDF.TRANSMIT,
                      BSDF.GLOSSY | BSDF.REFLECT).astype(jnp.int32)
    pdf = jnp.where(valid, pdf, 0.0)
    col = jnp.where(valid[..., None], col, 0.0)
    wi_n_abs = jnp.abs(dot(wi, n))
    w = jnp.where(tir, 1.0, wi_n_abs / (pdf * 0.99 + 0.01))
    return SampleResult(wi=wi, col=col, pdf=pdf,
                        flags=jnp.where(valid, flags, BSDF.NONE), w=w)


# ---------------- family dispatch (GLASS | ROUGH_GLASS) ----------------

def eval_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    """Both glasses are sample-only in the reference (no eval); returns 0."""
    return jnp.zeros_like(wo)


def sample_bsdf(p: MaterialTable, sp, wo, s1, s2,
                req_flags: int = BSDF.ALL) -> SampleResult:
    rough = _rough_sample(p, sp, wo, s1, s2, req_flags)
    smooth = _glass_sample(p, sp, wo, s1, s2, req_flags)
    m = _is_rough(p)[..., None]
    mm = _is_rough(p)
    return SampleResult(
        wi=jnp.where(m, rough.wi, smooth.wi),
        col=jnp.where(m, rough.col, smooth.col),
        pdf=jnp.where(mm, rough.pdf, smooth.pdf),
        flags=jnp.where(mm, rough.flags, smooth.flags),
        w=jnp.where(mm, rough.w, smooth.w))


def pdf_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    return jnp.zeros(p.mtype.shape, jnp.float32)


def get_specular(p: MaterialTable, sp, wo) -> SpecularResult:
    """glass.cc getSpecular; rough glass has no perfect-specular branch."""
    n, outside = _glass_normal(sp, wo)
    can_refract, refdir = refract_dir(n, wo, p.ior)
    kr, kt = _fresnel_kr_kt(wo, n, p.ior)

    refl_dir = reflect_dir(n, wo)
    refr_col = kt[..., None] * p.filter_color
    refl_col = jnp.where(can_refract[..., None],
                         kr[..., None] * p.mirror_color,
                         jnp.ones_like(wo))   # TIR -> white

    smooth = ~_is_rough(p)
    refr_valid = smooth & can_refract
    refl_valid = smooth & (can_refract | True)  # always have a refl branch
    return SpecularResult(refl_valid, refl_dir, refl_col,
                          refr_valid, refdir, refr_col)


def transparency(p: MaterialTable, sp, wo):
    """Fake-shadow transmittance Kt*filterCol (glass.cc getTransparency)."""
    n = face_forward(sp.ng, sp.n, wo)
    kr, kt = _fresnel_kr_kt(wo, n, p.ior)
    return kt[..., None] * p.filter_color
