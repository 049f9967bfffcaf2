"""Glossy (Ashikhmin-Shirley / Blinn) + coated-glossy material families.

Reimplements the reference glossyMat_t (src/materials/glossy2.cc) and
coatedGlossyMat_t (src/materials/coatedglossy.cc) with the microfacet
library formulas (include/materials/microfacet.h):

- Blinn_D(cos_h, e) = (e+1) * cos_h^e                        (microfacet.h:99)
- AS_Aniso_D(h, eu, ev) = sqrt((eu+1)(ev+1)) * h.z^expo      (microfacet.h:61)
- ASDivisor(c, cI, cO) = 8*pi*(c*max(cI,cO)*0.99 + 0.04)     (microfacet.h:40)
- SchlickFresnel(cos, R) = R + (1-R)(1-cos)^5                (microfacet.h:200)
- diffuseReflect: (28/23)-style coupled diffuse               (microfacet.h:207)
- pDiffuse = min(0.6, 1 - mGlossy/(mGlossy+(1-mGlossy)*mDiffuse))
                                                             (glossy2.cc:97)
Sampling picks diffuse-vs-glossy by pDiffuse; pdfs mix the cosine and
half-vector pdfs exactly as glossy2.cc:200-306.  Coated glossy wraps the
same lobe stack behind a dielectric coating: eval/sample are attenuated by
the coating's Fresnel transmittance and getSpecular returns the coating
mirror branch (coatedglossy.cc).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from core_tpu.mathutils import (dot, normalize, reflect_dir,
                                fresnel_dielectric)
from core_tpu.materials.base import BSDF, MatType, MaterialTable
from core_tpu.materials.shinydiffuse import (face_forward, SampleResult,
                                             SpecularResult, _oren_nayar)
from core_tpu.sampling.utils import sample_cos_hemisphere

DIFFUSE_RATIO = 0.387507688  # microfacet.h:29


def _as_divisor(cos1, cos_i, cos_o):
    return 8.0 * np.pi * (cos1 * jnp.maximum(cos_i, cos_o) * 0.99 + 0.04)


def _pdf_divisor(cos):
    return 8.0 * np.pi * (cos * 0.99 + 0.04)


def _schlick(cos, r):
    c1 = 1.0 - cos
    c2 = c1 * c1
    return r + (1.0 - r) * c1 * c2 * c2


def _blinn_d(cos_h, e):
    return (e + 1.0) * jnp.power(jnp.maximum(cos_h, 0.0), e)


def _as_aniso_d(hx, hy, hz, eu, ev):
    ok = hz > 1e-6
    expo = (eu * hx * hx + ev * hy * hy) / (1.00001 - hz * hz)
    # safe base: power()'s exponent-cotangent is log(base)*base^e -> NaN at 0
    base = jnp.where(ok, hz, 1.0)
    d = jnp.sqrt((eu + 1.0) * (ev + 1.0)) * jnp.power(base, expo)
    return jnp.where(ok, d, 0.0)


def _is_aniso(p: MaterialTable):
    return jnp.abs(p.exponent[..., 0] - p.exponent[..., 1]) > 1e-6


def _micro_d(p, hx, hy, hz):
    """Distribution value, Blinn or AS-aniso per lane."""
    eu = p.exponent[..., 0]
    ev = p.exponent[..., 1]
    return jnp.where(_is_aniso(p), _as_aniso_d(hx, hy, hz, eu, ev),
                     _blinn_d(hz, eu))


def _diffuse_components(p: MaterialTable):
    """(mDiffuse, mGlossy, pDiffuse) per hit (glossy2.cc initBSDF)."""
    m_diffuse = p.strengths[..., 3]
    m_glossy = p.glossy_reflect
    denom = m_glossy + (1.0 - m_glossy) * m_diffuse
    denom_safe = jnp.where(denom > 1e-12, denom, 1.0)
    p_diffuse = jnp.minimum(
        0.6, 1.0 - jnp.where(denom > 1e-12, m_glossy / denom_safe, 0.0))
    return m_diffuse, m_glossy, p_diffuse


def _coating_kr(p: MaterialTable, wo, n):
    """Coated-glossy coating Fresnel reflectance (coatedglossy.cc uses the
    dielectric fresnel of the coating IOR); plain glossy has no coating."""
    kr = fresnel_dielectric(dot(wo, n), p.ior)
    coated = p.mtype == int(MatType.COATED_GLOSSY)
    return jnp.where(coated, kr, 0.0)


def _diffuse_reflect(wi_n, wo_n, m_glossy, m_diffuse, diff_col):
    """Coupled diffuse term (microfacet.h diffuseReflect)."""
    f_wi = 1.0 - 0.5 * wi_n
    f_wi = (f_wi * f_wi) * (f_wi * f_wi) * f_wi
    f_wo = 1.0 - 0.5 * wo_n
    f_wo = (f_wo * f_wo) * (f_wo * f_wo) * f_wo
    k = DIFFUSE_RATIO * m_diffuse * (1.0 - m_glossy) \
        * (1.0 - f_wi) * (1.0 - f_wo)
    return k[..., None] * diff_col


def _half_local(sp, n, h):
    """Half vector in the (NU, NV, N) shading frame."""
    return dot(h, sp.nu), dot(h, sp.nv), dot(h, n)


def eval_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    """glossy2.cc eval: glossy lobe + uncoupled diffuse (the reference's
    shipped eval uses plain mDiffuse*(1-mGlossy)*diffuse, not
    diffuseReflect — mirrored here so MIS weights match its output)."""
    same_side = (dot(sp.ng, wi) * dot(sp.ng, wo)) >= 0.0
    n = face_forward(sp.ng, sp.n, wo)
    wi_n = jnp.abs(dot(wi, n))
    wo_n = jnp.abs(dot(wo, n))
    m_diffuse, m_glossy, _ = _diffuse_components(p)

    h = normalize(wo + wi)
    cos_wi_h = jnp.maximum(dot(wi, h), 0.0)
    hx, hy, hz = _half_local(sp, n, h)
    d = _micro_d(p, hx, hy, hz)
    glossy = d * _schlick(cos_wi_h, m_glossy) \
        / _as_divisor(cos_wi_h, wo_n, wi_n)

    use_glossy = bool(req_flags & (BSDF.GLOSSY | BSDF.DIFFUSE))
    col = glossy[..., None] * p.glossy_color if use_glossy \
        else jnp.zeros_like(wi)

    if req_flags & BSDF.DIFFUSE:
        on = jnp.where(p.oren_nayar[..., 1] != 0.0,
                       _oren_nayar(p, wi, wo, n), 1.0)
        dcol = (m_diffuse * (1.0 - m_glossy) * on)[..., None] * p.diffuse_color
        col = col + jnp.where((m_diffuse > 0.0)[..., None], dcol, 0.0)

    # coating transmittance for coated glossy
    kr = _coating_kr(p, wo, n)
    col = col * (1.0 - kr)[..., None]
    return jnp.where(same_side[..., None], col, 0.0)


def _sample_blinn_h(p, s1, s2):
    """Blinn_Sample (microfacet.h:107): local half vector from exponent."""
    e = p.exponent[..., 0]
    cos_t = jnp.power(1.0 - s2, 1.0 / (e + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = s1 * 2.0 * np.pi
    return sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t


def _sample_quadrant_aniso(s1, s2, eu, ev):
    s1 = jnp.clip(s1, 0.0, 1.0 - 1e-6)   # tan(pi/2) guard
    phi = jnp.arctan(jnp.sqrt((eu + 1.0) / (ev + 1.0))
                     * jnp.tan(0.5 * np.pi * s1))
    cos_p = jnp.cos(phi)
    sin_p = jnp.sin(phi)
    cp2 = cos_p * cos_p
    sp2 = 1.0 - cp2
    # base floor: the exponent is parameter-dependent (via phi <- s1), so
    # power()'s exponent-cotangent log(base) must never see base == 0
    cos_t = jnp.power(jnp.maximum(1.0 - s2, 1e-12),
                      1.0 / (eu * cp2 + ev * sp2 + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    return sin_t * cos_p, sin_t * sin_p, cos_t


def _sample_aniso_h(p, s1, s2):
    """AS_Aniso_Sample (microfacet.h:72): fold s1 into a quadrant."""
    eu = p.exponent[..., 0]
    ev = p.exponent[..., 1]
    q = jnp.clip((s1 * 4.0).astype(jnp.int32), 0, 3)
    s1q = jnp.where(q == 0, 4.0 * s1,
          jnp.where(q == 1, 1.0 - 4.0 * (0.5 - s1),
          jnp.where(q == 2, 4.0 * (s1 - 0.5), 1.0 - 4.0 * (1.0 - s1))))
    hx, hy, hz = _sample_quadrant_aniso(s1q, s2, eu, ev)
    hx = jnp.where((q == 1) | (q == 2), -hx, hx)
    hy = jnp.where(q >= 2, -hy, hy)
    return hx, hy, hz


def sample_bsdf(p: MaterialTable, sp, wo, s1, s2,
                req_flags: int = BSDF.ALL) -> SampleResult:
    """glossy2.cc sample(): pick diffuse (prob pDiffuse) or glossy lobe."""
    n = face_forward(sp.ng, sp.n, wo)
    cos_ng_wo = dot(sp.ng, wo)
    wo_n = jnp.abs(dot(wo, n))
    m_diffuse, m_glossy, p_diffuse = _diffuse_components(p)
    with_diffuse = m_diffuse > 0.0

    use_diffuse = bool(req_flags & BSDF.DIFFUSE)
    # as_diffuse materials treat the glossy lobe as BSDF_DIFFUSE
    use_glossy_static = bool(req_flags & (BSDF.GLOSSY | BSDF.DIFFUSE))
    use_glossy = jnp.where(p.as_diffuse,
                           bool(req_flags & BSDF.DIFFUSE),
                           bool(req_flags & BSDF.GLOSSY)) \
        if use_glossy_static else jnp.zeros_like(with_diffuse)

    p_diff_eff = jnp.where(use_glossy, p_diffuse, 1.0) \
        * (with_diffuse & use_diffuse)
    take_diffuse = s1 < p_diff_eff
    pd_safe = jnp.where(p_diff_eff > 1e-12, p_diff_eff, 1.0)
    pg_safe = jnp.where(p_diff_eff < 1.0 - 1e-12, 1.0 - p_diff_eff, 1.0)
    s1d = s1 / pd_safe
    s1g = (s1 - p_diff_eff) / pg_safe

    # ---- diffuse branch: cosine hemisphere ----
    wi_d = sample_cos_hemisphere(n, sp.nu, sp.nv, jnp.clip(s1d, 0.0, 1.0), s2)

    # ---- glossy branch: sample half vector, reflect ----
    aniso = _is_aniso(p)
    bx, by, bz = _sample_blinn_h(p, jnp.clip(s1g, 0.0, 1.0), s2)
    ax, ay, az = _sample_aniso_h(p, jnp.clip(s1g, 0.0, 1.0), s2)
    hx = jnp.where(aniso, ax, bx)
    hy = jnp.where(aniso, ay, by)
    hz = jnp.where(aniso, az, bz)
    h = hx[..., None] * sp.nu + hy[..., None] * sp.nv + hz[..., None] * n
    # flip H about N when wo is on the wrong side (glossy2.cc:256
    # H.reflect(N): H' = 2(N.H)N - H)
    cos_wo_h = dot(wo, h)
    h_flipped = 2.0 * dot(n, h)[..., None] * n - h
    h = jnp.where((cos_wo_h < 0.0)[..., None], h_flipped, h)
    cos_wo_h = jnp.abs(dot(wo, h))
    wi_g = reflect_dir(h, wo)

    wi = jnp.where(take_diffuse[..., None], wi_d, wi_g)
    same_side = (dot(sp.ng, wi) * cos_ng_wo) >= 0.0
    wi_n = jnp.abs(dot(wi, n))

    # shared terms at the final wi
    hh = normalize(wo + wi)
    hhx, hhy, hhz = _half_local(sp, n, hh)
    cos_wo_hh = jnp.abs(dot(wo, hh))
    cos_wi_hh = jnp.abs(dot(wi, hh))
    d_val = _micro_d(p, hhx, hhy, hhz)
    glossy_val = d_val * _schlick(cos_wi_hh, m_glossy) \
        / _as_divisor(cos_wi_hh, wo_n, wi_n)
    micro_pdf = d_val / _pdf_divisor(cos_wo_hh)

    pdf = jnp.where(
        take_diffuse,
        jnp.where(use_glossy, wi_n * p_diff_eff
                  + micro_pdf * (1.0 - p_diff_eff), wi_n),
        jnp.where(with_diffuse & use_diffuse,
                  wi_n * p_diff_eff + micro_pdf * (1.0 - p_diff_eff),
                  micro_pdf))

    col = jnp.where(use_glossy[..., None],
                    glossy_val[..., None] * p.glossy_color, 0.0)
    on = jnp.where(p.oren_nayar[..., 1] != 0.0,
                   _oren_nayar(p, wi, wo, n), 1.0)
    dcol = _diffuse_reflect(wi_n, wo_n, m_glossy, m_diffuse,
                            p.diffuse_color) * on[..., None]
    col = col + jnp.where((with_diffuse & use_diffuse)[..., None], dcol, 0.0)

    # coating transmittance (coated glossy)
    kr = _coating_kr(p, wo, n)
    col = col * (1.0 - kr)[..., None]

    ok = same_side & (pdf > 1e-8)
    col = jnp.where(ok[..., None], col, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    glossy_flag = jnp.where(p.as_diffuse, BSDF.DIFFUSE | BSDF.REFLECT,
                            BSDF.GLOSSY | BSDF.REFLECT)
    flags = jnp.where(take_diffuse,
                      jnp.full_like(p.mtype, BSDF.DIFFUSE | BSDF.REFLECT),
                      glossy_flag.astype(jnp.int32))
    w = wi_n / (pdf * 0.99 + 0.01)
    return SampleResult(wi=wi, col=col, pdf=pdf, flags=flags, w=w)


def pdf_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    """glossy2.cc pdf(): mix cosine + half-vector pdfs by pDiffuse."""
    same_side = (dot(sp.ng, wi) * dot(sp.ng, wo)) >= 0.0
    n = face_forward(sp.ng, sp.n, wo)
    wi_n = jnp.abs(dot(wi, n))
    m_diffuse, m_glossy, p_diffuse = _diffuse_components(p)
    with_diffuse = m_diffuse > 0.0

    use_diffuse = bool(req_flags & BSDF.DIFFUSE)
    use_glossy = jnp.where(p.as_diffuse,
                           bool(req_flags & BSDF.DIFFUSE),
                           bool(req_flags & BSDF.GLOSSY))

    h = normalize(wo + wi)
    hx, hy, hz = _half_local(sp, n, h)
    cos_wo_h = jnp.abs(dot(wo, h))
    micro_pdf = _micro_d(p, hx, hy, hz) / _pdf_divisor(cos_wo_h)

    pdf = jnp.where(
        with_diffuse & use_diffuse,
        jnp.where(use_glossy,
                  wi_n * p_diffuse + micro_pdf * (1.0 - p_diffuse), wi_n),
        jnp.where(use_glossy, micro_pdf, 0.0))
    return jnp.where(same_side, pdf, 0.0)


def get_specular(p: MaterialTable, sp, wo) -> SpecularResult:
    """Plain glossy has no specular branch; coated glossy reflects the
    coating (coatedglossy.cc getSpecular: mirror * Kr)."""
    n = face_forward(sp.ng, sp.n, wo)
    kr = _coating_kr(p, wo, n)
    refl_dir = reflect_dir(n, wo)
    refl_col = kr[..., None] * p.mirror_color
    refl_valid = (p.mtype == int(MatType.COATED_GLOSSY)) & (kr > 1e-7)
    z3 = jnp.zeros_like(wo)
    zb = jnp.zeros(kr.shape, bool)
    return SpecularResult(refl_valid, refl_dir, refl_col, zb, -wo, z3)


def transparency(p: MaterialTable, sp, wo):
    return jnp.zeros_like(wo)
