"""Shiny-diffuse material family, wavefront-vectorized (SoA core).

Reimplements the reference's workhorse material shinyDiffuseMat_t
(src/materials/shinydiffuse.cc, include/materials/shinydiff.h): a layered
stack of [specular mirror, specular transmit, diffuse translucency, diffuse
(Lambert or Oren-Nayar)] with optional Fresnel weighting.  Conventions match
the reference exactly so images agree:

- eval() omits the 1/pi Lambert factor; lights bake a *pi into their
  radiance (see lights/area.py) — YafaRay internal convention.
- sample() pdf is |wi.N| * component_width (again without 1/pi).
- W = |wi.N| / (pdf*0.99 + 0.01)  (shinydiffuse.cc sample tail).

Covers the reference's `mirror`, `null` and `light_mat` materials too
(simple.cc:36-91): mirror = pure specular layer, null = all strengths 0,
light_mat = emit-only.

The `*_s` functions are the implementation, operating on SoA wavefronts
(vec.V3 components, see vec.py for the TPU layout rationale); the unsuffixed
functions are thin AoS compatibility wrappers over them.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from core_tpu.vec import (V3, v3, aos, dot3, normalize3, reflect3, where3,
                          zeros3, sp_to_soa)
from core_tpu.materials.base import BSDF, MaterialTable, MatParamsS, params_to_soa

# per-component BSDF flags in reference cFlags order (shinydiffuse config())
_COMP_FLAGS = (
    BSDF.SPECULAR | BSDF.REFLECT,   # 0 mirror
    BSDF.TRANSMIT | BSDF.FILTER,    # 1 transparency
    BSDF.DIFFUSE | BSDF.TRANSMIT,   # 2 translucency
    BSDF.DIFFUSE | BSDF.REFLECT,    # 3 diffuse
)


def face_forward_s(ng: V3, n: V3, wo: V3) -> V3:
    """FACE_FORWARD(Ng, N, wo): flip n when wo is behind the geometric normal."""
    s = jnp.where(dot3(ng, wo) < 0.0, -1.0, 1.0)
    return n * s


def fresnel_dielectric_s(cos_i, ior):
    """Unpolarized dielectric Fresnel; same g/c formulation as the
    reference's `fresnel` (include/core_api/vector3d.h)."""
    c = jnp.abs(cos_i)
    g2 = ior * ior + c * c - 1.0
    tir = g2 <= 0.0
    g = jnp.sqrt(jnp.maximum(g2, 0.0))
    aux = c * (g + c)
    num = (g - c) / jnp.maximum(g + c, 1e-12)
    frac = (aux - 1.0) / jnp.maximum(aux + 1.0, 1e-12)
    kr = 0.5 * num * num * (1.0 + frac * frac)
    return jnp.where(tir, 1.0, jnp.clip(kr, 0.0, 1.0))


def kr_fresnel_s(p: MatParamsS, wo: V3, n: V3):
    """Mirror weight Kr: Fresnel if enabled else 1 (getFresnel)."""
    kr = fresnel_dielectric_s(dot3(wo, n), p.ior)
    return jnp.where(p.fresnel, kr, 1.0)


def accumulate_s(p: MatParamsS, kr):
    """Layer energy cascade (shinydiffuse.cc accumulate()) -> 4 [N] arrays."""
    a0 = p.c_mirror * kr
    acc = 1.0 - a0
    a1 = p.c_transp * acc
    acc = acc * (1.0 - p.c_transp)
    a2 = p.c_transl * acc
    acc = acc * (1.0 - p.c_transl)
    a3 = p.c_diff * acc
    return a0, a1, a2, a3


def _oren_nayar_s(p: MatParamsS, wi: V3, wo: V3, n: V3):
    cos_ti = jnp.clip(dot3(n, wi), 1e-8, 1.0)
    cos_to = jnp.clip(dot3(n, wo), 1e-8, 1.0)
    v1 = normalize3(wi - n * cos_ti)
    v2 = normalize3(wo - n * cos_to)
    maxcos = jnp.where((cos_ti < 0.9999) & (cos_to < 0.9999),
                       jnp.maximum(dot3(v1, v2), 0.0), 0.0)
    ge = cos_to >= cos_ti
    # 1e-12 floors: sqrt'(0) is infinite and wi may be parameter-dependent
    sin_alpha = jnp.sqrt(jnp.maximum(
        1.0 - jnp.where(ge, cos_ti, cos_to) ** 2, 1e-12))
    cos_b = jnp.where(ge, cos_to, cos_ti)
    tan_beta = jnp.sqrt(jnp.maximum(1.0 - cos_b * cos_b, 1e-12)) / cos_b
    return p.on_a + p.on_b * maxcos * sin_alpha * tan_beta


def _on_factor(p: MatParamsS, wi: V3, wo: V3, n: V3):
    return jnp.where(p.on_b != 0.0, _oren_nayar_s(p, wi, wo, n), 1.0)


def eval_bsdf_s(p: MatParamsS, sp, wo: V3, wi: V3,
                req_flags: int = BSDF.ALL) -> V3:
    """Diffuse-side eval (shinydiffuse.cc eval)."""
    cos_ng_wo = dot3(sp.ng, wo)
    cos_ng_wi = dot3(sp.ng, wi)
    n = face_forward_s(sp.ng, sp.n, wo)
    kr = kr_fresnel_s(p, wo, n)
    m_t = (1.0 - kr * p.c_mirror) * (1.0 - p.c_transp)

    transmit = (cos_ng_wo * cos_ng_wi) < 0.0
    transl_col = p.diffuse_color * (p.c_transl * m_t)

    m_d = m_t * (1.0 - p.c_transl) * p.c_diff
    m_d = m_d * _on_factor(p, wi, wo, n)
    diff_col = p.diffuse_color * m_d
    diff_col = where3(dot3(n, wi) < 0.0, zeros3(m_d), diff_col)

    out = where3(transmit, transl_col, diff_col)
    if not (req_flags & BSDF.DIFFUSE):
        return zeros3(m_d)
    has_diffuse = (p.flags & BSDF.DIFFUSE) != 0
    return where3(has_diffuse, out, 0.0)


def emit_s(p: MatParamsS) -> V3:
    return p.diffuse_color * p.emit_strength


class SampleResultS(NamedTuple):
    wi: V3
    col: V3              # BSDF value for the sampled direction
    pdf: jnp.ndarray     # [N]
    flags: jnp.ndarray   # [N] i32 sampled component flags
    w: jnp.ndarray       # [N] reference's W throughput factor


def sample_cos_hemisphere_s(n: V3, ru: V3, rv: V3, s1, s2) -> V3:
    """Cosine-weighted hemisphere (reference sample_utils.h:41-52)."""
    z1 = jnp.clip(s1, 0.0, 1.0)
    a = (2.0 * np.pi) * s2
    r = jnp.sqrt(jnp.maximum(1.0 - z1, 1e-12))
    return (ru * (jnp.cos(a) * r) + rv * (jnp.sin(a) * r)
            + n * jnp.sqrt(jnp.maximum(z1, 1e-12)))


def _component_widths(p: MatParamsS, accum, req_flags: int, exact: bool):
    """CDF widths of the 4 layers under requested flags.
    exact=True uses sample()'s full-subset match, else pdf()'s any-overlap."""
    comps = (p.c_mirror, p.c_transp, p.c_transl, p.c_diff)
    ws = []
    for i in range(4):
        f = int(_COMP_FLAGS[i])
        m = ((req_flags & f) == f) if exact else ((req_flags & f) != 0)
        if m:
            ws.append(accum[i] * (comps[i] > 1e-5))
        else:
            ws.append(jnp.zeros_like(accum[i]))
    return ws


def sample_bsdf_s(p: MatParamsS, sp, wo: V3, s1, s2,
                  req_flags: int = BSDF.ALL) -> SampleResultS:
    """Pick a layer by energy CDF and sample it (shinydiffuse.cc sample)."""
    n = face_forward_s(sp.ng, sp.n, wo)
    cos_ng_wo = dot3(sp.ng, wo)
    kr = kr_fresnel_s(p, wo, n)
    accum = accumulate_s(p, kr)
    w0, w1, w2, w3 = _component_widths(p, accum, req_flags, exact=True)
    total = w0 + w1 + w2 + w3
    ok = total > 1e-5
    # safe-denominator double-where: 1/max(total, tiny) has an unbounded
    # gradient on masked lanes (0 * inf = NaN through the where transpose)
    total_safe = jnp.where(ok, total, 1.0)
    inv_total = jnp.where(ok, 1.0 / total_safe, 0.0)
    wn0, wn1, wn2, wn3 = (w0 * inv_total, w1 * inv_total,
                          w2 * inv_total, w3 * inv_total)
    c0 = wn0
    c1 = c0 + wn1
    c2 = c1 + wn2
    pick = jnp.where(s1 <= c0, 0, jnp.where(s1 <= c1, 1,
                     jnp.where(s1 <= c2, 2, 3))).astype(jnp.int32)
    width = jnp.where(pick == 0, wn0, jnp.where(pick == 1, wn1,
                      jnp.where(pick == 2, wn2, wn3)))
    cdf_prev = jnp.where(pick == 0, 0.0, jnp.where(pick == 1, c0,
                         jnp.where(pick == 2, c1, c2)))
    width_safe = jnp.where(width > 1e-12, width, 1.0)
    s1r = jnp.clip((s1 - cdf_prev) / width_safe, 0.0, 1.0)

    # candidate 0: specular mirror reflect
    wi0 = reflect3(n, wo)
    col0 = p.mirror_color * (accum[0] / jnp.maximum(
        jnp.abs(dot3(sp.n, wi0)), 1e-6))
    pdf0 = width

    # candidate 1: specular transmit (straight through)
    wi1 = -wo
    tcol = p.diffuse_color * p.transmit_filter + (1.0 - p.transmit_filter)
    col1 = tcol * accum[1]
    pdf1 = jnp.where(jnp.abs(dot3(wi1, n)) < 1e-6, 0.0, width)

    # candidate 2: diffuse translucency (cosine hemisphere on far side)
    wi2 = sample_cos_hemisphere_s(-n, sp.nu, sp.nv, s1r, s2)
    opposite2 = (cos_ng_wo * dot3(sp.ng, wi2)) < 0.0
    col2 = where3(opposite2, p.diffuse_color * accum[2], 0.0)
    pdf2 = jnp.abs(dot3(wi2, n)) * width

    # candidate 3: diffuse reflect (cosine hemisphere)
    wi3 = sample_cos_hemisphere_s(n, sp.nu, sp.nv, s1r, s2)
    same3 = (cos_ng_wo * dot3(sp.ng, wi3)) > 0.0
    on = _on_factor(p, wi3, wo, n)
    col3 = where3(same3, p.diffuse_color * (accum[3] * on), 0.0)
    pdf3 = jnp.abs(dot3(wi3, n)) * width

    is0 = pick == 0
    is1 = pick == 1
    is2 = pick == 2
    wi = where3(is0, wi0, where3(is1, wi1, where3(is2, wi2, wi3)))
    col = where3(is0, col0, where3(is1, col1, where3(is2, col2, col3)))
    pdf = jnp.where(is0, pdf0, jnp.where(is1, pdf1,
                    jnp.where(is2, pdf2, pdf3)))
    flags = jnp.where(is0, _COMP_FLAGS[0], jnp.where(is1, _COMP_FLAGS[1],
                      jnp.where(is2, _COMP_FLAGS[2], _COMP_FLAGS[3])))

    pdf = jnp.where(ok, pdf, 0.0)
    col = where3(ok, col, 1.0)
    flags = jnp.where(ok, flags, BSDF.NONE).astype(jnp.int32)
    # W only for valid samples: the no-match branch (e.g. the emit-only
    # light material) must terminate paths like lightMat_t::sample
    # (reference simple.cc:56-61, W=0 pdf=0).  Without this, pdf=0 lanes
    # get W=cos/0.01 (~100x) and paths crossing the light quad explode.
    w_factor = jnp.where(ok, jnp.abs(dot3(wi, sp.n)) / (pdf * 0.99 + 0.01),
                         0.0)
    return SampleResultS(wi=wi, col=col, pdf=pdf, flags=flags, w=w_factor)


def pdf_bsdf_s(p: MatParamsS, sp, wo: V3, wi: V3,
               req_flags: int = BSDF.ALL):
    """Solid-angle pdf of eval-able components (shinydiffuse.cc pdf)."""
    n = face_forward_s(sp.ng, sp.n, wo)
    cos_ng_wo = dot3(sp.ng, wo)
    cos_ng_wi = dot3(sp.ng, wi)
    kr = kr_fresnel_s(p, wo, n)
    accum = accumulate_s(p, kr)
    # reference pdf() matches with (bsdfs & cFlags[i]) -- any overlap
    w = _component_widths(p, accum, req_flags, exact=False)
    total = w[0] + w[1] + w[2] + w[3]

    cos_wi_n = jnp.abs(dot3(wi, n))
    pdf = jnp.where((cos_ng_wo * cos_ng_wi) < 0.0, cos_wi_n * w[2], 0.0)
    pdf = pdf + cos_wi_n * w[3]
    ok = total > 1e-5
    total_safe = jnp.where(ok, total, 1.0)
    return jnp.where(ok, pdf / total_safe, 0.0)


class SpecularResultS(NamedTuple):
    refl_valid: jnp.ndarray
    refl_dir: V3
    refl_col: V3
    refr_valid: jnp.ndarray
    refr_dir: V3
    refr_col: V3


def get_specular_s(p: MatParamsS, sp, wo: V3) -> SpecularResultS:
    """Perfect specular reflect/refract branches (shinydiffuse getSpecular)."""
    backface = dot3(wo, sp.ng) < 0.0
    n = where3(backface, -sp.n, sp.n)
    kr = kr_fresnel_s(p, wo, n)

    refr_valid = (p.flags & BSDF.FILTER) != 0
    tcol = p.diffuse_color * p.transmit_filter + (1.0 - p.transmit_filter)
    refr_col = tcol * ((1.0 - p.c_mirror * kr) * p.c_transp)
    refr_dir = -wo

    refl_valid = (p.c_mirror * kr) > 1e-7
    refl_dir = reflect3(n, wo)
    refl_col = p.mirror_color * (p.c_mirror * kr)
    return SpecularResultS(refl_valid, refl_dir, refl_col,
                           refr_valid & (p.c_transp > 1e-7),
                           refr_dir, refr_col)


def transparency_s(p: MatParamsS, sp, wo: V3) -> V3:
    """Attenuation color for transparent shadow rays
    (shinydiffuse getTransparency)."""
    n = face_forward_s(sp.ng, sp.n, wo)
    kr = kr_fresnel_s(p, wo, n)
    tcol = p.diffuse_color * p.transmit_filter + (1.0 - p.transmit_filter)
    is_transp = (p.flags & BSDF.FILTER) != 0
    att = tcol * ((1.0 - p.c_mirror * kr) * p.c_transp)
    return where3(is_transp, att, 0.0)


# ---------------------------------------------------------------------------
# AoS compatibility wrappers (legacy [N,3] API)
# ---------------------------------------------------------------------------

class SampleResult(NamedTuple):
    wi: jnp.ndarray      # [N,3]
    col: jnp.ndarray     # [N,3]
    pdf: jnp.ndarray     # [N]
    flags: jnp.ndarray   # [N]
    w: jnp.ndarray       # [N]


class SpecularResult(NamedTuple):
    refl_valid: jnp.ndarray
    refl_dir: jnp.ndarray
    refl_col: jnp.ndarray
    refr_valid: jnp.ndarray
    refr_dir: jnp.ndarray
    refr_col: jnp.ndarray


def face_forward(ng, n, wo):
    return aos(face_forward_s(v3(ng), v3(n), v3(wo)))


def _oren_nayar(p: MaterialTable, wi, wo, n):
    return _oren_nayar_s(params_to_soa(p), v3(wi), v3(wo), v3(n))


def eval_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    return aos(eval_bsdf_s(params_to_soa(p), sp_to_soa(sp), v3(wo), v3(wi),
                           req_flags))


def emit(p: MaterialTable):
    return aos(emit_s(params_to_soa(p)))


def sample_bsdf(p: MaterialTable, sp, wo, s1, s2,
                req_flags: int = BSDF.ALL) -> SampleResult:
    r = sample_bsdf_s(params_to_soa(p), sp_to_soa(sp), v3(wo), s1, s2,
                      req_flags)
    return SampleResult(wi=aos(r.wi), col=aos(r.col), pdf=r.pdf,
                        flags=r.flags, w=r.w)


def pdf_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    return pdf_bsdf_s(params_to_soa(p), sp_to_soa(sp), v3(wo), v3(wi),
                      req_flags)


def get_specular(p: MaterialTable, sp, wo) -> SpecularResult:
    r = get_specular_s(params_to_soa(p), sp_to_soa(sp), v3(wo))
    return SpecularResult(r.refl_valid, aos(r.refl_dir), aos(r.refl_col),
                          r.refr_valid, aos(r.refr_dir), aos(r.refr_col))


def transparency(p: MaterialTable, sp, wo):
    return aos(transparency_s(params_to_soa(p), sp_to_soa(sp), v3(wo)))
