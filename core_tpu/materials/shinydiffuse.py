"""Shiny-diffuse material family, wavefront-vectorized.

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
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from core_tpu.mathutils import (dot, vdot, reflect_dir, fresnel_dielectric,
                                normalize)
from core_tpu.materials.base import BSDF, MaterialTable
from core_tpu.sampling.utils import sample_cos_hemisphere

# per-component BSDF flags in reference cFlags order (shinydiffuse config())
_COMP_FLAGS = np.array([
    BSDF.SPECULAR | BSDF.REFLECT,   # 0 mirror
    BSDF.TRANSMIT | BSDF.FILTER,    # 1 transparency
    BSDF.DIFFUSE | BSDF.TRANSMIT,   # 2 translucency
    BSDF.DIFFUSE | BSDF.REFLECT,    # 3 diffuse
], dtype=np.int32)


def face_forward(ng, n, wo):
    """FACE_FORWARD(Ng, N, wo): flip n when wo is behind the geometric normal."""
    s = jnp.where(dot(ng, wo) < 0.0, -1.0, 1.0)
    return n * s[..., None]


def components(p: MaterialTable):
    """Per-hit raw component strengths [N,4] (getComponents; shader-node
    driven strengths arrive pre-substituted in p.strengths)."""
    return p.strengths


def kr_fresnel(p: MaterialTable, wo, n):
    """Mirror weight Kr: Fresnel if enabled else 1 (getFresnel)."""
    cos = dot(wo, n)
    kr = fresnel_dielectric(cos, p.ior)
    return jnp.where(p.fresnel, kr, 1.0)


def accumulate(comp, kr):
    """Layer energy cascade (shinydiffuse.cc accumulate())."""
    a0 = comp[..., 0] * kr
    acc = 1.0 - a0
    a1 = comp[..., 1] * acc
    acc = acc * (1.0 - comp[..., 1])
    a2 = comp[..., 2] * acc
    acc = acc * (1.0 - comp[..., 2])
    a3 = comp[..., 3] * acc
    return jnp.stack([a0, a1, a2, a3], axis=-1)


def _oren_nayar(p, wi, wo, n):
    cos_ti = jnp.clip(dot(n, wi), 1e-8, 1.0)
    cos_to = jnp.clip(dot(n, wo), 1e-8, 1.0)
    v1 = normalize(wi - n * cos_ti[..., None])
    v2 = normalize(wo - n * cos_to[..., None])
    maxcos = jnp.where((cos_ti < 0.9999) & (cos_to < 0.9999),
                       jnp.maximum(dot(v1, v2), 0.0), 0.0)
    ge = cos_to >= cos_ti
    # 1e-12 floors: sqrt'(0) is infinite and wi may be parameter-dependent
    sin_alpha = jnp.sqrt(jnp.maximum(
        1.0 - jnp.where(ge, cos_ti, cos_to) ** 2, 1e-12))
    cos_b = jnp.where(ge, cos_to, cos_ti)
    tan_beta = jnp.sqrt(jnp.maximum(1.0 - cos_b * cos_b, 1e-12)) / cos_b
    return p.oren_nayar[..., 0] + p.oren_nayar[..., 1] * maxcos * sin_alpha * tan_beta


def eval_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    """Diffuse-side eval (shinydiffuse.cc eval)."""
    cos_ng_wo = dot(sp.ng, wo)
    cos_ng_wi = dot(sp.ng, wi)
    n = face_forward(sp.ng, sp.n, wo)
    comp = components(p)
    kr = kr_fresnel(p, wo, n)
    m_t = (1.0 - kr * comp[..., 0]) * (1.0 - comp[..., 1])

    transmit = (cos_ng_wo * cos_ng_wi) < 0.0
    transl_col = (comp[..., 2] * m_t)[..., None] * p.diffuse_color

    m_d = m_t * (1.0 - comp[..., 2]) * comp[..., 3]
    m_d = m_d * jnp.where(jnp.any(p.oren_nayar[..., 1:2] != 0.0, -1),
                          _oren_nayar(p, wi, wo, n), 1.0)
    diff_col = m_d[..., None] * p.diffuse_color
    diff_col = jnp.where((dot(n, wi) < 0.0)[..., None], 0.0, diff_col)

    out = jnp.where(transmit[..., None], transl_col, diff_col)
    if not (req_flags & BSDF.DIFFUSE):
        return jnp.zeros_like(out)
    has_diffuse = (p.flags & BSDF.DIFFUSE) != 0
    return jnp.where(has_diffuse[..., None], out, 0.0)


def emit(p: MaterialTable):
    return p.emit_strength[..., None] * p.diffuse_color


class SampleResult(NamedTuple):
    wi: jnp.ndarray      # [N,3]
    col: jnp.ndarray     # [N,3] BSDF value for the sampled direction
    pdf: jnp.ndarray     # [N]
    flags: jnp.ndarray   # [N] i32 sampled component flags
    w: jnp.ndarray       # [N] reference's W throughput factor


def _match_widths(p, comp, kr, req_flags: int):
    """Component CDF widths under requested flags (sample() head)."""
    accum = accumulate(comp, kr)
    present = comp > 1e-5
    matched = np.array([(req_flags & int(f)) == int(f) for f in _COMP_FLAGS])
    w = accum * present * jnp.asarray(matched, accum.dtype)[None, :]
    return w, accum


def sample_bsdf(p: MaterialTable, sp, wo, s1, s2,
                req_flags: int = BSDF.ALL) -> SampleResult:
    """Pick a layer by energy CDF and sample it (shinydiffuse.cc sample)."""
    n = face_forward(sp.ng, sp.n, wo)
    cos_ng_wo = dot(sp.ng, wo)
    comp = components(p)
    kr = kr_fresnel(p, wo, n)
    w, accum = _match_widths(p, comp, kr, req_flags)
    total = jnp.sum(w, axis=-1)
    ok = total > 1e-5
    # safe-denominator double-where: 1/max(total, tiny) has an unbounded
    # gradient on masked lanes (0 * inf = NaN through the where transpose)
    total_safe = jnp.where(ok, total, 1.0)
    inv_total = jnp.where(ok, 1.0 / total_safe, 0.0)
    wn = w * inv_total[..., None]
    cdf = jnp.cumsum(wn, axis=-1)
    pick = jnp.argmax(s1[..., None] <= cdf, axis=-1)
    pick = jnp.where(s1 > cdf[..., 3], 3, pick).astype(jnp.int32)
    width = jnp.take_along_axis(wn, pick[..., None], axis=-1)[..., 0]
    cdf_prev = jnp.where(pick > 0,
                         jnp.take_along_axis(cdf, jnp.maximum(pick - 1, 0)[..., None],
                                             axis=-1)[..., 0], 0.0)
    width_safe = jnp.where(width > 1e-12, width, 1.0)
    s1r = jnp.clip((s1 - cdf_prev) / width_safe, 0.0, 1.0)

    # candidate 0: specular mirror reflect
    wi0 = reflect_dir(n, wo)
    col0 = p.mirror_color * accum[..., 0:1] / jnp.maximum(
        jnp.abs(dot(sp.n, wi0))[..., None], 1e-6)
    pdf0 = width

    # candidate 1: specular transmit (straight through)
    wi1 = -wo
    tcol = p.transmit_filter[..., None] * p.diffuse_color \
        + (1.0 - p.transmit_filter)[..., None]
    col1 = accum[..., 1:2] * tcol
    pdf1 = jnp.where(jnp.abs(dot(wi1, n)) < 1e-6, 0.0, width)

    # candidate 2: diffuse translucency (cosine hemisphere on far side)
    wi2 = sample_cos_hemisphere(-n, sp.nu, sp.nv, s1r, s2)
    opposite2 = (cos_ng_wo * dot(sp.ng, wi2)) < 0.0
    col2 = jnp.where(opposite2[..., None], accum[..., 2:3] * p.diffuse_color, 0.0)
    pdf2 = jnp.abs(dot(wi2, n)) * width

    # candidate 3: diffuse reflect (cosine hemisphere)
    wi3 = sample_cos_hemisphere(n, sp.nu, sp.nv, s1r, s2)
    same3 = (cos_ng_wo * dot(sp.ng, wi3)) > 0.0
    on = jnp.where(jnp.any(p.oren_nayar[..., 1:2] != 0.0, -1),
                   _oren_nayar(p, wi3, wo, n), 1.0)
    col3 = jnp.where(same3[..., None], accum[..., 3:4] * p.diffuse_color, 0.0) \
        * on[..., None]
    pdf3 = jnp.abs(dot(wi3, n)) * width

    pk = pick[..., None]
    wi = jnp.where(pk == 0, wi0, jnp.where(pk == 1, wi1,
                   jnp.where(pk == 2, wi2, wi3)))
    col = jnp.where(pk == 0, col0, jnp.where(pk == 1, col1,
                    jnp.where(pk == 2, col2, col3)))
    pdf = jnp.where(pick == 0, pdf0, jnp.where(pick == 1, pdf1,
                    jnp.where(pick == 2, pdf2, pdf3)))
    flags = jnp.asarray(_COMP_FLAGS)[pick]

    pdf = jnp.where(ok, pdf, 0.0)
    col = jnp.where(ok[..., None], col, 1.0)
    flags = jnp.where(ok, flags, BSDF.NONE)
    w_factor = jnp.abs(dot(wi, sp.n)) / (pdf * 0.99 + 0.01)
    return SampleResult(wi=wi, col=col, pdf=pdf, flags=flags, w=w_factor)


def pdf_bsdf(p: MaterialTable, sp, wo, wi, req_flags: int = BSDF.ALL):
    """Solid-angle pdf of eval-able components (shinydiffuse.cc pdf)."""
    n = face_forward(sp.ng, sp.n, wo)
    cos_ng_wo = dot(sp.ng, wo)
    cos_ng_wi = dot(sp.ng, wi)
    comp = components(p)
    kr = kr_fresnel(p, wo, n)
    accum = accumulate(comp, kr)
    present = comp > 1e-5
    # reference pdf() matches with (bsdfs & cFlags[i]) -- any overlap
    matched = np.array([(req_flags & int(f)) != 0 for f in _COMP_FLAGS])
    w = accum * present * jnp.asarray(matched, accum.dtype)[None, :]
    total = jnp.sum(w, axis=-1)

    pdf = jnp.zeros_like(total)
    # translucency contributes when wi is on the far side
    pdf = pdf + jnp.where((cos_ng_wo * cos_ng_wi) < 0.0,
                          jnp.abs(dot(wi, n)) * w[..., 2], 0.0)
    # lambertian
    pdf = pdf + jnp.abs(dot(wi, n)) * w[..., 3]
    ok = total > 1e-5
    total_safe = jnp.where(ok, total, 1.0)
    return jnp.where(ok, pdf / total_safe, 0.0)


class SpecularResult(NamedTuple):
    refl_valid: jnp.ndarray
    refl_dir: jnp.ndarray
    refl_col: jnp.ndarray
    refr_valid: jnp.ndarray
    refr_dir: jnp.ndarray
    refr_col: jnp.ndarray


def get_specular(p: MaterialTable, sp, wo) -> SpecularResult:
    """Perfect specular reflect/refract branches (shinydiffuse getSpecular)."""
    backface = dot(wo, sp.ng) < 0.0
    n = jnp.where(backface[..., None], -sp.n, sp.n)
    comp = components(p)
    kr = kr_fresnel(p, wo, n)

    refr_valid = (p.flags & BSDF.FILTER) != 0
    tcol = p.transmit_filter[..., None] * p.diffuse_color \
        + (1.0 - p.transmit_filter)[..., None]
    refr_col = ((1.0 - comp[..., 0] * kr) * comp[..., 1])[..., None] * tcol
    refr_dir = -wo

    refl_valid = (comp[..., 0] * kr) > 1e-7
    refl_dir = reflect_dir(n, wo)
    refl_col = p.mirror_color * (comp[..., 0] * kr)[..., None]
    return SpecularResult(refl_valid, refl_dir, refl_col,
                          refr_valid & (comp[..., 1] > 1e-7), refr_dir, refr_col)


def transparency(p: MaterialTable, sp, wo):
    """Attenuation color for transparent shadow rays
    (shinydiffuse getTransparency)."""
    n = face_forward(sp.ng, sp.n, wo)
    comp = components(p)
    kr = kr_fresnel(p, wo, n)
    tcol = p.transmit_filter[..., None] * p.diffuse_color \
        + (1.0 - p.transmit_filter)[..., None]
    is_transp = (p.flags & BSDF.FILTER) != 0
    att = ((1.0 - comp[..., 0] * kr) * comp[..., 1])[..., None] * tcol
    return jnp.where(is_transp[..., None], att, 0.0)
