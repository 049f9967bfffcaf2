"""Type-dispatched BSDF calls over the wavefront.

Replaces the reference's C++ virtual dispatch (material_t::eval/sample/...)
with masked evaluation: each material family present in the scene is
evaluated on the full wavefront and results are selected by type mask.
`types_present` is a static tuple (known at scene compile time) so only the
families actually used are compiled.
"""
from __future__ import annotations

import jax.numpy as jnp

from core_tpu.materials.base import BSDF, MatType, MaterialTable
from core_tpu.materials import shinydiffuse
from core_tpu.materials.shinydiffuse import SampleResult, SpecularResult


def _families():
    from core_tpu.materials import glossy as glossy_mod
    from core_tpu.materials import glass as glass_mod
    return {
        int(MatType.SHINY_DIFFUSE): shinydiffuse,
        int(MatType.GLOSSY): glossy_mod,
        int(MatType.COATED_GLOSSY): glossy_mod,
        int(MatType.GLASS): glass_mod,
        int(MatType.ROUGH_GLASS): glass_mod,
    }


def _modules(types_present):
    fams = _families()
    seen = []
    for t in types_present:
        m = fams.get(int(t))
        if m is None:
            raise NotImplementedError(f"material family {t} not implemented yet")
        if m not in [x[1] for x in seen]:
            seen.append((int(t), m))
    return seen


def _mask_for(p, module, types_present):
    fams = _families()
    handled = [t for t in types_present if fams.get(int(t)) is module]
    mask = jnp.zeros(p.mtype.shape, bool)
    for t in handled:
        mask = mask | (p.mtype == int(t))
    return mask


def eval_bsdf(types_present, p: MaterialTable, sp, wo, wi,
              req_flags: int = BSDF.ALL):
    mods = _modules(types_present)
    out = jnp.zeros_like(wo)
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        out = jnp.where(mask[..., None],
                        m.eval_bsdf(p, sp, wo, wi, req_flags), out)
    return out


def sample_bsdf(types_present, p: MaterialTable, sp, wo, s1, s2,
                req_flags: int = BSDF.ALL) -> SampleResult:
    mods = _modules(types_present)
    out = None
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        r = m.sample_bsdf(p, sp, wo, s1, s2, req_flags)
        if out is None:
            out = r
        else:
            out = SampleResult(
                wi=jnp.where(mask[..., None], r.wi, out.wi),
                col=jnp.where(mask[..., None], r.col, out.col),
                pdf=jnp.where(mask, r.pdf, out.pdf),
                flags=jnp.where(mask, r.flags, out.flags),
                w=jnp.where(mask, r.w, out.w))
    return out


def pdf_bsdf(types_present, p: MaterialTable, sp, wo, wi,
             req_flags: int = BSDF.ALL):
    mods = _modules(types_present)
    out = jnp.zeros(p.mtype.shape, jnp.float32)
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        out = jnp.where(mask, m.pdf_bsdf(p, sp, wo, wi, req_flags), out)
    return out


def get_specular(types_present, p: MaterialTable, sp, wo) -> SpecularResult:
    mods = _modules(types_present)
    out = None
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        r = m.get_specular(p, sp, wo)
        if out is None:
            out = r
        else:
            mk = mask[..., None]
            out = SpecularResult(
                refl_valid=jnp.where(mask, r.refl_valid, out.refl_valid),
                refl_dir=jnp.where(mk, r.refl_dir, out.refl_dir),
                refl_col=jnp.where(mk, r.refl_col, out.refl_col),
                refr_valid=jnp.where(mask, r.refr_valid, out.refr_valid),
                refr_dir=jnp.where(mk, r.refr_dir, out.refr_dir),
                refr_col=jnp.where(mk, r.refr_col, out.refr_col))
    return out


def emit(types_present, p: MaterialTable):
    # every family shares the emit convention (emit_strength * diffuse_color)
    return shinydiffuse.emit(p)


def transparency(types_present, p: MaterialTable, sp, wo):
    mods = _modules(types_present)
    out = jnp.zeros_like(wo)
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        out = jnp.where(mask[..., None], m.transparency(p, sp, wo), out)
    return out
