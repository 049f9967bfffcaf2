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
        # translucent (TheBounty SSS, src/materials/translucent.cc): the
        # surface part is a glossy+diffuse BSDF; the subsurface transport
        # lives in integrators/sss.py keyed on the TRANSLUCENT flag.
        int(MatType.TRANSLUCENT): glossy_mod,
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


# ---------------------------------------------------------------------------
# SoA dispatch (vec.py layout).  Families with native `*_s` implementations
# run SoA; others fall back through a layout conversion.
# ---------------------------------------------------------------------------

def _params_to_aos(p):
    """MatParamsS -> gathered MaterialTable rows (fallback path only).
    blend/mask/texture columns are already resolved upstream, so they are
    filled with inert values."""
    from core_tpu.vec import aos
    n = p.mtype.shape
    i32 = lambda v: jnp.full(n + (2,), v, jnp.int32)
    return MaterialTable(
        mtype=p.mtype,
        diffuse_color=aos(p.diffuse_color), mirror_color=aos(p.mirror_color),
        strengths=jnp.stack([p.c_mirror, p.c_transp, p.c_transl, p.c_diff],
                            axis=-1),
        emit_strength=p.emit_strength, transmit_filter=p.transmit_filter,
        ior=p.ior, fresnel=p.fresnel,
        oren_nayar=jnp.stack([p.on_a, p.on_b], axis=-1),
        glossy_color=aos(p.glossy_color), glossy_reflect=p.glossy_reflect,
        exponent=jnp.stack([p.exp_u, p.exp_v], axis=-1),
        as_diffuse=p.as_diffuse, filter_color=aos(p.filter_color),
        absorption=aos(p.absorption), dispersion=p.dispersion,
        alpha_rough=p.alpha_rough, sub_mat=i32(-1),
        blend_val=jnp.zeros(n, jnp.float32), flags=p.flags,
        diffuse_tex=jnp.full(n, -1, jnp.int32),
        blend_tex=jnp.full(n, -1, jnp.int32),
        sigma_s=aos(p.sigma_s), sss_g=p.sss_g)


def _call_family_s(m, fname, p, sps, *args):
    """Call family m's SoA function, or fall back to AoS via conversion."""
    from core_tpu import vec
    f = getattr(m, fname + "_s", None)
    if f is not None:
        return f(p, sps, *args)
    # fallback: convert SoA -> AoS, call, convert back
    from core_tpu.materials.shinydiffuse import (SampleResultS, SpecularResultS)
    pa = _params_to_aos(p)
    spa = vec.sp_to_aos(sps)

    def cv(a):
        return vec.aos(a) if isinstance(a, vec.V3) else a

    r = getattr(m, fname)(pa, spa, *[cv(a) for a in args])
    if isinstance(r, SampleResult):
        return SampleResultS(wi=vec.v3(r.wi), col=vec.v3(r.col), pdf=r.pdf,
                             flags=r.flags, w=r.w)
    if isinstance(r, SpecularResult):
        return SpecularResultS(r.refl_valid, vec.v3(r.refl_dir),
                               vec.v3(r.refl_col), r.refr_valid,
                               vec.v3(r.refr_dir), vec.v3(r.refr_col))
    if isinstance(r, jnp.ndarray) and r.ndim and r.shape[-1] == 3:
        return vec.v3(r)
    return r


def _where_mask_s(mask, a, b):
    from core_tpu.vec import V3, where3
    if isinstance(a, V3):
        return where3(mask, a, b)
    if hasattr(a, "_fields"):
        return type(a)(*[_where_mask_s(mask, x, y) for x, y in zip(a, b)])
    return jnp.where(mask, a, b)


def eval_bsdf_s(types_present, p, sps, wo, wi, req_flags: int = BSDF.ALL):
    from core_tpu.vec import zeros3
    mods = _modules(types_present)
    out = zeros3(p.mtype)
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        out = _where_mask_s(mask, _call_family_s(m, "eval_bsdf", p, sps, wo,
                                                 wi, req_flags), out)
    return out


def sample_bsdf_s(types_present, p, sps, wo, s1, s2,
                  req_flags: int = BSDF.ALL):
    mods = _modules(types_present)
    out = None
    for t, m in mods:
        r = _call_family_s(m, "sample_bsdf", p, sps, wo, s1, s2, req_flags)
        if out is None:
            out = r
        else:
            mask = _mask_for(p, m, types_present)
            out = _where_mask_s(mask, r, out)
    return out


def pdf_bsdf_s(types_present, p, sps, wo, wi, req_flags: int = BSDF.ALL):
    mods = _modules(types_present)
    out = jnp.zeros(p.mtype.shape, jnp.float32)
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        out = jnp.where(mask, _call_family_s(m, "pdf_bsdf", p, sps, wo, wi,
                                             req_flags), out)
    return out


def get_specular_s(types_present, p, sps, wo):
    mods = _modules(types_present)
    out = None
    for t, m in mods:
        r = _call_family_s(m, "get_specular", p, sps, wo)
        if out is None:
            out = r
        else:
            mask = _mask_for(p, m, types_present)
            out = _where_mask_s(mask, r, out)
    return out


def emit_ss(types_present, p):
    # every family shares the emit convention (emit_strength * diffuse_color)
    return shinydiffuse.emit_s(p)


def transparency_ss(types_present, p, sps, wo):
    from core_tpu.vec import zeros3
    mods = _modules(types_present)
    out = zeros3(p.mtype)
    for t, m in mods:
        mask = _mask_for(p, m, types_present)
        out = _where_mask_s(mask, _call_family_s(m, "transparency", p, sps,
                                                 wo), out)
    return out
