"""Material system: SoA parameter tables + type-dispatched BSDF math.

The reference dispatches BSDF calls through C++ virtuals per hit
(material_t, include/core_api/material.h:91-192).  TPU-native design: all
materials live in one table of parameter columns; each BSDF family is a set
of pure functions evaluated on the whole wavefront; per-hit rows are gathered
by material index and results selected by type mask (no virtuals, no
branches).  Differentiable w.r.t. every float column.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


class BSDF:
    """Bitfield matching the reference's BSDF_t flags (material.h:49-65)."""
    NONE = 0
    SPECULAR = 1 << 0
    GLOSSY = 1 << 1
    DIFFUSE = 1 << 2
    DISPERSIVE = 1 << 3
    REFLECT = 1 << 4
    TRANSMIT = 1 << 5
    FILTER = 1 << 6
    EMIT = 1 << 7
    VOLUMETRIC = 1 << 8
    TRANSLUCENT = 1 << 9
    ALL_SPECULAR = SPECULAR | REFLECT | TRANSMIT
    ALL = SPECULAR | GLOSSY | DIFFUSE | DISPERSIVE | REFLECT | TRANSMIT | FILTER
    # the reference's allBSDFIntersect (mcintegrator.cc:41)
    INTERSECT = GLOSSY | DIFFUSE | DISPERSIVE | REFLECT | TRANSMIT


class MatType(enum.IntEnum):
    """Material families (one per reference plugin, src/materials/)."""
    SHINY_DIFFUSE = 0    # shinydiffuse.cc (also covers mirror/null/light_mat)
    GLOSSY = 1           # glossy2.cc (Ashikhmin-Shirley + diffuse base)
    COATED_GLOSSY = 2    # coatedglossy.cc
    GLASS = 3            # glass.cc (specular dielectric + dispersion)
    ROUGH_GLASS = 4      # roughglass.cc (GGX microfacet dielectric)
    BLEND = 5            # blend.cc
    MASK = 6             # mask.cc
    TRANSLUCENT = 7      # translucent.cc (SSS surface part)


class MaterialTable(NamedTuple):
    """Stacked per-material parameter columns, [M, ...] each."""
    mtype: jnp.ndarray           # [M] i32
    diffuse_color: jnp.ndarray   # [M,3]
    mirror_color: jnp.ndarray    # [M,3]
    strengths: jnp.ndarray       # [M,4] = mirror, transparency, translucency, diffuse
    emit_strength: jnp.ndarray   # [M]
    transmit_filter: jnp.ndarray # [M]
    ior: jnp.ndarray             # [M]
    fresnel: jnp.ndarray         # [M] bool (shinydiffuse fresnel_effect)
    oren_nayar: jnp.ndarray      # [M,2] A,B coefficients (A=1,B=0 => Lambert)
    glossy_color: jnp.ndarray    # [M,3]
    glossy_reflect: jnp.ndarray  # [M] glossy reflectance strength
    exponent: jnp.ndarray        # [M,2] AS exponents (u,v); isotropic if equal
    as_diffuse: jnp.ndarray      # [M] bool (glossy: sample like diffuse)
    filter_color: jnp.ndarray    # [M,3] glass filter color
    absorption: jnp.ndarray      # [M,3] glass Beer absorption sigma
    dispersion: jnp.ndarray      # [M] glass dispersion power
    alpha_rough: jnp.ndarray     # [M] roughglass GGX alpha
    sub_mat: jnp.ndarray         # [M,2] i32 blend/mask component materials
    blend_val: jnp.ndarray       # [M] blend factor / mask threshold
    flags: jnp.ndarray           # [M] i32 BSDF flags
    diffuse_tex: jnp.ndarray     # [M] i32 texture id for diffuse color (-1 none)
    blend_tex: jnp.ndarray       # [M] i32 texture id for blend/mask (-1 none)
    sigma_s: jnp.ndarray         # [M,3] SSS scattering coefficient (translucent.cc)
    sss_g: jnp.ndarray           # [M] SSS phase anisotropy g


@dataclass
class MaterialDef:
    """Host-side material description; compiled into MaterialTable rows."""
    mtype: MatType = MatType.SHINY_DIFFUSE
    diffuse_color: tuple = (0.8, 0.8, 0.8)
    mirror_color: tuple = (1.0, 1.0, 1.0)
    mirror_strength: float = 0.0
    transparency: float = 0.0
    translucency: float = 0.0
    diffuse_strength: float = 1.0
    emit_strength: float = 0.0
    transmit_filter: float = 1.0
    ior: float = 1.33
    fresnel: bool = False
    oren_nayar_sigma: Optional[float] = None
    glossy_color: tuple = (1.0, 1.0, 1.0)
    glossy_reflect: float = 0.0
    exp_u: float = 50.0
    exp_v: float = 50.0
    as_diffuse: bool = True
    filter_color: tuple = (1.0, 1.0, 1.0)
    absorption: tuple = (0.0, 0.0, 0.0)
    dispersion: float = 0.0
    alpha_rough: float = 0.1
    sub_mat0: int = -1
    sub_mat1: int = -1
    blend_val: float = 0.5
    diffuse_tex: int = -1
    blend_tex: int = -1
    sigma_s: tuple = (0.0, 0.0, 0.0)   # translucent SSS scattering coeff
    sss_g: float = 0.0                 # translucent SSS phase anisotropy
    # glass/rough_glass fake_shadows (glass.cc:57 fakeShadow, default
    # false): when set, shadow rays filter through instead of being
    # blocked and the refract sample reports BSDF_FILTER (keeping photons
    # "direct" in the photon flag machine, photonintegr.cc:320)
    fake_shadows: bool = False
    name: str = ""

    def bsdf_flags(self) -> int:
        """Reproduce shinyDiffuseMat_t::config flag accumulation
        (shinydiffuse.cc:28-99) and the other families' constructors."""
        t = self.mtype
        f = 0
        if t == MatType.SHINY_DIFFUSE:
            acc = 1.0
            if self.mirror_strength > 1e-5:
                f |= BSDF.SPECULAR | BSDF.REFLECT
                if not self.fresnel:
                    acc = 1.0 - self.mirror_strength
            if self.transparency * acc > 1e-5:
                f |= BSDF.TRANSMIT | BSDF.FILTER
                acc *= 1.0 - self.transparency
            if self.translucency * acc > 1e-5:
                f |= BSDF.DIFFUSE | BSDF.TRANSMIT
                acc *= 1.0 - self.translucency
            if self.diffuse_strength * acc > 1e-5:
                f |= BSDF.DIFFUSE | BSDF.REFLECT
            if self.emit_strength > 0.0:
                f |= BSDF.EMIT
        elif t in (MatType.GLOSSY, MatType.COATED_GLOSSY):
            f = BSDF.GLOSSY | BSDF.REFLECT
            if self.diffuse_strength > 0.0:
                f |= BSDF.DIFFUSE
            if t == MatType.COATED_GLOSSY:
                f |= BSDF.SPECULAR
        elif t == MatType.GLASS:
            # FILTER only with fake_shadows (glass.cc:60-62: bsdfFlags =
            # ALL_SPECULAR, |= FILTER if fakeShadow)
            f = BSDF.ALL_SPECULAR
            if self.fake_shadows:
                f |= BSDF.FILTER
            if self.dispersion > 0.0:
                f |= BSDF.DISPERSIVE
        elif t == MatType.ROUGH_GLASS:
            f = BSDF.GLOSSY | BSDF.REFLECT | BSDF.TRANSMIT
            if self.fake_shadows:
                f |= BSDF.FILTER  # roughglass.cc:34-35
        elif t == MatType.TRANSLUCENT:
            f = BSDF.DIFFUSE | BSDF.GLOSSY | BSDF.REFLECT | BSDF.TRANSLUCENT
        else:  # BLEND / MASK: union resolved at dispatch
            f = BSDF.ALL
        return f


def build_material_table(defs: list[MaterialDef]) -> MaterialTable:
    if not defs:
        defs = [MaterialDef()]
    n = len(defs)

    def col(fn, shape=(), dtype=np.float32):
        a = np.zeros((n,) + shape, dtype)
        for i, d in enumerate(defs):
            a[i] = fn(d)
        return jnp.asarray(a)

    def on_ab(d: MaterialDef):
        if d.oren_nayar_sigma is None:
            return (1.0, 0.0)
        s2 = d.oren_nayar_sigma ** 2
        return (1.0 - 0.5 * s2 / (s2 + 0.33), 0.45 * s2 / (s2 + 0.09))

    return MaterialTable(
        mtype=col(lambda d: int(d.mtype), dtype=np.int32),
        diffuse_color=col(lambda d: d.diffuse_color, (3,)),
        mirror_color=col(lambda d: d.mirror_color, (3,)),
        strengths=col(lambda d: (d.mirror_strength, d.transparency,
                                 d.translucency, d.diffuse_strength), (4,)),
        emit_strength=col(lambda d: d.emit_strength),
        transmit_filter=col(lambda d: d.transmit_filter),
        ior=col(lambda d: d.ior),
        fresnel=col(lambda d: d.fresnel, dtype=bool),
        oren_nayar=col(on_ab, (2,)),
        glossy_color=col(lambda d: d.glossy_color, (3,)),
        glossy_reflect=col(lambda d: d.glossy_reflect),
        exponent=col(lambda d: (d.exp_u, d.exp_v), (2,)),
        as_diffuse=col(lambda d: d.as_diffuse, dtype=bool),
        filter_color=col(lambda d: d.filter_color, (3,)),
        absorption=col(lambda d: d.absorption, (3,)),
        dispersion=col(lambda d: d.dispersion),
        alpha_rough=col(lambda d: d.alpha_rough),
        sub_mat=col(lambda d: (d.sub_mat0, d.sub_mat1), (2,), np.int32),
        blend_val=col(lambda d: d.blend_val),
        flags=col(lambda d: d.bsdf_flags(), dtype=np.int32),
        diffuse_tex=col(lambda d: d.diffuse_tex, dtype=np.int32),
        blend_tex=col(lambda d: d.blend_tex, dtype=np.int32),
        sigma_s=col(lambda d: d.sigma_s, (3,)),
        sss_g=col(lambda d: d.sss_g),
    )


def gather_params(table: MaterialTable, mat_idx) -> MaterialTable:
    """Gather per-hit material rows: [M,...] -> [N,...]."""
    idx = jnp.clip(mat_idx, 0, table.mtype.shape[0] - 1)
    return MaterialTable(*[leaf[idx] for leaf in table])


class MatParamsS(NamedTuple):
    """Per-hit material parameters in SoA layout (colors as V3 of [N],
    strengths as separate [N] columns) — the TPU-efficient form of a
    gathered MaterialTable row block (see vec.py for why)."""
    mtype: jnp.ndarray
    flags: jnp.ndarray
    c_mirror: jnp.ndarray
    c_transp: jnp.ndarray
    c_transl: jnp.ndarray
    c_diff: jnp.ndarray
    emit_strength: jnp.ndarray
    transmit_filter: jnp.ndarray
    ior: jnp.ndarray
    fresnel: jnp.ndarray
    on_a: jnp.ndarray
    on_b: jnp.ndarray
    diffuse_color: "V3"
    mirror_color: "V3"
    glossy_color: "V3"
    filter_color: "V3"
    absorption: "V3"
    glossy_reflect: jnp.ndarray
    exp_u: jnp.ndarray
    exp_v: jnp.ndarray
    as_diffuse: jnp.ndarray
    dispersion: jnp.ndarray
    alpha_rough: jnp.ndarray
    sigma_s: "V3"
    sss_g: jnp.ndarray


def params_to_soa(p: MaterialTable) -> MatParamsS:
    """Gathered [N,...] MaterialTable rows -> SoA params (slice boundary)."""
    from core_tpu.vec import v3
    return MatParamsS(
        mtype=p.mtype, flags=p.flags,
        c_mirror=p.strengths[..., 0], c_transp=p.strengths[..., 1],
        c_transl=p.strengths[..., 2], c_diff=p.strengths[..., 3],
        emit_strength=p.emit_strength, transmit_filter=p.transmit_filter,
        ior=p.ior, fresnel=p.fresnel,
        on_a=p.oren_nayar[..., 0], on_b=p.oren_nayar[..., 1],
        diffuse_color=v3(p.diffuse_color), mirror_color=v3(p.mirror_color),
        glossy_color=v3(p.glossy_color), filter_color=v3(p.filter_color),
        absorption=v3(p.absorption), glossy_reflect=p.glossy_reflect,
        exp_u=p.exponent[..., 0], exp_v=p.exponent[..., 1],
        as_diffuse=p.as_diffuse, dispersion=p.dispersion,
        alpha_rough=p.alpha_rough, sigma_s=v3(p.sigma_s), sss_g=p.sss_g)


def gather_params_s(table: MaterialTable, mat_idx) -> MatParamsS:
    """SoA per-hit rows via a one-hot matmul decode (see scene.onehot_decode
    for why: TPU dynamic gathers are scalar-unit bound; the matmul is exact
    for 0/1 one-hots and its backward is a matmul, not a scatter)."""
    from core_tpu.vec import V3
    from core_tpu.scene import onehot_decode
    m = table.mtype.shape[0]
    idx = jnp.clip(mat_idx, 0, m - 1)
    f = jnp.float32
    cols = [table.mtype.astype(f), table.flags.astype(f),
            table.strengths[:, 0], table.strengths[:, 1],
            table.strengths[:, 2], table.strengths[:, 3],
            table.emit_strength, table.transmit_filter, table.ior,
            table.fresnel.astype(f),
            table.oren_nayar[:, 0], table.oren_nayar[:, 1],
            table.diffuse_color[:, 0], table.diffuse_color[:, 1],
            table.diffuse_color[:, 2],
            table.mirror_color[:, 0], table.mirror_color[:, 1],
            table.mirror_color[:, 2],
            table.glossy_color[:, 0], table.glossy_color[:, 1],
            table.glossy_color[:, 2],
            table.filter_color[:, 0], table.filter_color[:, 1],
            table.filter_color[:, 2],
            table.absorption[:, 0], table.absorption[:, 1],
            table.absorption[:, 2],
            table.glossy_reflect, table.exponent[:, 0], table.exponent[:, 1],
            table.as_diffuse.astype(f), table.dispersion, table.alpha_rough,
            table.sigma_s[:, 0], table.sigma_s[:, 1], table.sigma_s[:, 2],
            table.sss_g]
    rows = onehot_decode(jnp.stack(cols, axis=0), idx, m)
    return MatParamsS(
        mtype=rows[0].astype(jnp.int32), flags=rows[1].astype(jnp.int32),
        c_mirror=rows[2], c_transp=rows[3], c_transl=rows[4], c_diff=rows[5],
        emit_strength=rows[6], transmit_filter=rows[7], ior=rows[8],
        fresnel=rows[9] > 0.5, on_a=rows[10], on_b=rows[11],
        diffuse_color=V3(rows[12], rows[13], rows[14]),
        mirror_color=V3(rows[15], rows[16], rows[17]),
        glossy_color=V3(rows[18], rows[19], rows[20]),
        filter_color=V3(rows[21], rows[22], rows[23]),
        absorption=V3(rows[24], rows[25], rows[26]),
        glossy_reflect=rows[27], exp_u=rows[28], exp_v=rows[29],
        as_diffuse=rows[30] > 0.5, dispersion=rows[31],
        alpha_rough=rows[32],
        sigma_s=V3(rows[33], rows[34], rows[35]), sss_g=rows[36])


def detach_sample(sres):
    """Detached-sampling gradient estimator: the sampled direction, its pdf
    and the 1/pdf throughput factor are constants w.r.t. scene parameters;
    only the BSDF value (col) carries gradients.  E[f(x,theta)/p_detached(x)]
    differentiates to the correct interior-term gradient (the reference
    renderer is forward-only; this is the TPU build's AD contract)."""
    import jax
    sg = jax.lax.stop_gradient
    return sres._replace(wi=sg(sres.wi), pdf=sg(sres.pdf), w=sg(sres.w))
