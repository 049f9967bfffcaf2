"""Texture table: SoA parameter set + type-dispatched evaluation.

Replaces the reference's texture plugins (src/textures/basictex.cc:27-196,
imagetex.cc) with one typed parameter table and masked per-family eval over
the wavefront, like materials/dispatch.py.  Image textures share one padded
atlas array; procedural textures are pure noise-library math.

eval_texture(tset, tex_id, p, uv) -> rgba [N,4]; tex_id == -1 lanes get
(1,1,1,1) so callers can multiply unconditionally.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.textures import noise as nz


class TexType(enum.IntEnum):
    CLOUDS = 0        # basictex.cc textureClouds_t
    MARBLE = 1        # textureMarble_t
    WOOD = 2          # textureWood_t
    VORONOI = 3       # textureVoronoi_t
    MUSGRAVE = 4      # textureMusgrave_t
    DISTORTED = 5     # textureDistortedNoise_t
    RGB_CUBE = 6      # rgbCube_t
    BLEND = 7         # textureBlend_t
    IMAGE = 8         # imagetex.cc textureImage_t


class MusgraveType(enum.IntEnum):
    FBM = 0
    MULTIFRACTAL = 1
    HETERO_TERRAIN = 2
    HYBRID_MF = 3
    RIDGED_MF = 4


@dataclass(eq=False)    # identity hash: image arrays aren't hashable
class TextureDef:
    """Host-side texture description (one reference plugin instance)."""
    ttype: TexType = TexType.CLOUDS
    color1: tuple = (0.0, 0.0, 0.0)
    color2: tuple = (1.0, 1.0, 1.0)
    size: float = 1.0
    depth: int = 2                 # clouds depth / turbulence octaves
    hard: bool = False
    bias: int = 0                  # clouds bias: 0 none, 1 positive, 2 negative
    noise_type: str = "newperlin"
    turb: float = 1.0              # marble/wood turbulence strength
    sharpness: float = 1.0         # marble
    shape: str = "sin"             # sin | saw | tri
    rings: bool = False            # wood
    vor_type: int = nz.V_F1
    vor_metric: int = nz.DIST_REAL
    vor_mk_exp: float = 2.5
    vor_color_mode: int = 0        # 0 int, 1..3 colored (cellNoiseColor mixes)
    vor_weights: tuple = (1.0, 0.0, 0.0, 0.0)
    vor_iscale: float = 1.0
    mus_type: MusgraveType = MusgraveType.FBM
    mus_h: float = 1.0
    mus_lacunarity: float = 2.0
    mus_octaves: float = 2.0
    mus_offset: float = 1.0
    mus_gain: float = 1.0
    mus_iscale: float = 1.0
    distort: float = 1.0           # distorted noise amount
    noise_type2: str = "newperlin"
    blend_type: str = "lin"        # lin | quad | ease | diag | sphere | halo
    image: Optional[np.ndarray] = None   # [H,W,3/4] float, linear
    interpolate: str = "bilinear"  # none | bilinear
    clip_mode: str = "repeat"      # extend | clip | clipcube | repeat | checker
    xrepeat: int = 1
    yrepeat: int = 1
    gamma: float = 1.0
    use_alpha: bool = True
    name: str = ""


class TextureSet(NamedTuple):
    """Device-side compiled textures.  Python-side list `defs` stays static
    (hashable by id) so jit can branch per texture family."""
    atlas: jnp.ndarray      # [K,H,W,4] padded image atlas (K>=1)
    atlas_hw: jnp.ndarray   # [K,2] true (h,w) per image
    # mip pyramid for footprint-aware (ray-differential) lookups: level
    # l+1 is a 2x2 box downsample of level l (built per true image size,
    # so atlas padding never bleeds in)
    mips: tuple = ()        # per level: [K, H>>l, W>>l, 4]
    mips_hw: tuple = ()     # per level: [K,2] true (h,w)


class CompiledTextures:
    """Pytree: static defs (aux data, identity-hashed) + traced atlas
    arrays, so the image atlas is a device operand rather than a baked
    constant."""

    def __init__(self, defs: list, tset: TextureSet):
        self.defs = defs
        self.tset = tset

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _ct_flatten(ct):
    return (ct.tset,), tuple(ct.defs)


def _ct_unflatten(defs, children):
    ct = object.__new__(CompiledTextures)
    ct.defs = list(defs)
    ct.tset = children[0]
    return ct


jax.tree_util.register_pytree_node(CompiledTextures, _ct_flatten,
                                   _ct_unflatten)


MAX_MIP_LEVELS = 8


def _downsample2(im):
    """2x2 box average; odd trailing row/col folds into the last cell."""
    h, w = im.shape[:2]
    h2, w2 = max(1, h // 2), max(1, w // 2)
    im = im[:h2 * 2, :w2 * 2] if h >= 2 and w >= 2 else im
    if h >= 2 and w >= 2:
        return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2]
                       + im[0::2, 1::2] + im[1::2, 1::2])
    return im[:h2, :w2]


def build_texture_set(defs: list) -> CompiledTextures:
    imgs = [d.image for d in defs if d.ttype == TexType.IMAGE]
    mips, mips_hw = (), ()
    if imgs:
        maxh = max(i.shape[0] for i in imgs)
        maxw = max(i.shape[1] for i in imgs)
        atlas = np.zeros((len(imgs), maxh, maxw, 4), np.float32)
        hw = np.zeros((len(imgs), 2), np.int32)
        k = 0
        prepped = []
        for d in defs:
            if d.ttype == TexType.IMAGE:
                im = np.asarray(d.image, np.float32)
                if im.ndim == 2:
                    im = np.repeat(im[..., None], 3, axis=-1)
                if im.shape[-1] == 3:
                    im = np.concatenate([im, np.ones_like(im[..., :1])], -1)
                if d.gamma != 1.0:
                    im = im.copy()
                    im[..., :3] = np.power(np.maximum(im[..., :3], 0.0),
                                           d.gamma)
                atlas[k, :im.shape[0], :im.shape[1]] = im
                hw[k] = (im.shape[0], im.shape[1])
                d._atlas_slot = k
                prepped.append(im)
                k += 1
        # mip chain (per true image size; padding never bleeds in)
        n_levels = 0
        mh, mw = maxh, maxw
        while min(mh, mw) >= 2 and n_levels < MAX_MIP_LEVELS:
            mh, mw = max(1, mh // 2), max(1, mw // 2)
            n_levels += 1
        level_imgs = prepped
        ml, mlhw = [], []
        mh, mw = maxh, maxw
        for _ in range(n_levels):
            mh, mw = max(1, mh // 2), max(1, mw // 2)
            level_imgs = [_downsample2(im) for im in level_imgs]
            lvl = np.zeros((len(imgs), mh, mw, 4), np.float32)
            lhw = np.zeros((len(imgs), 2), np.int32)
            for k2, im in enumerate(level_imgs):
                lvl[k2, :im.shape[0], :im.shape[1]] = im
                lhw[k2] = (im.shape[0], im.shape[1])
            ml.append(jnp.asarray(lvl))
            mlhw.append(jnp.asarray(lhw))
        mips, mips_hw = tuple(ml), tuple(mlhw)
    else:
        atlas = np.zeros((1, 1, 1, 4), np.float32)
        hw = np.ones((1, 2), np.int32)
    return CompiledTextures(list(defs),
                            TextureSet(jnp.asarray(atlas), jnp.asarray(hw),
                                       mips, mips_hw))


def _shape_fn(shape: str, w):
    """Marble/wood wave shapes (basictex.cc:110-128)."""
    if shape == "saw":
        w = w * (0.5 / np.pi)
        return w - jnp.floor(w)
    if shape == "tri":
        w = w * (0.5 / np.pi)
        return jnp.abs(2.0 * (w - jnp.floor(w)) - 1.0)
    return 0.5 + 0.5 * jnp.sin(w)


def _eval_one_float(d: TextureDef, p):
    """Float intensity of one texture def at points p [...,3]."""
    gen = nz.generator(d.noise_type)
    if d.ttype == TexType.CLOUDS:
        v = nz.turbulence(gen, p, d.depth, d.size, d.hard)
        if d.bias:
            v = v * v
            if d.bias == 1:
                v = -v
        return v
    if d.ttype == TexType.MARBLE:
        w = (p[..., 0] + p[..., 1] + p[..., 2]) * 5.0
        if d.turb != 0.0:
            w = w + d.turb * nz.turbulence(gen, p, d.depth, d.size, d.hard)
        return jnp.power(jnp.maximum(_shape_fn(d.shape, w), 1e-12),
                         d.sharpness)
    if d.ttype == TexType.WOOD:
        if d.rings:
            w = jnp.sqrt(jnp.sum(p * p, axis=-1)) * 20.0
        else:
            w = (p[..., 0] + p[..., 1] + p[..., 2]) * 10.0
        if d.turb != 0.0:
            w = w + d.turb * nz.turbulence(gen, p, d.depth, d.size, d.hard)
        return _shape_fn(d.shape, w)
    if d.ttype == TexType.VORONOI:
        v = nz.voronoi(p * d.size, d.vor_type, d.vor_metric, d.vor_mk_exp,
                       d.vor_weights)
        return d.vor_iscale * v
    if d.ttype == TexType.MUSGRAVE:
        tp = p * d.size
        mt = d.mus_type
        if mt == MusgraveType.FBM:
            v = nz.fbm(gen, tp, d.mus_h, d.mus_lacunarity, d.mus_octaves)
        elif mt == MusgraveType.MULTIFRACTAL:
            v = nz.multifractal(gen, tp, d.mus_h, d.mus_lacunarity,
                                d.mus_octaves)
        elif mt == MusgraveType.HETERO_TERRAIN:
            v = nz.hetero_terrain(gen, tp, d.mus_h, d.mus_lacunarity,
                                  d.mus_octaves, d.mus_offset)
        elif mt == MusgraveType.HYBRID_MF:
            v = nz.hybrid_mfractal(gen, tp, d.mus_h, d.mus_lacunarity,
                                   d.mus_octaves, d.mus_offset, d.mus_gain)
        else:
            v = nz.ridged_mfractal(gen, tp, d.mus_h, d.mus_lacunarity,
                                   d.mus_octaves, d.mus_offset, d.mus_gain)
        return d.mus_iscale * v
    if d.ttype == TexType.DISTORTED:
        gen2 = nz.generator(d.noise_type2)
        tp = p * d.size
        off = jnp.stack([nz.signed(gen, tp + 13.5),
                         nz.signed(gen, tp),
                         nz.signed(gen, tp - 13.5)], axis=-1) * d.distort
        return gen2(tp + off)
    if d.ttype == TexType.BLEND:
        x = p[..., 0]
        y = p[..., 1]
        bt = d.blend_type
        if bt == "quad":
            c = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
            return c * c
        if bt == "ease":
            c = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
            return c * c * (3.0 - 2.0 * c)
        if bt == "diag":
            return jnp.clip((2.0 + x + y) * 0.25, 0.0, 1.0)
        if bt == "sphere":
            r = jnp.sqrt(jnp.sum(p * p, axis=-1))
            return jnp.maximum(1.0 - r, 0.0)
        if bt == "halo":
            r = jnp.sqrt(jnp.sum(p * p, axis=-1))
            h = jnp.maximum(1.0 - r, 0.0)
            return h * h
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)   # lin
    raise ValueError(d.ttype)


def _bilinear_tap(img, h, w, slot, u, v):
    """One bilinear fetch from a [K,H,W,4] level, mirroring the
    reference's interpolateImage (imagetex.cc:48-92) exactly: implicit
    frac() wrap, pixel centers at (i+0.5)/res (the -0.5 shift), the C
    (int) truncation-toward-zero quirk at the low border, +1-clamped
    neighbor taps."""
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    xf = wf * (u - jnp.floor(u)) - 0.5
    yf = hf * (v - jnp.floor(v)) - 0.5
    x0 = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    tx = (xf - jnp.floor(xf))[..., None]
    ty = (yf - jnp.floor(yf))[..., None]
    c00 = img[slot, y0, x0]
    c01 = img[slot, y0, x1]
    c10 = img[slot, y1, x0]
    c11 = img[slot, y1, x1]
    return (c00 * (1 - tx) * (1 - ty) + c01 * tx * (1 - ty)
            + c10 * (1 - tx) * ty + c11 * tx * ty)


def _eval_image(d: TextureDef, tset: TextureSet, uv, lod=None):
    """Image texture lookup (imagetex.cc doMapping/interpolateImage).

    lod: optional [N] UV-space footprint extent from ray differentials
    (differentials.texture_lod); selects a mip level pair and blends —
    the texture-filtering role of the reference's spDifferentials_t
    (surface.h:105-118; the reference itself never exploited them for
    textures, so this is a strict upgrade over point sampling)."""
    slot = getattr(d, "_atlas_slot", 0)
    h = tset.atlas_hw[slot, 0]
    w = tset.atlas_hw[slot, 1]
    # reference getNoGammaColor flips V for EVERY image lookup
    # (imagetex.cc:133 p1=(p.x,-p.y,p.z), i.e. v -> 1-v after doMapping's
    # 0.5p+0.5): image row 0 is the TOP of the picture while UV v=0 is
    # the bottom (round-5 mesh+IBL golden caught the missing flip)
    u = uv[..., 0] * d.xrepeat
    v = (1.0 - uv[..., 1]) * d.yrepeat
    mode = d.clip_mode
    inside = jnp.ones(u.shape, bool)
    if mode == "repeat" or mode == "checker":
        # wrap happens inside the taps' frac() (imagetex.cc:55-56)
        pass
    elif mode == "extend":
        u = jnp.clip(u, 0.0, 0.99999)
        v = jnp.clip(v, 0.0, 0.99999)
    else:  # clip / clipcube
        inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    if d.interpolate == "none":
        # no -0.5 shift in the point-sampled path (imagetex.cc:55-64)
        xi = jnp.clip((wf * (u - jnp.floor(u))).astype(jnp.int32),
                      0, w - 1)
        yi = jnp.clip((hf * (v - jnp.floor(v))).astype(jnp.int32),
                      0, h - 1)
        out = tset.atlas[slot, yi, xi]
    elif d.interpolate == "bicubic":
        # 4x4 cubic (reference imagetex.cc INTP_BICUBIC via
        # utilities/interpolation.h CubicInterpolate)
        xf = wf * (u - jnp.floor(u)) - 0.5
        yf = hf * (v - jnp.floor(v)) - 0.5
        x1 = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
        y1i = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
        tx = (xf - jnp.floor(xf))[..., None]
        ty = (yf - jnp.floor(yf))[..., None]

        def cubic(y0, y1, y2, y3, mu):
            a0 = y3 - y2 - y0 + y1
            a1 = y0 - y1 - a0
            a2 = y2 - y0
            return a0 * mu * mu * mu + a1 * mu * mu + a2 * mu + y1

        rows = []
        for dy_ in (-1, 0, 1, 2):
            yy = jnp.clip(y1i + dy_, 0, h - 1)
            taps = [tset.atlas[slot, yy, jnp.clip(x1 + dx_, 0, w - 1)]
                    for dx_ in (-1, 0, 1, 2)]
            rows.append(cubic(taps[0], taps[1], taps[2], taps[3], tx))
        out = cubic(rows[0], rows[1], rows[2], rows[3], ty)
    elif lod is not None and tset.mips:
        # trilinear mip filtering driven by the differential footprint
        fp_texels = lod * jnp.maximum(
            w.astype(jnp.float32) * float(d.xrepeat),
            h.astype(jnp.float32) * float(d.yrepeat))
        n_levels = len(tset.mips)
        lvl = jnp.clip(jnp.log2(jnp.maximum(fp_texels, 1e-9)),
                       0.0, float(n_levels))
        l0 = jnp.floor(lvl).astype(jnp.int32)
        frac = (lvl - l0.astype(jnp.float32))[..., None]
        taps = [_bilinear_tap(tset.atlas, h, w, slot, u, v)]
        for li in range(n_levels):
            taps.append(_bilinear_tap(
                tset.mips[li], tset.mips_hw[li][slot, 0],
                tset.mips_hw[li][slot, 1], slot, u, v))
        c0 = taps[0]
        c1 = taps[min(1, n_levels)]
        for li in range(1, n_levels + 1):
            sel0 = (l0 == li)[..., None]
            c0 = jnp.where(sel0, taps[li], c0)
            c1 = jnp.where(sel0, taps[min(li + 1, n_levels)], c1)
        out = c0 * (1.0 - frac) + c1 * frac
    else:
        out = _bilinear_tap(tset.atlas, h, w, slot, u, v)
    return jnp.where(inside[..., None], out,
                     jnp.zeros_like(out).at[..., 3].set(0.0))


def eval_texture_def(ctex, i: int, p, uv, lod=None):
    """RGBA of texture def #i (static index) at 3D coords p / uv coords uv.
    lod: optional [N] UV-footprint for mip-filtered image lookups."""
    d = ctex.defs[i]
    if d.ttype == TexType.IMAGE:
        return _eval_image(d, ctex.tset, uv, lod=lod)
    if d.ttype == TexType.RGB_CUBE:
        rgb = jnp.clip(jnp.abs(p), 0.0, 1.0)
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], -1)
    if d.ttype == TexType.VORONOI and d.vor_color_mode > 0:
        da, pa = nz.voronoi_features(p * d.size, d.vor_metric, d.vor_mk_exp)
        aw = [abs(x) for x in d.vor_weights]
        col = sum(aw[k] * nz.cell_noise_color(pa[..., k, :])
                  for k in range(4))
        inten = d.vor_iscale * sum(aw[k] * da[..., k] for k in range(4))
        return jnp.concatenate(
            [col * inten[..., None], jnp.clip(inten, 0, 1)[..., None]], -1)
    val = _eval_one_float(d, p)
    c1 = jnp.asarray(d.color1, jnp.float32)
    c2 = jnp.asarray(d.color2, jnp.float32)
    vc = jnp.clip(val, 0.0, 1.0)[..., None]
    rgb = c1[None] + vc * (c2 - c1)[None]
    return jnp.concatenate([rgb, jnp.clip(val, 0.0, 1.0)[..., None]], -1)


def eval_texture(ctex, tex_id, p, uv, lod=None):
    """RGBA of per-lane texture tex_id at 3D coords p / uv coords uv.

    tex_id: [N] int32, -1 => white.  Static python loop over texture defs,
    masked select (same pattern as materials/dispatch.py).
    """
    n = tex_id.shape[0]
    out = jnp.ones((n, 4), jnp.float32)
    if ctex is None:
        return out
    for i, d in enumerate(ctex.defs):
        mask = tex_id == i
        rgba = eval_texture_def(ctex, i, p, uv, lod=lod)
        out = jnp.where(mask[..., None], rgba, out)
    return out
