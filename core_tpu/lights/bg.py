"""Background importance light (reference src/lights/bglight.cc).

The reference builds per-row U CDFs and a V CDF over the background's
sin-weighted luminance on a spheremap grid (bglight.cc init, :47-96) and
samples directions by 2-D CDF inversion; pdfs follow
  calcPdf(p0,p1,v)    = p0*p1 / (2pi * sin(pi v))          (bglight.cc:41)
  calcInvPdf(p0,p1,v) = 2pi * sin(pi v) / (p0*p1)          (bglight.cc:42)
with the spheremap of texture.h (u ~ atan2, v = theta/pi).

TPU-native: a fixed NV x NU grid (the reference varies NU per row), CDF
rows as device arrays, vectorized searchsorted inversion over the whole
wavefront.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.lights.base import LightSample, LightHit
from core_tpu.backgrounds import eval_background

DIRAC = False
SIGMA = 1e-6


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BgLight:
    background: Any          # background pytree (evaluated via eval_background)
    u_pdf: jnp.ndarray       # [NV,NU] row-conditional density (normalized)
    u_cdf: jnp.ndarray       # [NV,NU] row-conditional CDF
    v_pdf: jnp.ndarray       # [NV] marginal density (normalized)
    v_cdf: jnp.ndarray       # [NV] marginal CDF
    samples: int = field(metadata=dict(static=True), default=8)
    abs_intersect: bool = field(metadata=dict(static=True), default=False)


def _inv_spheremap_np(u, v):
    """texture.h invSpheremap: (u,v) in [0,1]^2 -> direction."""
    theta = v * np.pi
    phi = -(u * 2.0 * np.pi)
    st, ct = np.sin(theta), np.cos(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), -ct], axis=-1)


def make_bg_light(background, samples=8, nv=128, nu=256,
                  abs_intersect=False) -> BgLight:
    """Rasterize the background onto the spheremap grid and build CDFs
    (host-side; mirrors bglight.cc init)."""
    vs = (np.arange(nv) + 0.5) / nv
    us = (np.arange(nu) + 0.5) / nu
    uu, vv = np.meshgrid(us, vs)               # [NV,NU]
    dirs = _inv_spheremap_np(uu.reshape(-1), vv.reshape(-1))
    rad = np.asarray(eval_background(background,
                                     jnp.asarray(dirs, jnp.float32)))
    energy = rad.mean(axis=-1).reshape(nv, nu)  # color_t::energy = mean
    sin_t = np.sin(np.pi * vs)[:, None]
    f = np.maximum(energy * sin_t, 0.0) + 1e-10

    row_int = f.mean(axis=1)                    # per-row integral
    u_pdf = f / row_int[:, None]                # density wrt uniform [0,1]
    u_cdf = np.cumsum(f, axis=1) / (f.sum(axis=1, keepdims=True))
    v_int = row_int.mean()
    v_pdf = row_int / v_int
    v_cdf = np.cumsum(row_int) / row_int.sum()

    return BgLight(background=background,
                   u_pdf=jnp.asarray(u_pdf, jnp.float32),
                   u_cdf=jnp.asarray(u_cdf, jnp.float32),
                   v_pdf=jnp.asarray(v_pdf, jnp.float32),
                   v_cdf=jnp.asarray(v_cdf, jnp.float32),
                   samples=int(samples), abs_intersect=bool(abs_intersect))


def can_intersect(light: BgLight) -> bool:
    return True


def get_n_samples(light: BgLight) -> int:
    return light.samples


def _inv_spheremap(u, v):
    theta = v * np.pi
    phi = -(u * 2.0 * np.pi)
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), -ct], axis=-1)


def _spheremap(d):
    """Exact inverse of _inv_spheremap: direction -> (u,v) in [0,1]^2.
    (The reference's spheremap/invSpheremap pair, texture.h, uses opposite
    phi signs; we keep the pair self-consistent so pdf lookups match the
    sampled directions.)"""
    u = jnp.mod(-jnp.arctan2(d[..., 1], d[..., 0]) / (2.0 * np.pi), 1.0)
    v = jnp.arccos(jnp.clip(-d[..., 2], -1.0, 1.0)) / np.pi
    return u, v


def _row_decode(table, idx):
    """table [R, C], idx [N] -> per-lane rows [N, C] via a one-hot MXU
    matmul (exact for 0/1 one-hots in f32 at HIGHEST precision).

    A dynamic row gather `table[idx]` runs on the TPU scalar unit —
    profiled at 123 ms/chunk for the bglight CDF rows on the mesh scene —
    while the matmul streams at MXU rate (~2 ms at 524k lanes)."""
    r = table.shape[0]
    io = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], r), 1)
    oh = (io == idx[:, None]).astype(jnp.float32)
    return jax.lax.dot_general(oh, table, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _col_pick(rows_nc, iu):
    """rows [N, C], per-lane column iu [N] -> [N]; fused compare-select-
    reduce (no take_along_axis gather)."""
    io = jax.lax.broadcasted_iota(jnp.int32, rows_nc.shape, 1)
    return jnp.sum(jnp.where(io == iu[:, None], rows_nc, 0.0), axis=1)


def _count_below(cdf_rows, s):
    """First index where cdf >= s == count of entries < s (the
    searchsorted 'left' contract) as a fused compare-reduce."""
    return jnp.sum((cdf_rows < s[..., None]).astype(jnp.int32), axis=-1)


def _sample_uv(light: BgLight, s1, s2):
    """2-D CDF inversion; returns (u, v, pu, pv).  Gather-free: the V
    search is a compare-reduce over the [NV] CDF, the per-lane U row is
    fetched by one-hot matmul, and element picks are compare-select
    reductions (see _row_decode)."""
    nv = light.v_cdf.shape[0]
    nu = light.u_cdf.shape[1]
    iv = jnp.clip(_count_below(light.v_cdf[None, :], s2), 0, nv - 1)
    # [3, NV] side table: cdf, cdf shifted right (prev, 0 at index 0), pdf
    v_prev = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                              light.v_cdf[:-1]])
    v_rows = _row_decode(jnp.stack([light.v_cdf, v_prev, light.v_pdf],
                                   axis=1), iv)          # [N, 3]
    cdf_lo = v_rows[:, 1]
    dv = jnp.maximum(v_rows[:, 0] - cdf_lo, 1e-12)
    v = (iv.astype(jnp.float32) + jnp.clip((s2 - cdf_lo) / dv, 0, 1)) / nv
    pv = v_rows[:, 2]

    row_cdf = _row_decode(light.u_cdf, iv)               # [N, NU]
    iu = jnp.clip(_count_below(row_cdf, s1), 0, nu - 1)
    cdf_lo_u = jnp.where(iu > 0,
                         _col_pick(row_cdf, jnp.maximum(iu - 1, 0)), 0.0)
    du = jnp.maximum(_col_pick(row_cdf, iu) - cdf_lo_u, 1e-12)
    u = (iu.astype(jnp.float32) + jnp.clip((s1 - cdf_lo_u) / du, 0, 1)) / nu
    pu = _col_pick(_row_decode(light.u_pdf, iv), iu)
    return u, v, pu, pv


def _pdf_from_dir(light: BgLight, d):
    u, v = _spheremap(d)
    nv = light.v_cdf.shape[0]
    nu = light.u_cdf.shape[1]
    iv = jnp.clip((v * nv).astype(jnp.int32), 0, nv - 1)
    iu = jnp.clip((u * nu).astype(jnp.int32), 0, nu - 1)
    vp = _row_decode(jnp.stack([light.v_pdf], axis=1), iv)   # [N, 1]
    pv = vp[:, 0]
    pu = _col_pick(_row_decode(light.u_pdf, iv), iu)
    sin_t = jnp.maximum(jnp.sin(np.pi * v), 1e-9)
    return jnp.maximum(pu * pv / (2.0 * np.pi * np.pi * sin_t), SIGMA)


def illum_sample(light: BgLight, sp, s1, s2) -> LightSample:
    u, v, pu, pv = _sample_uv(light, s1, s2)
    wi = _inv_spheremap(u, v)
    sin_t = jnp.maximum(jnp.sin(np.pi * v), 1e-9)
    pdf = jnp.maximum(pu * pv / (2.0 * np.pi * np.pi * sin_t), SIGMA)
    col = eval_background(light.background, wi)
    n = sp.p.shape[0]
    return LightSample(valid=jnp.ones(n, bool), wi=wi,
                       dist=jnp.full(n, -1.0), col=col, pdf=pdf)


def illuminate(light: BgLight, sp) -> LightSample:
    raise TypeError("background light is not dirac")


def intersect_light(light: BgLight, rays) -> LightHit:
    d = -rays.d if light.abs_intersect else rays.d
    pdf = _pdf_from_dir(light, d)
    col = eval_background(light.background, rays.d)
    n = rays.d.shape[0]
    return LightHit(valid=jnp.ones(n, bool), t=jnp.full(n, -1.0),
                    col=col, ipdf=1.0 / pdf)


def illum_pdf(light: BgLight, sp, p_light):
    d = p_light - sp.p
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    return _pdf_from_dir(light, d)
