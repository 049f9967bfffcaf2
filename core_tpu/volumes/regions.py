"""Volume regions (participating media).

Reimplements the reference volume plugins (src/volumes/: UniformVolume,
ExpDensityVolume, NoiseVolume, GridVolume; region API
include/core_api/volume.h:41-95): per-point sigma_a/sigma_s/emission inside
an AABB, Schlick phase function
    p(wl,ws) = (1-k^2) / (4pi (1 - k cos)^2),  k = 1.55g - 0.55g^3
(volume.h:70-74), and optical depth `tau` (analytic for uniform,
ray-marched for density volumes, DensityVolume::tau).

All functions are wavefront-vectorized: p is [...,3], returns [...,3]
colors.  Dispatch on python type like lights/base.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.textures.noise import turbulence as _noise_turbulence, generator


def _static(default):
    return field(metadata=dict(static=True), default=default)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class UniformVolume:
    s_a: jnp.ndarray      # [3]
    s_s: jnp.ndarray      # [3]
    l_e: jnp.ndarray      # [3]
    g: jnp.ndarray        # []
    bmin: jnp.ndarray     # [3]
    bmax: jnp.ndarray     # [3]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ExpDensityVolume:
    """Density = a * exp(-b * height) (ExpDensityVolume.cc)."""
    s_a: jnp.ndarray
    s_s: jnp.ndarray
    l_e: jnp.ndarray
    g: jnp.ndarray
    bmin: jnp.ndarray
    bmax: jnp.ndarray
    a: jnp.ndarray        # []
    b: jnp.ndarray        # []


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NoiseVolume:
    """Turbulence-noise density (NoiseVolume.cc): d = turbulence^sharpness,
    scaled/covered."""
    s_a: jnp.ndarray
    s_s: jnp.ndarray
    l_e: jnp.ndarray
    g: jnp.ndarray
    bmin: jnp.ndarray
    bmax: jnp.ndarray
    sharpness: jnp.ndarray
    cover: jnp.ndarray
    density: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridVolume:
    """Voxel-grid density with trilinear interpolation (GridVolume.cc)."""
    s_a: jnp.ndarray
    s_s: jnp.ndarray
    l_e: jnp.ndarray
    g: jnp.ndarray
    bmin: jnp.ndarray
    bmax: jnp.ndarray
    grid: jnp.ndarray     # [X,Y,Z] densities


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SkyVolume:
    """Atmosphere-style volume (SkyVolume.cc): Rayleigh + Mie scattering
    with exponential height falloff; s_a is unused in the reference (pure
    scattering), kept for the shared region API.  The phase function is a
    Rayleigh/Mie blend (see phase_hg special case)."""
    s_a: jnp.ndarray
    s_s: jnp.ndarray      # [3] = s_ray (Rayleigh) baked per-channel
    l_e: jnp.ndarray
    g: jnp.ndarray        # Mie anisotropy
    bmin: jnp.ndarray
    bmax: jnp.ndarray
    s_ray: jnp.ndarray    # [] Rayleigh scattering scale
    s_mie: jnp.ndarray    # [] Mie scattering scale
    scale: jnp.ndarray    # [] height falloff scale


def make_sky_volume(s_ray=0.05, s_mie=0.01, l_e=0.0, g=0.8,
                    bmin=(0, 0, 0), bmax=(1, 1, 1), scale=None):
    le = np.broadcast_to(np.asarray(l_e, np.float32), (3,))
    # Rayleigh 1/lambda^4 channel weights (normalized to green)
    lam = np.array([0.685, 0.535, 0.475], np.float32)
    ray_rgb = (0.535 / lam) ** 4
    total = np.float32(s_ray) * ray_rgb + np.float32(s_mie)
    if scale is None:
        scale = 0.5 * (np.asarray(bmax)[2] - np.asarray(bmin)[2] + 1e-6)
    return _mk(SkyVolume, total * 0.0, total, le, g, bmin, bmax,
               s_ray=s_ray, s_mie=s_mie, scale=max(float(scale), 1e-6))


def _mk(cls, sigma_a, sigma_s, l_e, g, bmin, bmax, **kw):
    f3 = lambda x: jnp.asarray(np.asarray(x, np.float32).reshape(3))
    return cls(s_a=f3(sigma_a), s_s=f3(sigma_s), l_e=f3(l_e),
               g=jnp.asarray(g, jnp.float32), bmin=f3(bmin), bmax=f3(bmax),
               **{k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})


def make_uniform_volume(sigma_a=0.1, sigma_s=0.1, l_e=0.0, g=0.0,
                        bmin=(0, 0, 0), bmax=(1, 1, 1)):
    sa = np.broadcast_to(np.asarray(sigma_a, np.float32), (3,))
    ss = np.broadcast_to(np.asarray(sigma_s, np.float32), (3,))
    le = np.broadcast_to(np.asarray(l_e, np.float32), (3,))
    return _mk(UniformVolume, sa, ss, le, g, bmin, bmax)


def make_expdensity_volume(sigma_a=0.1, sigma_s=0.1, l_e=0.0, g=0.0,
                           bmin=(0, 0, 0), bmax=(1, 1, 1), a=1.0, b=1.0):
    sa = np.broadcast_to(np.asarray(sigma_a, np.float32), (3,))
    ss = np.broadcast_to(np.asarray(sigma_s, np.float32), (3,))
    le = np.broadcast_to(np.asarray(l_e, np.float32), (3,))
    return _mk(ExpDensityVolume, sa, ss, le, g, bmin, bmax, a=a, b=b)


def make_noise_volume(sigma_a=0.1, sigma_s=0.1, l_e=0.0, g=0.0,
                      bmin=(0, 0, 0), bmax=(1, 1, 1), sharpness=1.0,
                      cover=1.0, density=1.0):
    sa = np.broadcast_to(np.asarray(sigma_a, np.float32), (3,))
    ss = np.broadcast_to(np.asarray(sigma_s, np.float32), (3,))
    le = np.broadcast_to(np.asarray(l_e, np.float32), (3,))
    return _mk(NoiseVolume, sa, ss, le, g, bmin, bmax,
               sharpness=max(sharpness, 1e-3), cover=cover, density=density)


def make_grid_volume(grid, sigma_a=0.1, sigma_s=0.1, l_e=0.0, g=0.0,
                     bmin=(0, 0, 0), bmax=(1, 1, 1)):
    sa = np.broadcast_to(np.asarray(sigma_a, np.float32), (3,))
    ss = np.broadcast_to(np.asarray(sigma_s, np.float32), (3,))
    le = np.broadcast_to(np.asarray(l_e, np.float32), (3,))
    return _mk(GridVolume, sa, ss, le, g, bmin, bmax,
               grid=np.asarray(grid, np.float32))


def load_density_grid(path: str) -> np.ndarray:
    """Load a voxel density grid [X,Y,Z] in [0,1].

    POV-Ray df3 (the reference GridVolume.cc:40-125 format): three
    big-endian uint16 dimensions, then X-fastest voxel bytes; 1/2/4-byte
    unsigned voxels are normalized to [0,1] (the reference always reads
    one byte — multi-byte support is a superset).  '.npy' arrays load
    verbatim as the native convenience format.
    """
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 6:
        raise ValueError(f"df3 file too short: {path}")
    dims = [(raw[2 * i] << 8) | raw[2 * i + 1] for i in range(3)]
    nx, ny, nz = dims
    n_vox = nx * ny * nz
    body = raw[6:]
    if n_vox <= 0 or len(body) % n_vox != 0:
        raise ValueError(f"df3 {path}: {len(body)} bytes for {dims} voxels")
    bpv = len(body) // n_vox
    if bpv not in (1, 2, 4):
        raise ValueError(f"df3 {path}: unsupported {bpv} bytes/voxel")
    dt = {1: ">u1", 2: ">u2", 4: ">u4"}[bpv]
    vals = np.frombuffer(body, dtype=dt).astype(np.float64)
    vals /= float(2 ** (8 * bpv) - 1)
    # file order: z-major, y, then x fastest -> reshape [Z,Y,X], transpose
    return np.ascontiguousarray(
        vals.reshape(nz, ny, nx).transpose(2, 1, 0).astype(np.float32))


def _inside(vol, p):
    return jnp.all((p >= vol.bmin[None]) & (p <= vol.bmax[None]), axis=-1)


def density(vol, p):
    """Normalized density in [0,inf) at p (DensityVolume::Density)."""
    if isinstance(vol, UniformVolume):
        return jnp.ones(p.shape[:-1], jnp.float32)
    if isinstance(vol, ExpDensityVolume):
        h = p[..., 2] - vol.bmin[2]
        return vol.a * jnp.exp(-vol.b * h)
    if isinstance(vol, SkyVolume):
        h = jnp.maximum(p[..., 2] - vol.bmin[2], 0.0)
        return jnp.exp(-h / vol.scale)
    if isinstance(vol, NoiseVolume):
        t = _noise_turbulence(generator("newperlin"), p, 3, 1.0, False)
        d = jnp.power(jnp.maximum(t, 1e-6), vol.sharpness)
        d = vol.density * jnp.clip(d + vol.cover - 1.0, 0.0, None)
        return d
    if isinstance(vol, GridVolume):
        rel = (p - vol.bmin[None]) / jnp.maximum(
            (vol.bmax - vol.bmin)[None], 1e-9)
        gx, gy, gz = vol.grid.shape
        fx = jnp.clip(rel[..., 0], 0, 1) * (gx - 1)
        fy = jnp.clip(rel[..., 1], 0, 1) * (gy - 1)
        fz = jnp.clip(rel[..., 2], 0, 1) * (gz - 1)
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        z0 = jnp.floor(fz).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, gx - 1)
        y1 = jnp.minimum(y0 + 1, gy - 1)
        z1 = jnp.minimum(z0 + 1, gz - 1)
        tx = fx - x0
        ty = fy - y0
        tz = fz - z0
        g = vol.grid
        c = ((g[x0, y0, z0] * (1 - tx) + g[x1, y0, z0] * tx) * (1 - ty)
             + (g[x0, y1, z0] * (1 - tx) + g[x1, y1, z0] * tx) * ty) * (1 - tz) \
            + ((g[x0, y0, z1] * (1 - tx) + g[x1, y0, z1] * tx) * (1 - ty)
               + (g[x0, y1, z1] * (1 - tx) + g[x1, y1, z1] * tx) * ty) * tz
        return c
    raise TypeError(type(vol))


def sigma_a(vol, p, v=None):
    d = density(vol, p) * _inside(vol, p)
    return vol.s_a[None] * d[..., None]


def sigma_s(vol, p, v=None):
    d = density(vol, p) * _inside(vol, p)
    return vol.s_s[None] * d[..., None]


def sigma_t(vol, p, v=None):
    d = density(vol, p) * _inside(vol, p)
    return (vol.s_a + vol.s_s)[None] * d[..., None]


def emission(vol, p, v=None):
    d = density(vol, p) * _inside(vol, p)
    return vol.l_e[None] * d[..., None]


def phase_hg(vol, w_l, w_s):
    """Schlick phase approximation (volume.h:70-74).  SkyVolume blends
    Rayleigh 3/(16pi)(1+cos^2) with Schlick-Mie by scattering weights
    (SkyIntegrator.cc)."""
    cos = jnp.sum(w_l * w_s, axis=-1)
    g = vol.g
    k = 1.55 * g - 0.55 * g * g * g
    schlick = (1.0 / (4.0 * np.pi)) * (1.0 - k * k) \
        / jnp.maximum((1.0 - k * cos) ** 2, 1e-9)
    if isinstance(vol, SkyVolume):
        ray_ph = 3.0 / (16.0 * np.pi) * (1.0 + cos * cos)
        wr = vol.s_ray / jnp.maximum(vol.s_ray + vol.s_mie, 1e-9)
        return wr * ray_ph + (1.0 - wr) * schlick
    return schlick


def cross_bb(vol, rays):
    """Ray-AABB interval clipped to [tmin, tmax]; (hit, t0, t1)."""
    tmax_cap = jnp.where(rays.tmax > 0, rays.tmax, 3.0e38)
    inv_d = 1.0 / jnp.where(jnp.abs(rays.d) < 1e-20,
                            jnp.where(rays.d < 0, -1e-20, 1e-20), rays.d)
    a = (vol.bmin[None] - rays.o) * inv_d
    b = (vol.bmax[None] - rays.o) * inv_d
    tn = jnp.minimum(a, b)
    tf = jnp.maximum(a, b)
    t0 = jnp.maximum(jnp.max(tn, axis=-1), 0.0)
    t1 = jnp.minimum(jnp.min(tf, axis=-1), tmax_cap)
    return t1 > t0, t0, t1


def tau(vol, rays, step: float = 1.0, offset: float = 0.5, n_steps: int = 32):
    """Optical depth along rays -> [N,3].

    Uniform: analytic dist*(s_a+s_s) (UniformVolume::tau); density volumes:
    fixed-step midpoint march (DensityVolume::tau) with a static step count
    (TPU static shapes; `step` rescales within the clipped interval).
    """
    hit, t0, t1 = cross_bb(vol, rays)
    if isinstance(vol, UniformVolume):
        dist = jnp.where(hit, t1 - t0, 0.0)
        return dist[..., None] * (vol.s_a + vol.s_s)[None]
    dt = (t1 - t0) / n_steps
    acc = jnp.zeros(rays.o.shape, jnp.float32)
    for i in range(n_steps):
        t = t0 + (i + offset) * dt
        p = rays.o + rays.d * t[..., None]
        acc = acc + sigma_t(vol, p) * dt[..., None]
    return jnp.where(hit[..., None], acc, 0.0)
