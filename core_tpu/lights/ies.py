"""Photometric IES profile light.

Reference: src/lights/iesLight.cc (272 LoC) + the IESNA LM-63 parser in
include/utilities/iesUtils.h (365 LoC).  A point light whose intensity is
modulated by a measured candela distribution over the vertical angle
(azimuth-averaged here — the reference interpolates the 2-D web the same
way for the common axially-symmetric profiles).

TPU shape: the profile is resampled host-side onto a uniform 181-entry
grid (1 degree); per-sample lookups are a one-hot matmul decode + lerp
(scene.onehot_decode) instead of a dynamic gather.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.mathutils import dot, normalize
from core_tpu.lights.base import LightSample, LightHit

DIRAC = True
PROFILE_RES = 181   # one entry per degree, 0..180


def parse_ies(text: str):
    """Minimal IESNA LM-63 parser (iesUtils.h IESData_t::parseIESFile):
    returns (v_angles [nv], candela [nv]) azimuth-averaged, normalized to
    max 1."""
    lines = text.splitlines()
    i = 0
    while i < len(lines) and not lines[i].upper().startswith("TILT"):
        i += 1
    assert i < len(lines), "not an IES file (no TILT line)"
    if "INCLUDE" in lines[i].upper():
        i += 4  # tilt block: angles-count, angles, factors
    nums: list[float] = []
    for ln in lines[i + 1:]:
        nums.extend(float(t) for t in ln.replace(",", " ").split())
    # header: nlamps, lumens/lamp, multiplier, n_v, n_h, photometric type,
    # units, width, length, height, ballast, future, input watts
    n_v = int(nums[3])
    n_h = int(nums[4])
    mult = nums[2]
    idx = 13
    v_angles = np.asarray(nums[idx:idx + n_v])
    idx += n_v
    h_angles = np.asarray(nums[idx:idx + n_h])
    idx += n_h
    candela = np.asarray(nums[idx:idx + n_v * n_h]).reshape(n_h, n_v)
    profile = candela.mean(axis=0) * mult
    peak = profile.max()
    if peak > 0:
        profile = profile / peak
    return v_angles, profile


def resample_profile(v_angles, profile, res: int = PROFILE_RES):
    """Uniform 0..180-degree grid (linear interp, zero outside the data)."""
    grid = np.linspace(0.0, 180.0, res)
    return np.interp(grid, v_angles, profile, left=profile[0], right=0.0)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IesLight:
    pos: jnp.ndarray          # [3]
    ndir: jnp.ndarray         # [3] unit axis (0-degree direction)
    color: jnp.ndarray        # [3] color * power
    profile: jnp.ndarray      # [PROFILE_RES] normalized candela vs angle
    samples: int = field(metadata=dict(static=True), default=1)


def make_ies_light(pos, to, color, power, ies_text: str,
                   samples: int = 1) -> IesLight:
    v, prof = parse_ies(ies_text)
    table = resample_profile(v, prof)
    ndir = np.asarray(to, np.float64) - np.asarray(pos, np.float64)
    ndir = ndir / max(np.linalg.norm(ndir), 1e-12)
    return IesLight(pos=jnp.asarray(pos, jnp.float32),
                    ndir=jnp.asarray(ndir, jnp.float32),
                    color=jnp.asarray(color, jnp.float32) * power,
                    profile=jnp.asarray(table, jnp.float32),
                    samples=samples)


def can_intersect(light: IesLight) -> bool:
    return False


def get_n_samples(light: IesLight) -> int:
    return light.samples


def _intensity(light: IesLight, wi):
    """Profile value at angle(wi -> light axis); wi points surface->light."""
    cosang = jnp.clip(dot(-wi, light.ndir[None]), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosang))
    f = jnp.clip(ang, 0.0, 180.0)
    i0 = jnp.clip(f.astype(jnp.int32), 0, PROFILE_RES - 2)
    frac = f - i0.astype(jnp.float32)
    from core_tpu.scene import onehot_decode
    rows = onehot_decode(
        jnp.stack([light.profile[:-1], light.profile[1:]], axis=0),
        i0, PROFILE_RES - 1)
    return rows[0] * (1.0 - frac) + rows[1] * frac


def illuminate(light: IesLight, sp) -> LightSample:
    ldir = light.pos[None] - sp.p
    dist2 = jnp.sum(ldir * ldir, axis=-1)
    dist = jnp.sqrt(dist2)
    wi = ldir / jnp.maximum(dist[..., None], 1e-12)
    inten = _intensity(light, wi)
    col = light.color[None] * (inten / jnp.maximum(dist2, 1e-12))[..., None]
    valid = (dist > 0.0) & (inten > 0.0)
    return LightSample(valid=valid, wi=wi, dist=dist, col=col,
                       pdf=jnp.ones_like(dist))


def illum_sample(light: IesLight, sp, s1, s2) -> LightSample:
    return illuminate(light, sp)


def intersect_light(light: IesLight, rays) -> LightHit:
    n = rays.d.shape[0]
    z = jnp.zeros(n)
    return LightHit(valid=jnp.zeros(n, bool), t=z - 1.0,
                    col=jnp.zeros((n, 3)), ipdf=z)


def illum_pdf(light: IesLight, sp, p_light):
    return jnp.ones(sp.p.shape[0])
