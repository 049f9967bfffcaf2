"""Backgrounds (environment emitters).

Reference: src/backgrounds/ — constant (textureback.cc:213-246), gradient
(gradientback.cc), sunsky (Preetham, sunsky.cc), darksky (TheBounty's
improved spectral daylight, darksky.cc), texture-mapped env (textureback.cc).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ConstantBackground:
    color: jnp.ndarray   # [3], already * power
    ibl: bool = field(metadata=dict(static=True), default=False)
    ibl_samples: int = field(metadata=dict(static=True), default=8)


def make_constant_background(color, power=1.0, ibl=False, ibl_samples=8):
    return ConstantBackground(
        color=jnp.asarray(np.asarray(color, np.float32) * power),
        ibl=bool(ibl), ibl_samples=int(ibl_samples))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GradientBackground:
    horizon: jnp.ndarray        # [3]
    zenith: jnp.ndarray         # [3]
    horizon_ground: jnp.ndarray # [3]
    zenith_ground: jnp.ndarray  # [3]
    ibl: bool = field(metadata=dict(static=True), default=False)
    ibl_samples: int = field(metadata=dict(static=True), default=8)


def make_gradient_background(horizon, zenith, horizon_ground=None,
                             zenith_ground=None, power=1.0, ibl=False,
                             ibl_samples=8):
    h = np.asarray(horizon, np.float32) * power
    z = np.asarray(zenith, np.float32) * power
    hg = h if horizon_ground is None else np.asarray(horizon_ground, np.float32) * power
    zg = z if zenith_ground is None else np.asarray(zenith_ground, np.float32) * power
    return GradientBackground(jnp.asarray(h), jnp.asarray(z), jnp.asarray(hg),
                              jnp.asarray(zg), bool(ibl), int(ibl_samples))


def eval_background(bg, d):
    """Radiance of the environment in direction d [N,3] -> [N,3]."""
    if bg is None:
        return jnp.zeros_like(d)
    if isinstance(bg, ConstantBackground):
        return jnp.broadcast_to(bg.color, d.shape)
    if isinstance(bg, SunSkyBackground):
        return _eval_sunsky(bg, d)
    if isinstance(bg, DarkSkyBackground):
        return _eval_darksky(bg, d)
    if isinstance(bg, TextureBackground):
        return _eval_texture_bg(bg, d)
    if isinstance(bg, GradientBackground):
        # reference gradientback.cc: blend on z
        z = d[..., 2]
        up = jnp.clip(z, 0.0, 1.0)[..., None]
        dn = jnp.clip(-z, 0.0, 1.0)[..., None]
        sky = bg.zenith[None] * up + bg.horizon[None] * (1.0 - up)
        gnd = bg.zenith_ground[None] * dn + bg.horizon_ground[None] * (1.0 - dn)
        return jnp.where((z >= 0.0)[..., None], sky, gnd)
    raise TypeError(f"unknown background {type(bg)}")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SunSkyBackground:
    """Preetham-Shirley-Smits analytic daylight (reference
    src/backgrounds/sunsky.cc:40-170): Perez luminance/chromaticity
    functions with turbidity-derived coefficients, xyY -> linear RGB."""
    sun_dir: jnp.ndarray       # [3] unit, toward the sun
    theta_s: jnp.ndarray      # [] sun zenith angle
    phi_s: jnp.ndarray        # []
    zenith: jnp.ndarray       # [3] (Y, x, y) zenith values
    perez_y_lum: jnp.ndarray  # [5]
    perez_x: jnp.ndarray      # [5]
    perez_y: jnp.ndarray      # [5]
    power: jnp.ndarray        # []
    ibl: bool = field(metadata=dict(static=True), default=False)
    ibl_samples: int = field(metadata=dict(static=True), default=8)


def make_sunsky_background(sun_dir, turbidity=4.0, a_var=1.0, b_var=1.0,
                           c_var=1.0, d_var=1.0, e_var=1.0, power=1.0,
                           ibl=False, ibl_samples=8) -> SunSkyBackground:
    d = np.asarray(sun_dir, np.float64)
    d = d / max(np.linalg.norm(d), 1e-20)
    theta_s = float(np.arccos(np.clip(d[2], -1.0, 1.0)))
    phi_s = float(np.arctan2(d[1], d[0]))
    t2, t3 = theta_s ** 2, theta_s ** 3
    T = float(turbidity)
    T2 = T * T
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * theta_s)
    zen_y_lum = ((4.0453 * T - 4.9710) * np.tan(chi)
                 - 0.2155 * T + 2.4192) * 1000.0
    zen_x = ((0.00165 * t3 - 0.00375 * t2 + 0.00209 * theta_s) * T2
             + (-0.02903 * t3 + 0.06377 * t2 - 0.03202 * theta_s + 0.00394) * T
             + (0.11693 * t3 - 0.21196 * t2 + 0.06052 * theta_s + 0.25886))
    zen_y = ((0.00275 * t3 - 0.00610 * t2 + 0.00317 * theta_s) * T2
             + (-0.04214 * t3 + 0.08970 * t2 - 0.04153 * theta_s + 0.00516) * T
             + (0.15346 * t3 - 0.26756 * t2 + 0.06670 * theta_s + 0.26688))
    perez_y_lum = np.array([(0.17872 * T - 1.46303) * a_var,
                            (-0.35540 * T + 0.42749) * b_var,
                            (-0.02266 * T + 5.32505) * c_var,
                            (0.12064 * T - 2.57705) * d_var,
                            (-0.06696 * T + 0.37027) * e_var])
    perez_x = np.array([(-0.01925 * T - 0.25922) * a_var,
                        (-0.06651 * T + 0.00081) * b_var,
                        (-0.00041 * T + 0.21247) * c_var,
                        (-0.06409 * T - 0.89887) * d_var,
                        (-0.00325 * T + 0.04517) * e_var])
    perez_y = np.array([(-0.01669 * T - 0.26078) * a_var,
                        (-0.09495 * T + 0.00921) * b_var,
                        (-0.00792 * T + 0.21023) * c_var,
                        (-0.04405 * T - 1.65369) * d_var,
                        (-0.01092 * T + 0.05291) * e_var])
    return SunSkyBackground(
        sun_dir=jnp.asarray(d, jnp.float32),
        theta_s=jnp.asarray(theta_s, jnp.float32),
        phi_s=jnp.asarray(phi_s, jnp.float32),
        zenith=jnp.asarray([zen_y_lum, zen_x, zen_y], jnp.float32),
        perez_y_lum=jnp.asarray(perez_y_lum, jnp.float32),
        perez_x=jnp.asarray(perez_x, jnp.float32),
        perez_y=jnp.asarray(perez_y, jnp.float32),
        power=jnp.asarray(power, jnp.float32),
        ibl=bool(ibl), ibl_samples=int(ibl_samples))


def _perez(lam, theta_s, theta, gamma, lvz):
    """PerezFunction (sunsky.cc:87-110) with exp-overflow clamps."""
    def safe_exp(x):
        return jnp.exp(jnp.minimum(x, 230.0))
    cs = jnp.cos(theta_s)
    cg = jnp.cos(gamma)
    den = (1.0 + lam[0] * safe_exp(lam[1])) \
        * (1.0 + lam[2] * safe_exp(lam[3] * theta_s) + lam[4] * cs * cs)
    num = (1.0 + lam[0] * safe_exp(lam[1] / jnp.cos(theta))) \
        * (1.0 + lam[2] * safe_exp(lam[3] * gamma) + lam[4] * cg * cg)
    return lvz * num / den


def _eval_sunsky(bg: SunSkyBackground, d):
    z = d[..., 2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    # horizon stretch + fade below horizon (sunsky.cc:125-131)
    hfade_lin = jnp.clip(1.0 - (theta / np.pi - 0.5) * 2.0, 0.0, 1.0)
    hfade = jnp.where(theta > 0.5 * np.pi,
                      hfade_lin * hfade_lin * (3.0 - 2.0 * hfade_lin), 1.0)
    theta = jnp.minimum(theta, 0.5 * np.pi - 1e-4)
    # nighttime fade (sunsky.cc:134-140)
    nlin = jnp.clip(1.0 - (0.5 - theta / np.pi) * 2.0, 0.0, 1.0) \
        * jnp.clip(1.0 - (bg.theta_s / np.pi - 0.5) * 2.0, 0.0, 1.0)
    nfade = jnp.where(bg.theta_s > 0.5 * np.pi,
                      nlin * nlin * (3.0 - 2.0 * nlin), 1.0)
    phi = jnp.where((jnp.abs(d[..., 0]) < 1e-12) & (jnp.abs(d[..., 1]) < 1e-12),
                    0.5 * np.pi, jnp.arctan2(d[..., 1], d[..., 0]))
    cospsi = jnp.sin(theta) * jnp.sin(bg.theta_s) * jnp.cos(bg.phi_s - phi) \
        + jnp.cos(theta) * jnp.cos(bg.theta_s)
    gamma = jnp.arccos(jnp.clip(cospsi, -1.0, 1.0))
    x = _perez(bg.perez_x, bg.theta_s, theta, gamma, bg.zenith[1])
    y = _perez(bg.perez_y, bg.theta_s, theta, gamma, bg.zenith[2])
    Y = 6.666666667e-5 * nfade * hfade * _perez(bg.perez_y_lum, bg.theta_s,
                                                theta, gamma, bg.zenith[0])
    y_safe = jnp.where(jnp.abs(y) > 1e-9, y, 1.0)
    X = (x / y_safe) * Y
    Z = ((1.0 - x - y) / y_safe) * Y
    r = 3.240479 * X - 1.537150 * Y - 0.498535 * Z
    g = -0.969256 * X + 1.875992 * Y + 0.041556 * Z
    b = 0.055648 * X - 0.204043 * Y + 1.057311 * Z
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
    rgb = jnp.where((jnp.abs(y) > 1e-9)[..., None], rgb, 0.0)
    return rgb * bg.power


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DarkSkyBackground:
    """TheBounty's improved spectral daylight (src/backgrounds/darksky.cc):
    Preetham Perez sky with per-channel normalization baked into the Perez
    coefficient vectors (darksky.cc:prePerez), an altitude shift applied to
    both the sun and every evaluated direction, color-space-aware xyY->RGB
    output with exposure + simple gamma encode (utilities/ColorConv.h), and
    a night mode that tints the sky deep blue (darksky.cc:getSkyCol)."""
    sun_dir: jnp.ndarray      # [3] unit, altitude-shifted
    zenith: jnp.ndarray       # [3] (Y, x, y)
    perez_lum: jnp.ndarray    # [6] coefficients + 1/prePerez normalizer
    perez_x: jnp.ndarray      # [6]
    perez_y: jnp.ndarray      # [6]
    conv_mat: jnp.ndarray     # [3,3] XYZ->RGB for the chosen color space
    bright: jnp.ndarray       # [] skyBrightness
    power: jnp.ndarray        # [] bgLight power scale
    altitude: jnp.ndarray     # []
    exposure: float = field(metadata=dict(static=True), default=1.0)
    night: bool = field(metadata=dict(static=True), default=False)
    clamp_rgb: bool = field(metadata=dict(static=True), default=True)
    gamma_enc: bool = field(metadata=dict(static=True), default=True)
    ibl: bool = field(metadata=dict(static=True), default=False)
    ibl_samples: int = field(metadata=dict(static=True), default=8)


def _darksky_pre_perez(lam, theta_s, cos2_theta_s):
    """Normalizer so the Perez function is 1 looking at the zenith
    (darksky.cc:prePerez)."""
    p = ((1.0 + lam[0] * np.exp(lam[1]))
         * (1.0 + lam[2] * np.exp(lam[3] * theta_s)
            + lam[4] * cos2_theta_s))
    return 0.0 if p == 0.0 else 1.0 / p


def make_darksky_background(sun_dir, turbidity=4.0, a_var=1.0, b_var=1.0,
                            c_var=1.0, d_var=1.0, e_var=1.0, power=1.0,
                            bright=1.0, altitude=0.0, night=False,
                            exposure=1.0, clamp_rgb=True, gamma_enc=True,
                            color_space="CIE (E)", ibl=False,
                            ibl_samples=8) -> DarkSkyBackground:
    from core_tpu.utils.colorconv import XYZ_TO_RGB
    d = np.asarray(sun_dir, np.float64).copy()
    d[2] += altitude
    d = d / max(np.linalg.norm(d), 1e-20)
    theta_s = float(np.arccos(np.clip(d[2], -1.0, 1.0)))
    cos2 = d[2] * d[2]
    t2, t3 = theta_s ** 2, theta_s ** 3
    T = float(turbidity)
    T2 = T * T
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * theta_s)
    zen_lum = ((4.0453 * T - 4.9710) * np.tan(chi)
               - 0.2155 * T + 2.4192) * 1000.0
    zen_x = ((0.00165 * t3 - 0.00374 * t2 + 0.00209 * theta_s) * T2
             + (-0.02902 * t3 + 0.06377 * t2 - 0.03202 * theta_s + 0.00394) * T
             + (0.11693 * t3 - 0.21196 * t2 + 0.06052 * theta_s + 0.25885))
    zen_y = ((0.00275 * t3 - 0.00610 * t2 + 0.00316 * theta_s) * T2
             + (-0.04214 * t3 + 0.08970 * t2 - 0.04153 * theta_s + 0.00515) * T
             + (0.15346 * t3 - 0.26756 * t2 + 0.06669 * theta_s + 0.26688))
    # darksky applies the a..e user scales to the luminance channel only
    # (darksky.cc:108-127)
    p_lum = np.array([(0.17872 * T - 1.46303) * a_var,
                      (-0.35540 * T + 0.42749) * b_var,
                      (-0.02266 * T + 5.32505) * c_var,
                      (0.12064 * T - 2.57705) * d_var,
                      (-0.06696 * T + 0.37027) * e_var, 0.0])
    p_x = np.array([-0.01925 * T - 0.25922, -0.06651 * T + 0.00081,
                    -0.00041 * T + 0.21247, -0.06409 * T - 0.89887,
                    -0.00325 * T + 0.04517, 0.0])
    p_y = np.array([-0.01669 * T - 0.26078, -0.09495 * T + 0.00921,
                    -0.00792 * T + 0.21023, -0.04405 * T - 1.65369,
                    -0.01092 * T + 0.05291, 0.0])
    for p in (p_lum, p_x, p_y):
        p[5] = _darksky_pre_perez(p, theta_s, cos2)
    return DarkSkyBackground(
        sun_dir=jnp.asarray(d, jnp.float32),
        zenith=jnp.asarray([zen_lum, zen_x, zen_y], jnp.float32),
        perez_lum=jnp.asarray(p_lum, jnp.float32),
        perez_x=jnp.asarray(p_x, jnp.float32),
        perez_y=jnp.asarray(p_y, jnp.float32),
        conv_mat=jnp.asarray(XYZ_TO_RGB[color_space]),
        bright=jnp.asarray(bright, jnp.float32),
        power=jnp.asarray(power, jnp.float32),
        altitude=jnp.asarray(altitude, jnp.float32),
        exposure=float(exposure), night=bool(night),
        clamp_rgb=bool(clamp_rgb), gamma_enc=bool(gamma_enc),
        ibl=bool(ibl), ibl_samples=int(ibl_samples))


def darksky_sun_color(bg: DarkSkyBackground, turbidity: float):
    """Attenuated spectral sun color for darksky's auto-created 'Real Sun'
    (darksky.cc:getAttenuatedSunColor).  Build-time numpy."""
    from core_tpu.sampling.sunspectrum import attenuated_sun_xyz
    from core_tpu.utils.colorconv import xyz_to_rgb
    cos_ts = float(np.asarray(bg.sun_dir)[2])
    xyz = attenuated_sun_xyz(cos_ts, turbidity)
    rgb = xyz_to_rgb(xyz[None], np.asarray(bg.conv_mat),
                     clamp=bg.clamp_rgb, gamma_encode=True)[0]
    if bg.night:
        rgb = rgb * np.array([0.8, 0.8, 1.0])
    return np.asarray(rgb, np.float32)


def _darksky_perez(lam, cos_theta, gamma, cos_gamma2):
    """darksky.cc:PerezFunction — numerator * precomputed normalizer."""
    num = ((1.0 + lam[0] * jnp.exp(lam[1] / cos_theta))
           * (1.0 + lam[2] * jnp.exp(lam[3] * gamma) + lam[4] * cos_gamma2))
    return num * lam[5]


def _eval_darksky(bg: DarkSkyBackground, d):
    from core_tpu.utils.colorconv import xyy_to_xyz, xyz_to_rgb
    # altitude-shift the view direction the same way the sun was shifted
    # (darksky.cc:getSkyCol)
    w = d + jnp.array([0.0, 0.0, 1.0]) * bg.altitude
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-20)
    cos_theta = jnp.maximum(w[..., 2], 1e-6)
    cos_gamma = jnp.clip(jnp.sum(w * bg.sun_dir, axis=-1), -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)
    cg2 = cos_gamma * cos_gamma
    x = _darksky_perez(bg.perez_x, cos_theta, gamma, cg2) * bg.zenith[1]
    y = _darksky_perez(bg.perez_y, cos_theta, gamma, cg2) * bg.zenith[2]
    Y = _darksky_perez(bg.perez_lum, cos_theta, gamma, cg2) \
        * bg.zenith[0] * 6.66666667e-5
    xyz = xyy_to_xyz(x, y, Y, exposure=bg.exposure)
    rgb = xyz_to_rgb(xyz, bg.conv_mat, clamp=bg.clamp_rgb,
                     gamma_encode=bg.gamma_enc)
    if bg.night:
        rgb = rgb * jnp.array([0.05, 0.05, 0.08])
    return rgb * (bg.bright * bg.power)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TextureBackground:
    """Texture-mapped environment (reference
    src/backgrounds/textureback.cc:30-160): sphere or angular projection,
    Z-axis rotation, power scale."""
    ctex: Any                 # CompiledTextures
    tex_id: jnp.ndarray       # [] i32
    power: jnp.ndarray        # []
    rot_cos: jnp.ndarray      # [] cos(rotation)
    rot_sin: jnp.ndarray      # []
    projection: str = field(metadata=dict(static=True), default="sphere")
    ibl: bool = field(metadata=dict(static=True), default=False)
    ibl_samples: int = field(metadata=dict(static=True), default=8)


def make_texture_background(ctex, tex_id=0, power=1.0, rotation=0.0,
                            projection="sphere", ibl=False,
                            ibl_samples=8) -> TextureBackground:
    rot = np.radians(float(rotation))
    return TextureBackground(ctex=ctex,
                             tex_id=jnp.asarray(int(tex_id), jnp.int32),
                             power=jnp.asarray(power, jnp.float32),
                             rot_cos=jnp.asarray(np.cos(rot), jnp.float32),
                             rot_sin=jnp.asarray(np.sin(rot), jnp.float32),
                             projection=str(projection), ibl=bool(ibl),
                             ibl_samples=int(ibl_samples))


def _eval_texture_bg(bg: TextureBackground, d):
    from core_tpu.textures.base import eval_texture
    # rotate around Z (textureback.cc:141-147)
    x = bg.rot_cos * d[..., 0] + bg.rot_sin * d[..., 1]
    y = -bg.rot_sin * d[..., 0] + bg.rot_cos * d[..., 1]
    z = d[..., 2]
    if bg.projection == "angular":
        # angmap (texture.h:46-60)
        r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-20))
        theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
        u = 0.5 + 0.5 * (theta / np.pi) * (x / r)
        v = 0.5 + 0.5 * (theta / np.pi) * (-y / r)
    else:
        # spheremap (texture.h:63-85): u from azimuth, v from polar
        u = jnp.mod(jnp.arctan2(y, x) / (2.0 * np.pi), 1.0)
        v = 1.0 - jnp.arccos(jnp.clip(z, -1.0, 1.0)) / np.pi
    uv = jnp.stack([u, v], axis=-1)
    tid = jnp.broadcast_to(bg.tex_id, u.shape)
    rgba = eval_texture(bg.ctex, tid, jnp.stack([x, y, z], -1), uv)
    return rgba[..., :3] * bg.power
