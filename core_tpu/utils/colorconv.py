"""CIE XYZ -> RGB color conversion with selectable working color spaces.

Parity with the reference's ColorConv utility
(include/utilities/ColorConv.h:23-168): four target spaces (CIE RGB with
E or D50 white, sRGB with D65 or D50 white), xyY -> XYZ with an optional
exponential exposure curve on Y, a simple 1/2.2 gamma encode, and RGB
clamping.  The matrices are the standard published XYZ->RGB matrices for
those primaries/whitepoints (Lindbloom).

Everything here is pure elementwise math, so it works identically on
numpy arrays (scene-build time, e.g. the darksky sun color) and on traced
jnp arrays (per-ray sky evaluation).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# XYZ -> RGB matrices, rows = (R, G, B) output channels.
XYZ_TO_RGB = {
    # CIE RGB primaries, equal-energy (E) white
    "CIE (E)": np.array([[2.3706743, -0.9000405, -0.4706338],
                         [-0.5138850, 1.4253036, 0.0885814],
                         [0.0052982, -0.0146949, 1.0093968]], np.float32),
    # CIE RGB primaries adapted to D50
    "CIE (D50)": np.array([[2.3638081, -0.8676030, -0.4988161],
                           [-0.5005940, 1.3962369, 0.1047562],
                           [0.0141712, -0.0306400, 1.2323842]], np.float32),
    # sRGB primaries, native D65 white
    "sRGB (D65)": np.array([[3.2404542, -1.5371385, -0.4985314],
                            [-0.9692660, 1.8760108, 0.0415560],
                            [0.0556434, -0.2040259, 1.0572252]], np.float32),
    # sRGB primaries adapted to D50
    "sRGB (D50)": np.array([[3.1338561, -1.6168667, -0.4906146],
                            [-0.9787684, 1.9161415, 0.0334540],
                            [0.0719453, -0.2289914, 1.4052427]], np.float32),
}


def xyz_to_rgb(xyz, matrix, clamp=False, gamma_encode=False):
    """[..., 3] XYZ -> [..., 3] RGB.  matrix is one of XYZ_TO_RGB's values
    (or any 3x3).  Optional simple 1/2.2 gamma encode + [0,1] clamp, matching
    ColorConv::fromXYZ (ColorConv.h:101-125)."""
    xp = jnp if isinstance(xyz, jnp.ndarray) else np
    m = xp.asarray(matrix, xyz.dtype if hasattr(xyz, "dtype") else None)
    rgb = xyz @ m.T
    if gamma_encode:
        rgb = xp.power(xp.maximum(rgb, 0.0), np.float32(1.0 / 2.2))
    if clamp:
        rgb = xp.clip(rgb, 0.0, 1.0)
    return rgb


def xyy_to_xyz(x, y, Y, exposure=0.0):
    """Chromaticity (x, y) + luminance Y -> XYZ.  exposure > 0 applies the
    reference's exponential response Y' = exp(Y*exposure) - 1
    (ColorConv.h:fromxyY2XYZ, ColorConv.h:137-158); y == 0 maps to black."""
    xp = jnp if isinstance(Y, jnp.ndarray) else np
    if exposure > 0.0:
        Y = xp.exp(Y * exposure) - 1.0
    y_ok = xp.abs(y) > 1e-12
    ratio = Y / xp.where(y_ok, y, 1.0)
    X = x * ratio
    Z = (1.0 - x - y) * ratio
    xyz = xp.stack([X, Y, Z], axis=-1)
    return xp.where(y_ok[..., None], xyz, xp.zeros_like(xyz))
