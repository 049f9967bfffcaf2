"""Backgrounds (environment emitters).

Reference: src/backgrounds/ — constant (textureback.cc:213-246), gradient
(gradientback.cc), sunsky/darksky analytic daylight, texture-mapped env.
Round-1 provides constant + gradient; the analytic sky and texture env land
with the textures subsystem.
"""
from __future__ import annotations

from dataclasses import dataclass, field

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
    if isinstance(bg, GradientBackground):
        # reference gradientback.cc: blend on z
        z = d[..., 2]
        up = jnp.clip(z, 0.0, 1.0)[..., None]
        dn = jnp.clip(-z, 0.0, 1.0)[..., None]
        sky = bg.zenith[None] * up + bg.horizon[None] * (1.0 - up)
        gnd = bg.zenith_ground[None] * dn + bg.horizon_ground[None] * (1.0 - dn)
        return jnp.where((z >= 0.0)[..., None], sky, gnd)
    raise TypeError(f"unknown background {type(bg)}")
