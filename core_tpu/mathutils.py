"""Vector/color math helpers over jnp arrays with a trailing xyz axis.

TPU-native stand-in for the reference's L0 math types
(reference: include/core_api/vector3d.h, color.h, matrix4.h, bound.h).
Everything operates on arrays of shape [..., 3] so the whole wavefront of
rays is processed by the VPU at once; no scalar structs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference's compile-time constants (CMakeLists.txt:44-50).
MIN_RAYDIST = 5.0e-5
SHADOW_BIAS = 5.0e-4


def dot(a, b):
    """Batched 3-vector dot product -> [...]."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Batched dot with keepdims for broadcasting against [..., 3]."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def length_sqr(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps: float = 1e-20):
    """Safe normalize; zero vectors stay (near) zero instead of NaN."""
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    return a * jnp.where(n2 > eps, jax.lax.rsqrt(jnp.maximum(n2, eps)), 0.0)


def normalize_len(a, eps: float = 1e-20):
    """Returns (unit vector, length)."""
    n = length(a)
    inv = jnp.where(n > eps, 1.0 / n, 0.0)
    return a * inv[..., None], n


def reflect_dir(n, w):
    """Mirror reflection of direction w about normal n (both unit, w points
    away from surface, i.e. the reference's reflect_plane convention:
    result = 2*(n.w)*n - w  (reference vector3d.h reflect)."""
    return 2.0 * vdot(n, w) * n - w


def refract_dir(n, wi, ior):
    """Refraction of incident direction wi (pointing away from the surface,
    toward the viewer) through a surface with normal n and relative IOR.

    Returns (valid_mask[...], refracted_dir[..., 3]).  Mirrors the reference's
    `refract` (vector3d.h) semantics: ior is the ratio applied when entering.
    """
    cos_i = dot(n, wi)
    entering = cos_i > 0.0
    eta = jnp.where(entering, 1.0 / ior, ior)
    n_eff = jnp.where(entering[..., None], n, -n)
    c = jnp.abs(cos_i)
    k = 1.0 - eta * eta * (1.0 - c * c)
    valid = k > 0.0
    k_safe = jnp.where(valid, k, 0.0)
    t = -eta[..., None] * wi + (eta * c - jnp.sqrt(k_safe))[..., None] * n_eff
    return valid, normalize(t)


def fresnel_dielectric(cos_i, ior):
    """Unpolarized Fresnel reflectance for a dielectric; cos_i = |cos(theta_i)|.

    Uses the same g/c formulation as the reference's `fresnel`
    (include/core_api/vector3d.h) used by shinydiffuse's getFresnel
    (src/materials/shinydiffuse.cc:105-135)."""
    c = jnp.abs(cos_i)
    g2 = ior * ior + c * c - 1.0
    tir = g2 <= 0.0
    g = jnp.sqrt(jnp.maximum(g2, 0.0))
    aux = c * (g + c)
    num = (g - c) / jnp.maximum(g + c, 1e-12)
    frac = (aux - 1.0) / jnp.maximum(aux + 1.0, 1e-12)
    kr = 0.5 * num * num * (1.0 + frac * frac)
    return jnp.where(tir, 1.0, jnp.clip(kr, 0.0, 1.0))


def create_cs(n):
    """Build an orthonormal frame (u, v) around unit normal n.

    Same construction as the reference's createCS (vector3d.h): branch on
    whether n is (0,0,+-1), vectorized with where."""
    nz_dominant = (jnp.abs(n[..., 0]) < 1e-6) & (jnp.abs(n[..., 1]) < 1e-6)
    # generic branch
    d = jnp.sqrt(jnp.maximum(n[..., 1] * n[..., 1] + n[..., 0] * n[..., 0], 1e-20))
    inv_d = 1.0 / d
    u_gen = jnp.stack([n[..., 1] * inv_d, -n[..., 0] * inv_d, jnp.zeros_like(d)], axis=-1)
    # degenerate branch: n ~ +-z
    sign = jnp.where(n[..., 2] < 0.0, -1.0, 1.0)
    u_deg = jnp.stack([sign, jnp.zeros_like(sign), jnp.zeros_like(sign)], axis=-1)
    u = jnp.where(nz_dominant[..., None], u_deg, u_gen)
    v = cross(n, u)
    return u, v


def luminance(c):
    """Color energy as used by the reference color_t::energy ((r+g+b)/3)."""
    return jnp.mean(c[..., :3], axis=-1)


def col_luma(c):
    """CIE-ish luma used by the film's adaptive AA (color.h abscol2bri)."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def transform_point(m, p):
    """Apply a 4x4 matrix [..., 4, 4] to points [..., 3]."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    return jnp.einsum("...ij,...j->...i", m, ph)[..., :3]


def transform_dir(m, d):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], d)
