"""Direction sampling and 1-D CDF tables, batched over wavefronts.

Mirrors reference include/utilities/sample_utils.h (SampleCosHemisphere,
SampleSphere, sampleCone, ShirleyDisk, pdf1D_t) with jnp array semantics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from core_tpu.mathutils import cross

M_2PI = 2.0 * np.pi


def sample_cos_hemisphere(n, ru, rv, s1, s2):
    """Cosine-weighted hemisphere around unit n with frame (ru, rv).

    dir = (ru cos(2pi s2) + rv sin(2pi s2)) sqrt(1-s1) + n sqrt(s1);
    pdf = sqrt(s1)/pi.  (reference sample_utils.h:41-52)
    """
    # 1e-12 floors keep sqrt gradients finite at the s1 in {0,1} corners
    # (s1 may depend on scene parameters through CDF remapping).
    z1 = jnp.clip(s1, 0.0, 1.0)
    a = M_2PI * s2
    r = jnp.sqrt(jnp.maximum(1.0 - z1, 1e-12))[..., None]
    d = (ru * jnp.cos(a)[..., None] + rv * jnp.sin(a)[..., None]) * r \
        + n * jnp.sqrt(jnp.maximum(z1, 1e-12))[..., None]
    return d


def cos_hemisphere_pdf(cos_theta):
    return jnp.maximum(cos_theta, 0.0) / np.pi


def sample_sphere(s1, s2):
    """Uniform sphere (reference sample_utils.h:56-76)."""
    z = 1.0 - 2.0 * s1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    a = M_2PI * s2
    return jnp.stack([jnp.cos(a) * r, jnp.sin(a) * r, z], axis=-1)


def sample_cone(d, u, v, max_cos_ang, s1, s2):
    """Uniform cone around unit d with frame (u, v) (sample_utils.h:80-86)."""
    cos_ang = 1.0 - (1.0 - max_cos_ang) * s2
    sin_ang = jnp.sqrt(jnp.maximum(1.0 - cos_ang * cos_ang, 1e-12))
    t1 = M_2PI * s1
    return (u * jnp.cos(t1)[..., None] + v * jnp.sin(t1)[..., None]) \
        * sin_ang[..., None] + d * cos_ang[..., None]


def shirley_disk(r1, r2):
    """Concentric disk mapping (reference ShirleyDisk, sample_utils.h via
    camera bokeh); returns (u, v) in the unit disk."""
    a = 2.0 * r1 - 1.0
    b = 2.0 * r2 - 1.0
    use_a = jnp.abs(a) > jnp.abs(b)
    r = jnp.where(use_a, a, b)
    safe_a = jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
    safe_b = jnp.where(jnp.abs(b) > 1e-12, b, 1e-12)
    phi = jnp.where(use_a, (np.pi / 4.0) * (b / safe_a),
                    (np.pi / 2.0) - (np.pi / 4.0) * (a / safe_b))
    both_zero = (jnp.abs(a) < 1e-12) & (jnp.abs(b) < 1e-12)
    r = jnp.where(both_zero, 0.0, r)
    phi = jnp.where(both_zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def min_rot(d, u, d2):
    """Minimum rotation mapping frame (d,u) onto new direction d2
    (reference minRot, sample_utils.h:158-167).  Returns (u2, v2)."""
    cos_alpha = jnp.sum(d * d2, axis=-1, keepdims=True)
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - cos_alpha * cos_alpha, 1e-12))
    v = cross(d, d2)
    u2 = cos_alpha * u + (1.0 - cos_alpha) * jnp.sum(v * u, axis=-1, keepdims=True) \
        + sin_alpha * cross(v, u)
    v2 = cross(d2, u2)
    return u2, v2


class Cdf1D(NamedTuple):
    """1-D pdf/cdf table (reference pdf1D_t, sample_utils.h:93-155).

    func: [n] unnormalized density; cdf: [n+1] normalized cumulative;
    integral: scalar sum(func)/n.
    """
    func: jnp.ndarray
    cdf: jnp.ndarray
    integral: jnp.ndarray

    @property
    def count(self):
        return self.func.shape[-1]


def make_cdf1d(func) -> Cdf1D:
    func = jnp.asarray(func, jnp.float32)
    n = func.shape[-1]
    delta = 1.0 / n
    cum = jnp.cumsum(func * delta, axis=-1)
    integral = cum[..., -1]
    cdf = jnp.concatenate(
        [jnp.zeros_like(cum[..., :1]), cum / jnp.maximum(integral[..., None], 1e-30)],
        axis=-1)
    return Cdf1D(func=func, cdf=cdf, integral=integral)


def cdf1d_sample(c: Cdf1D, u):
    """Continuous sample: returns (x in [0, n), pdf) — pdf relative to a
    uniform density of 1 over [0,1] after dividing x by n."""
    idx = jnp.clip(jnp.searchsorted(c.cdf, u, side="left") - 1, 0, c.count - 1)
    c_lo = c.cdf[idx]
    c_hi = c.cdf[idx + 1]
    delta = (u - c_lo) / jnp.maximum(c_hi - c_lo, 1e-30)
    pdf = c.func[idx] / jnp.maximum(c.integral, 1e-30)
    return idx.astype(jnp.float32) + delta, pdf


def cdf1d_dsample(c: Cdf1D, u):
    """Discrete sample: returns (index, pdf_of_index*count... ) matching the
    reference DSample: pdf = func[i]/integral (density, not probability)."""
    idx = jnp.clip(jnp.searchsorted(c.cdf, u, side="left") - 1, 0, c.count - 1)
    idx = jnp.where(u <= 0.0, 0, idx)
    pdf = c.func[idx] / jnp.maximum(c.integral, 1e-30)
    return idx, pdf
