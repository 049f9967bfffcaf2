"""Debug integrator: visualize shading-geometry quantities.

Reference: src/integrators/DebugIntegrator.cc:34-131 — renders N, dPdU,
dPdV, NU, NV (or dSdU/dSdV) as colors for visual inspection.  dPdU/dPdV
are the REAL parametric derivatives from triangle UVs
(differentials.surface_dpduv, reference triangle_t::getSurface); meshes
without UVs fall back to the shading frame like the reference does for
unmapped geometry.  dSdU/dSdV (smoothed-normal derivatives) render the
per-corner normal deltas along the parametric directions.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu import scene as scene_mod
from core_tpu.mathutils import normalize


@dataclass(frozen=True)
class DebugOptions:
    debug_type: str = "N"      # N | dPdU | dPdV | NU | NV | dSdU | dSdV
    show_pn: bool = False      # pShowPN: raw color, not remapped


def _dsduv(scene, sp):
    """Smoothed-normal derivatives along the parametric directions
    (DebugIntegrator dSdU/dSdV): corner-normal deltas in barycentric
    space mapped through the triangle's UV parametrization."""
    g = scene.geom
    prim = jnp.clip(sp.prim, 0, g.n_tris - 1)
    cn = g.corner_n[prim]                 # [N,3,3]
    uvs = g.uvs[prim]                     # [N,3,2]
    dn1 = cn[:, 1] - cn[:, 0]
    dn2 = cn[:, 2] - cn[:, 0]
    duv1 = uvs[:, 1] - uvs[:, 0]
    duv2 = uvs[:, 2] - uvs[:, 0]
    det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    ok = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok, det, 1.0)
    dsdu = (duv2[..., 1:2] * dn1 - duv1[..., 1:2] * dn2) * inv[..., None]
    dsdv = (-duv2[..., 0:1] * dn1 + duv1[..., 0:1] * dn2) * inv[..., None]
    zero = jnp.zeros_like(dsdu)
    return jnp.where(ok[..., None], dsdu, zero), \
        jnp.where(ok[..., None], dsdv, zero)


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: DebugOptions):
    from core_tpu.differentials import surface_dpduv
    hits = scene_mod.closest_hit(scene, rays)
    sp = scene_mod.surface_points(scene, rays, hits)
    if opts.debug_type in ("dPdU", "dPdV"):
        dpdu, dpdv, _ = surface_dpduv(scene, sp)
        vec = normalize(dpdu if opts.debug_type == "dPdU" else dpdv)
    elif opts.debug_type in ("dSdU", "dSdV"):
        dsdu, dsdv = _dsduv(scene, sp)
        vec = dsdu if opts.debug_type == "dSdU" else dsdv
    else:
        vec = {"N": sp.n, "NU": sp.nu, "NV": sp.nv}[opts.debug_type]
    col = vec if opts.show_pn else 0.5 * vec + 0.5
    col = jnp.where(hits.valid[..., None], col, 0.0)
    alpha = hits.valid.astype(jnp.float32)
    return jnp.concatenate([col, alpha[..., None]], axis=-1)
