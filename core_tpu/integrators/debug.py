"""Debug integrator: visualize shading-geometry quantities.

Reference: src/integrators/DebugIntegrator.cc:34-131 — renders N, dPdU,
dPdV, NU, NV (or dSdU/dSdV) as colors for visual inspection.  Here dPdU/dPdV
are the shading-frame tangents (the flat-SoA mesh keeps no explicit
parametric derivatives; NU/NV are the orthonormal frame, same as the
reference for unmapped meshes).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu import scene as scene_mod


@dataclass(frozen=True)
class DebugOptions:
    debug_type: str = "N"      # N | dPdU | dPdV | NU | NV
    show_pn: bool = False      # pShowPN: raw color, not remapped


def integrate(scene, types_present, rays: Rays, pixel_sample, sampling_offs,
              opts: DebugOptions):
    hits = scene_mod.closest_hit(scene, rays)
    sp = scene_mod.surface_points(scene, rays, hits)
    vec = {"N": sp.n, "dPdU": sp.nu, "dPdV": sp.nv,
           "NU": sp.nu, "NV": sp.nv}[opts.debug_type]
    col = vec if opts.show_pn else 0.5 * vec + 0.5
    col = jnp.where(hits.valid[..., None], col, 0.0)
    alpha = hits.valid.astype(jnp.float32)
    return jnp.concatenate([col, alpha[..., None]], axis=-1)
