"""Differentiable rendering: scene-parameter pytrees, render loss, grads.

The reference renderer is forward-only; differentiability is this
framework's north-star addition (BASELINE.json config #4: recover albedo +
light intensity from target renders, gradients checked against finite
differences).

Design: a `Scene` is already a pytree, but it mixes integer topology with
float parameters.  `extract_params` pulls out the differentiable leaves
(material color columns, light emission) as a flat dict; `apply_params`
writes them back.  `jax.grad` is taken w.r.t. the param dict only, so
integer arrays never enter AD.

Gradient estimator: detached-sampling path replay — sample directions are
computed from the same QMC sequences forward and backward (they carry no
parameter dependence for the interior term), so d(pixel)/d(albedo) and
d(pixel)/d(light power) are exact expectations.  Visibility (edge) gradients
are out of scope for these parameters and documented as such.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from core_tpu import film as film_mod
from core_tpu.render import RenderOptions, render_chunk, scene_material_types


# Differentiable material columns (the rest are topology/flags/bools).
MATERIAL_PARAM_COLS = (
    "diffuse_color", "mirror_color", "strengths", "emit_strength",
    "transmit_filter", "glossy_color", "glossy_reflect", "filter_color",
)
# Differentiable per-light fields by attribute name (missing ones skipped).
LIGHT_PARAM_FIELDS = ("color",)
# Light GEOMETRY parameters (north-star round-5: reparameterized light
# sampling — area-light samples are corner + s1*to_x + s2*to_y, point /
# sphere / spot samples are light-local offsets from pos/center, so
# d(sample)/d(these leaves) flows through the interior term; visibility
# (edge) gradients stay out of scope, tests/test_diff_geometry.py).
LIGHT_GEOM_FIELDS = {
    "AreaLight": ("corner", "to_x", "to_y"),
    "PointLight": ("pos",),
    "SphereLight": ("center",),
    "SpotLight": ("pos",),
    "MeshLight": (),
    "BgPortalLight": (),
}


def extract_params(scene, geometry: bool = True) -> dict:
    """Pull the differentiable leaves out of a Scene into a flat dict.

    geometry=True adds light-geometry leaves (LIGHT_GEOM_FIELDS) and a
    per-object translation 'geom.obj_offset' [n_objects, 3] (applied to
    vertices in apply_params; zeros by default, so extract/apply
    round-trips exactly)."""
    p: dict[str, Any] = {}
    for col in MATERIAL_PARAM_COLS:
        p["mat." + col] = getattr(scene.materials, col)
    for i, light in enumerate(scene.lights):
        fields = LIGHT_PARAM_FIELDS
        if geometry:
            fields = fields + LIGHT_GEOM_FIELDS.get(
                type(light).__name__, ())
        for f in fields:
            if hasattr(light, f):
                p[f"light{i}.{f}"] = getattr(light, f)
    if geometry:
        import numpy as np
        n_obj = int(np.asarray(scene.geom.tri_obj).max()) + 1
        p["geom.obj_offset"] = jnp.zeros((max(n_obj, 1), 3), jnp.float32)
    return p


def _vertex_object_map(scene):
    """[V] i32 object id per vertex (host-side, static topology)."""
    import numpy as np
    tri_vidx = np.asarray(scene.geom.tri_vidx)
    tri_obj = np.asarray(scene.geom.tri_obj)
    vert_obj = np.zeros(scene.geom.verts.shape[0], np.int32)
    vert_obj[tri_vidx.reshape(-1)] = np.repeat(tri_obj, 3)
    return jnp.asarray(vert_obj)


def apply_params(scene, params: dict):
    """Write a param dict produced by extract_params back into the scene.

    Light-geometry leaves recompute their derived fields differentiably
    (AreaLight fnormal/area from to_x/to_y); 'geom.obj_offset' translates
    each object's vertices — shading (surface_points_s straight-through
    hit recompute, light sampling) sees the moved geometry, while
    intersection kernels keep the baked accel (visibility is
    non-differentiable by contract; at nonzero offsets the caller must
    rebuild the accel for a consistent forward render)."""
    mat_kw = {col: params["mat." + col] for col in MATERIAL_PARAM_COLS
              if ("mat." + col) in params}
    mats = scene.materials._replace(**mat_kw)
    lights = []
    for i, light in enumerate(scene.lights):
        fields = LIGHT_PARAM_FIELDS + LIGHT_GEOM_FIELDS.get(
            type(light).__name__, ())
        kw = {f: params[f"light{i}.{f}"] for f in fields
              if f"light{i}.{f}" in params}
        if kw:
            light = dataclasses.replace(light, **kw)
            if type(light).__name__ == "AreaLight" \
                    and ("to_x" in kw or "to_y" in kw or "corner" in kw):
                fn_raw = jnp.cross(light.to_y, light.to_x)
                area = jnp.linalg.norm(fn_raw)
                fnormal = fn_raw / jnp.maximum(area, 1e-20)
                light = dataclasses.replace(light, fnormal=fnormal,
                                            area=area)
        lights.append(light)
    scene = dataclasses.replace(scene, materials=mats,
                                lights=tuple(lights))
    off = params.get("geom.obj_offset")
    if off is not None:
        verts = scene.geom.verts + off[_vertex_object_map(scene)]
        scene = dataclasses.replace(
            scene, geom=scene.geom._replace(verts=verts))
    return scene


def render_flat(scene, opts: RenderOptions, spp: int, types_present=None):
    """Single-pass differentiable render -> [H, W, 4] normalized image.

    No adaptive AA, no host loop: one traced chunk, suitable for jit/grad.
    """
    if types_present is None:
        types_present = scene_material_types(scene)
    cam = scene.camera
    film = film_mod.make_film(cam.resy, cam.resx)
    film = render_chunk(scene, types_present, opts, film, 0, spp, 0, None)
    return film_mod.normalized(film)


def make_loss_fn(scene, opts: RenderOptions, spp: int, target,
                 types_present=None, region=None):
    """Returns loss(params) = mean squared error vs target image [H,W,4].

    region: optional (y0, y1, x0, x1) window — the loss sees only that
    slice (used by the geometry-gradient tests to stay clear of
    silhouette/shadow edges, whose visibility term AD does not carry)."""
    if types_present is None:
        types_present = scene_material_types(scene)

    def loss_fn(params):
        sc = apply_params(scene, params)
        img = render_flat(sc, opts, spp, types_present)
        diff = img[..., :3] - target[..., :3]
        if region is not None:
            y0, y1, x0, x1 = region
            diff = diff[y0:y1, x0:x1]
        return jnp.mean(diff * diff)

    return loss_fn


def value_and_grad_fn(scene, opts: RenderOptions, spp: int, target,
                      types_present=None):
    return jax.value_and_grad(make_loss_fn(scene, opts, spp, target,
                                           types_present))
