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


def extract_params(scene) -> dict:
    """Pull the differentiable leaves out of a Scene into a flat dict."""
    p: dict[str, Any] = {}
    for col in MATERIAL_PARAM_COLS:
        p["mat." + col] = getattr(scene.materials, col)
    for i, light in enumerate(scene.lights):
        for f in LIGHT_PARAM_FIELDS:
            if hasattr(light, f):
                p[f"light{i}.{f}"] = getattr(light, f)
    return p


def apply_params(scene, params: dict):
    """Write a param dict produced by extract_params back into the scene."""
    mat_kw = {col: params["mat." + col] for col in MATERIAL_PARAM_COLS
              if ("mat." + col) in params}
    mats = scene.materials._replace(**mat_kw)
    lights = []
    for i, light in enumerate(scene.lights):
        kw = {f: params[f"light{i}.{f}"] for f in LIGHT_PARAM_FIELDS
              if f"light{i}.{f}" in params}
        lights.append(dataclasses.replace(light, **kw) if kw else light)
    return dataclasses.replace(scene, materials=mats, lights=tuple(lights))


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
                 types_present=None):
    """Returns loss(params) = mean squared error vs target image [H,W,4]."""
    if types_present is None:
        types_present = scene_material_types(scene)

    def loss_fn(params):
        sc = apply_params(scene, params)
        img = render_flat(sc, opts, spp, types_present)
        diff = img[..., :3] - target[..., :3]
        return jnp.mean(diff * diff)

    return loss_fn


def value_and_grad_fn(scene, opts: RenderOptions, spp: int, target,
                      types_present=None):
    return jax.value_and_grad(make_loss_fn(scene, opts, spp, target,
                                           types_present))
