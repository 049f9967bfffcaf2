"""Shader-node DAG: texture mappers, value/mix/layer nodes.

Reimplements the reference's shader-node system (src/textures/
basicnodes.cc, layernode.cc; base class include/core_api/shader.h:64-105;
graph solver src/yafraycore/nodematerial.cc solveNodesOrder/evalNodes).
The reference evaluates nodes per hit through virtual calls into a
per-thread value stack; here the graph is topo-sorted once at scene
compile and baked into a fused jnp expression over the whole wavefront —
no stack, no virtuals, everything fuses with the BSDF math.

Node types and parameter names match the reference factories:
- texture_mapper (basicnodes.cc:253-310): texco uv/global/orco/
  transformed/window (others fall back to global exactly like the
  reference, basicnodes.cc getCoords), mapping plain/cube/tube/sphere,
  proj_x/y/z axis swizzle, scale/offset, bump_strength.
- value (basicnodes.cc:325-335): constant color/alpha/scalar.
- mix (basicnodes.cc:340-600): modes mix/add/multiply/subtract/screen/
  difference/darken/lighten/overlay, inputs as nodes or constants.
- layer (layernode.cc): blend an input texture over an upper layer with
  colfac/valfac, mix mode, stencil/negative/noRGB flags
  (texture_rgb_blend / texture_value_blend, shader.h:112-210).

A node program's output per lane is (rgba [N,4], scalar [N]).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from core_tpu.textures.base import eval_texture_def


@dataclass(frozen=True)
class NodeDef:
    name: str
    ntype: str                      # texture_mapper | value | mix | layer
    params: tuple                   # sorted (key, value) pairs (hashable)

    def get(self, key, default=None):
        for k, v in self.params:
            if k == key:
                return v
        return default


def parse_node(pm) -> Optional[NodeDef]:
    """ParamMap (one eparams list element) -> NodeDef."""
    name = pm.get_str("name", "")
    ntype = pm.get_str("type", "")
    if not name or not ntype:
        return None

    def freeze(v):
        return tuple(v) if isinstance(v, list) else v

    items = {k: freeze(v) for k, v in pm.items()
             if k not in ("name", "element")}
    return NodeDef(name=name, ntype=ntype,
                   params=tuple(sorted(items.items(),
                                       key=lambda kv: kv[0])))


# int mix mode (shader.h mix_modes) -> combine key; the reference registers
# ONE "mix" node type whose factory dispatches on the int "mode" param
# (basicnodes.cc:585-604)
_MODE_NAMES = {0: "mix", 1: "add", 2: "multiply", 3: "subtract", 4: "screen",
               5: "divide", 6: "difference", 7: "darken", 8: "lighten",
               9: "overlay"}
_MIX_TYPES = {"mix"} | set(_MODE_NAMES.values())


def _deps(nd: NodeDef):
    out = []
    for key in ("input", "upper_layer", "input1", "input2", "factor"):
        v = nd.get(key)
        if isinstance(v, str) and v:
            out.append(v)
    return out


def toposort(nodes: dict) -> list:
    """Dependency order (reference nodematerial.cc solveNodesOrder)."""
    order, seen = [], {}

    def visit(name):
        state = seen.get(name)
        if state == 2:
            return
        if state == 1:
            raise ValueError(f"shader node cycle at '{name}'")
        seen[name] = 1
        nd = nodes.get(name)
        if nd is not None:
            for d in _deps(nd):
                visit(d)
            order.append(nd)
        seen[name] = 2

    for n in nodes:
        visit(n)
    return order


# ---- coordinate mapping (basicnodes.cc getCoords + doMapping) ----

def _tubemap(p):
    d = p[..., 0] ** 2 + p[..., 1] ** 2
    dn = jnp.where(d > 0, 1.0 / jnp.sqrt(jnp.maximum(d, 1e-20)), 0.0)
    u = jnp.where(d > 0,
                  0.5 * (1.0 - jnp.arctan2(p[..., 0] * dn, p[..., 1] * dn)
                         / np.pi), 0.0)
    v = 1.0 - (p[..., 2] + 1.0) * 0.5
    return u, v


def _spheremap(p):
    r_phi = p[..., 0] ** 2 + p[..., 1] ** 2
    r_theta = r_phi + p[..., 2] ** 2
    cosphi = p[..., 0] / jnp.sqrt(jnp.maximum(r_phi, 1e-20))
    phi = jnp.arccos(jnp.clip(cosphi, -1.0, 1.0))
    phi = jnp.where(p[..., 1] < 0, 2 * np.pi - phi, phi) / (2 * np.pi)
    u = jnp.where(r_phi > 0, 1.0 - phi, 0.0)
    v = 1.0 - jnp.arccos(jnp.clip(
        p[..., 2] / jnp.sqrt(jnp.maximum(r_theta, 1e-20)), -1, 1)) / np.pi
    return u, v


def _cubemap(p, n):
    """Project along the dominant normal axis (texture.h cubemap)."""
    an = jnp.abs(n)
    use_x = (an[..., 0] >= an[..., 1]) & (an[..., 0] >= an[..., 2])
    use_y = (~use_x) & (an[..., 1] >= an[..., 2])
    u = jnp.where(use_x, p[..., 1], jnp.where(use_y, p[..., 0], p[..., 0]))
    v = jnp.where(use_x, p[..., 2], jnp.where(use_y, p[..., 2], p[..., 1]))
    return u, v


def _mapper_eval(nd: NodeDef, ctx, ctex):
    texname = nd.get("texture", "")
    tex_idx = ctx["texture_names"].get(texname, -1)
    if tex_idx < 0 or ctex is None:
        n = ctx["p"].shape[0]
        return jnp.ones((n, 4), jnp.float32), jnp.ones((n,), jnp.float32)
    texco = nd.get("texco", "global")
    p = ctx["p"]
    if texco == "uv":
        uvz = jnp.stack([2.0 * ctx["uv"][..., 0] - 1.0,
                         2.0 * ctx["uv"][..., 1] - 1.0,
                         jnp.zeros_like(ctx["uv"][..., 0])], -1)
        tp = uvz
    elif texco == "transformed":
        mtx = np.asarray(nd.get("transform",
                                np.eye(4).ravel().tolist()),
                         np.float32).reshape(4, 4)
        tp = p @ mtx[:3, :3].T + mtx[:3, 3]
    elif texco == "normal":
        tp = ctx["n"]
    elif texco == "reflect":
        n_ = ctx["n"]
        wo = ctx.get("wo")
        if wo is None:
            tp = n_
        else:
            tp = 2.0 * jnp.sum(n_ * wo, -1, keepdims=True) * n_ - wo
    else:  # global / orco / window / stick / stress / tangent fallbacks
        tp = p
    # axis swizzle proj_x/y/z in {0:none,1:x,2:y,3:z}
    proj = [int(nd.get("proj_x", 1)), int(nd.get("proj_y", 2)),
            int(nd.get("proj_z", 3))]
    zeros = jnp.zeros_like(tp[..., 0])
    comps = [zeros, tp[..., 0], tp[..., 1], tp[..., 2]]
    tp = jnp.stack([comps[min(max(a, 0), 3)] for a in proj], -1)
    mapping = nd.get("mapping", "plain")
    if mapping == "tube":
        u, v = _tubemap(tp)
        tp = jnp.stack([u, v, zeros], -1)
    elif mapping == "sphere":
        u, v = _spheremap(tp)
        tp = jnp.stack([u, v, zeros], -1)
    elif mapping == "cube":
        u, v = _cubemap(tp, ctx["n"])
        tp = jnp.stack([u, v, zeros], -1)
    scale = jnp.asarray(nd.get("scale", (1.0, 1.0, 1.0)), jnp.float32)
    offset = jnp.asarray(nd.get("offset", (0.0, 0.0, 0.0)), jnp.float32)
    tp = tp * scale + offset
    # image textures sample ((x+1)/2, (y+1)/2) of the mapped point
    # (imagetex.cc doMapping); procedural textures take the 3D point
    uv = jnp.stack([(tp[..., 0] + 1.0) * 0.5, (tp[..., 1] + 1.0) * 0.5], -1)
    rgba = eval_texture_def(ctex, tex_idx, tp, uv)
    scalar = jnp.mean(rgba[..., :3], axis=-1)
    return rgba, scalar


# ---- mix modes (basicnodes.cc:440-600) ----

def _mix_combine(mode, c1, f1v, c2, f2v, f2):
    f1 = 1.0 - f2
    if mode in ("add",):
        return c1 + f2[..., None] * c2, f1v + f2 * f2v
    if mode in ("multiply", "mult"):
        return c1 * (f1[..., None] + f2[..., None] * c2), \
            f1v * (f1 + f2 * f2v)
    if mode in ("subtract", "sub"):
        return c1 - f2[..., None] * c2, f1v - f2 * f2v
    if mode == "screen":
        col = 1.0 - (f1[..., None] + f2[..., None] * (1.0 - c2)) * (1.0 - c1)
        return col, 1.0 - (f1 + f2 * (1.0 - f2v)) * (1.0 - f1v)
    if mode in ("difference", "diff"):
        return (f1[..., None] * c1 + f2[..., None] * jnp.abs(c1 - c2),
                f1 * f1v + f2 * jnp.abs(f1v - f2v))
    if mode in ("darken", "dark"):
        return (jnp.minimum(f2[..., None] * c2, c1),
                jnp.minimum(f2 * f2v, f1v))
    if mode in ("lighten", "light"):
        return (jnp.maximum(f2[..., None] * c2, c1),
                jnp.maximum(f2 * f2v, f1v))
    if mode == "overlay":
        lo = c1 * (f1[..., None] + 2.0 * f2[..., None] * c2)
        hi = 1.0 - (f1[..., None] + 2.0 * f2[..., None] * (1.0 - c2)) \
            * (1.0 - c1)
        col = jnp.where(c1 < 0.5, lo, hi)
        slo = f1v * (f1 + 2.0 * f2 * f2v)
        shi = 1.0 - (f1 + 2.0 * f2 * (1.0 - f2v)) * (1.0 - f1v)
        return col, jnp.where(f1v < 0.5, slo, shi)
    # mix (lerp)
    return (f1[..., None] * c1 + f2[..., None] * c2,
            f1 * f1v + f2 * f2v)


# ---- layer blend (shader.h texture_rgb_blend/texture_value_blend) ----

def _rgb_blend(mode: int, tex, out, fact, facg):
    f = fact * facg
    fc = f[..., None]
    fg = facg[..., None] if hasattr(facg, "shape") else facg
    if mode == 1:   # ADD
        return fc * tex + out
    if mode == 2:   # MULT
        return ((1.0 - fg) + fc * tex) * out
    if mode == 3:   # SUB
        return -fc * tex + out
    if mode == 4:   # SCREEN
        return 1.0 - ((1.0 - fg) + fc * (1.0 - tex)) * (1.0 - out)
    if mode == 5:   # DIV
        return (1.0 - fc) * out + fc * out * (1.0 - tex)
    if mode == 6:   # DIFF
        return (1.0 - fc) * out + fc * jnp.abs(tex - out)
    if mode == 7:   # DARK
        return jnp.minimum(fc * tex, out)
    if mode == 8:   # LIGHT
        return jnp.maximum(fc * tex, out)
    return fc * tex + (1.0 - fc) * out      # MIX


def _value_blend(mode: int, tex, out, fact, facg, flip):
    f = fact * facg
    fm = 1.0 - f
    if flip:
        f, fm = fm, f
    if mode == 1:
        return f * tex + out
    if mode == 2:
        return ((1.0 - facg) + f * tex) * out
    if mode == 3:
        return -f * tex + out
    if mode == 4:
        return 1.0 - ((1.0 - facg) + f * (1.0 - tex)) * (1.0 - out)
    if mode == 5:
        return jnp.where(tex == 0.0, 0.0, fm * out + f * out
                         / jnp.where(tex == 0.0, 1.0, tex))
    if mode == 6:
        return fm * out + f * jnp.abs(tex - out)
    if mode == 7:
        return jnp.minimum(f * tex, out)
    if mode == 8:
        return jnp.maximum(f * tex, out)
    return f * tex + fm * out


_MIX_NAME_TO_MODE = {"mix": 0, "add": 1, "multiply": 2, "mult": 2,
                     "subtract": 3, "sub": 3, "screen": 4, "divide": 5,
                     "div": 5, "difference": 6, "diff": 6, "darken": 7,
                     "dark": 7, "lighten": 8, "light": 8}


def _layer_eval(nd: NodeDef, ctx, results):
    n = ctx["p"].shape[0]
    ones = jnp.ones((n,), jnp.float32)
    up = nd.get("upper_layer", "")
    if up and up in results:
        rcol, rval = results[up]
    else:
        uc = jnp.asarray(nd.get("upper_color", (0, 0, 0)), jnp.float32)[:3]
        rcol = jnp.broadcast_to(
            jnp.concatenate([uc, jnp.ones(1, jnp.float32)]), (n, 4))
        rval = ones * float(nd.get("upper_value", 0.0))
    stencil_tin = rcol[..., 3]
    inp = nd.get("input", "")
    icol, ival = results.get(inp, (jnp.ones((n, 4), jnp.float32), ones))
    color_input = bool(nd.get("color_input", True))
    no_rgb = bool(nd.get("noRGB", False))
    use_alpha = bool(nd.get("use_alpha", False))
    negative = bool(nd.get("negative", False))
    stencil = bool(nd.get("stencil", False))
    mode = int(nd.get("mode", 0))
    colfac = float(nd.get("colfac", 1.0))
    valfac = float(nd.get("valfac", 1.0))
    def_col = jnp.asarray(nd.get("def_col", (1, 1, 1)), jnp.float32)[:3]
    def_val = float(nd.get("def_val", 1.0))
    do_color = bool(nd.get("do_color", True))
    do_scalar = bool(nd.get("do_scalar", False))

    tex_rgb = color_input
    if color_input:
        texcolor = icol
        ta = icol[..., 3] if use_alpha else ones
        tin = jnp.zeros_like(ones)
    else:
        texcolor = icol
        ta = ones
        tin = ival
    if no_rgb and color_input:
        tex_rgb = False
        tin = jnp.mean(texcolor[..., :3], axis=-1)
    if negative:
        tin = 1.0 - tin
        texcolor = jnp.concatenate([1.0 - texcolor[..., :3],
                                    texcolor[..., 3:]], -1)
    if stencil:
        if tex_rgb:
            fact = ta
            ta = ta * stencil_tin
            stencil_tin = stencil_tin * fact
        else:
            fact = tin
            tin = tin * stencil_tin
            stencil_tin = stencil_tin * fact
    out_col = rcol
    out_val = rval
    if do_color:
        tin_c = ta if tex_rgb else tin
        blended = _rgb_blend(mode, texcolor[..., :3], rcol[..., :3],
                             tin_c, stencil_tin * colfac)
        out_col = jnp.concatenate([blended, stencil_tin[..., None]], -1)
    if do_scalar:
        tin_s = jnp.mean(texcolor[..., :3], -1) if tex_rgb else tin
        out_val = _value_blend(mode, ones * def_val, rval, tin_s,
                               stencil_tin * valfac, not do_scalar)
    return out_col, out_val


def eval_graph(node_defs: list, out_name: str, ctx, ctex):
    """Evaluate the node whose name is out_name over the wavefront.

    ctx: dict with p [N,3], uv [N,2], n [N,3], optional wo [N,3],
    texture_names (name->index).  Returns (rgba [N,4], scalar [N])."""
    nodes = {nd.name: nd for nd in node_defs if nd is not None}
    if out_name not in nodes:
        n = ctx["p"].shape[0]
        return jnp.ones((n, 4), jnp.float32), jnp.ones((n,), jnp.float32)
    results = {}
    n = ctx["p"].shape[0]
    ones = jnp.ones((n,), jnp.float32)
    for nd in toposort(nodes):
        if nd.ntype == "texture_mapper":
            results[nd.name] = _mapper_eval(nd, ctx, ctex)
        elif nd.ntype == "value":
            col = jnp.asarray(nd.get("color", (1, 1, 1)), jnp.float32)[:3]
            alpha = float(nd.get("alpha", 1.0))
            sval = float(nd.get("scalar", 1.0))
            rgba = jnp.broadcast_to(
                jnp.concatenate([col, jnp.asarray([alpha], jnp.float32)]),
                (n, 4))
            results[nd.name] = (rgba, ones * sval)
        elif nd.ntype == "layer":
            results[nd.name] = _layer_eval(nd, ctx, results)
        elif nd.ntype in _MIX_TYPES:
            def inval(key_node, key_col, key_val, default_col=(0, 0, 0)):
                ref = nd.get(key_node, "")
                if ref and ref in results:
                    return results[ref]
                c = jnp.asarray(nd.get(key_col, default_col),
                                jnp.float32)[:3]
                rgba = jnp.broadcast_to(
                    jnp.concatenate([c, jnp.ones(1, jnp.float32)]), (n, 4))
                return rgba, ones * float(nd.get(key_val, 0.0))

            c1, f1v = inval("input1", "color1", "value1")
            c2, f2v = inval("input2", "color2", "value2")
            fref = nd.get("factor", "")
            if fref and fref in results:
                f2 = results[fref][1]
            else:
                f2 = ones * float(nd.get("value", nd.get("cfactor", 0.5)))
            mode = _MODE_NAMES.get(int(nd.get("mode", 0)), nd.ntype) \
                if nd.ntype == "mix" else nd.ntype
            col, sval = _mix_combine(mode, c1[..., :3], f1v,
                                     c2[..., :3], f2v, f2)
            rgba = jnp.concatenate(
                [col, jnp.ones((n, 1), jnp.float32)], -1)
            results[nd.name] = (rgba, sval)
        else:
            results[nd.name] = (jnp.ones((n, 4), jnp.float32), ones)
    return results[out_name]
