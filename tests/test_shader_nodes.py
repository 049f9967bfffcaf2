"""Shader-node DAG (textures/nodes.py): texture mappers, value/mix/layer
nodes, material slot substitution (reference src/textures/basicnodes.cc,
layernode.cc, src/yafraycore/nodematerial.cc)."""
import numpy as np
import jax.numpy as jnp
import pytest

from core_tpu.params import ParamMap
from core_tpu.textures.nodes import (parse_node, toposort, eval_graph,
                                     NodeDef)


def _pm(**kw):
    return ParamMap(kw)


def _ctx(n=4, texture_names=None):
    rng = np.random.default_rng(0)
    return {
        "p": jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        "uv": jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32),
        "n": jnp.asarray(np.tile([0.0, 0, 1], (n, 1)), jnp.float32),
        "texture_names": texture_names or {},
    }


def test_parse_and_toposort():
    nds = [parse_node(_pm(name="a", type="value", color=(1, 0, 0))),
           parse_node(_pm(name="m", type="mix", input1="a",
                          color2=(0, 0, 1), value=0.5))]
    nodes = {nd.name: nd for nd in nds}
    order = toposort(nodes)
    assert [nd.name for nd in order] == ["a", "m"]


def test_cycle_detection():
    nds = [parse_node(_pm(name="a", type="mix", input1="b")),
           parse_node(_pm(name="b", type="mix", input1="a"))]
    with pytest.raises(ValueError):
        toposort({nd.name: nd for nd in nds})


def test_value_node():
    nds = [parse_node(_pm(name="v", type="value", color=(0.2, 0.4, 0.6),
                          alpha=0.5, scalar=0.7))]
    rgba, s = eval_graph(nds, "v", _ctx(), None)
    np.testing.assert_allclose(np.asarray(rgba[0]), [0.2, 0.4, 0.6, 0.5],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), 0.7)


def test_mix_modes_match_reference_formulas():
    # two value nodes mixed: verify MN_MIX / MN_ADD / MN_MULT / MN_SCREEN
    c1, c2, f = np.array([0.2, 0.5, 0.8]), np.array([0.6, 0.1, 0.4]), 0.25
    cases = {
        0: f * c2 + (1 - f) * c1,                         # mix (lerp)
        1: c1 + f * c2,                                   # add
        2: c1 * ((1 - f) + f * c2),                       # mult
        4: 1 - ((1 - f) + f * (1 - c2)) * (1 - c1),       # screen
        6: (1 - f) * c1 + f * np.abs(c1 - c2),            # difference
        7: np.minimum(f * c2, c1),                        # darken
        8: np.maximum(f * c2, c1),                        # lighten
    }
    for mode, want in cases.items():
        nds = [parse_node(_pm(name="m", type="mix", mode=mode,
                              color1=tuple(c1), color2=tuple(c2),
                              value=f))]
        rgba, _ = eval_graph(nds, "m", _ctx(), None)
        np.testing.assert_allclose(np.asarray(rgba[0, :3]), want, atol=1e-6,
                                   err_msg=f"mode {mode}")


def test_mapper_uv_coords_and_scale():
    from core_tpu.environment import SceneBuilder
    b = SceneBuilder()
    b.create("texture", "blendtex", _pm(type="blend", blend_type="lin"))
    from core_tpu.textures.base import build_texture_set
    ctex = build_texture_set(b.textures)
    nds = [parse_node(_pm(name="map", type="texture_mapper",
                          texture="blendtex", texco="uv",
                          scale=(1.0, 1.0, 1.0)))]
    ctx = _ctx(texture_names=b.texture_names)
    rgba, s = eval_graph(nds, "map", ctx, ctex)
    # blend 'lin' = (x+1)/2 of the mapped point; uv texco maps u -> 2u-1,
    # so intensity == u
    np.testing.assert_allclose(np.asarray(s), np.asarray(ctx["uv"][:, 0]),
                               atol=1e-5)


def test_mapper_sphere_projection_runs():
    from core_tpu.environment import SceneBuilder
    b = SceneBuilder()
    b.create("texture", "t", _pm(type="clouds", size=2.0))
    from core_tpu.textures.base import build_texture_set
    ctex = build_texture_set(b.textures)
    for mapping in ("plain", "cube", "tube", "sphere"):
        nds = [parse_node(_pm(name="map", type="texture_mapper",
                              texture="t", texco="global",
                              mapping=mapping))]
        rgba, s = eval_graph(nds, "map", _ctx(texture_names=b.texture_names),
                             ctex)
        assert np.isfinite(np.asarray(rgba)).all()


def test_layer_node_mix_over_upper():
    # layer with MIX mode, full colfac: output = input color where Tin=1
    nds = [parse_node(_pm(name="base", type="value", color=(1.0, 0.0, 0.0),
                          alpha=1.0, scalar=1.0)),
           parse_node(_pm(name="lay", type="layer", input="base",
                          upper_color=(0.0, 0.0, 1.0), mode=0,
                          colfac=1.0, do_color=True, color_input=True,
                          noRGB=True))]
    rgba, _ = eval_graph(nds, "lay", _ctx(), None)
    # noRGB: Tin = mean(rgb of input) = 1/3; blend = Tin*tex + (1-Tin)*out
    want = (1 / 3) * np.array([1.0, 0, 0]) + (2 / 3) * np.array([0, 0, 1.0])
    np.testing.assert_allclose(np.asarray(rgba[0, :3]), want, atol=1e-5)


def test_node_material_renders():
    """End-to-end: a shinydiffuse with diffuse_shader driven by a mapper
    node over a procedural texture, via the embedding interface."""
    from core_tpu.interface import Interface
    from core_tpu.render import render_image, RenderOptions
    yi = Interface()
    yi.params_clear()
    yi.params_set_string("type", "clouds")
    yi.params_set_float("size", 0.01)
    yi.params_set_color("color1", 0.1, 0.1, 0.1)
    yi.params_set_color("color2", 0.9, 0.9, 0.9)
    yi.create_texture("cloudtex")

    yi.params_clear()
    yi.params_set_string("type", "shinydiffusemat")
    yi.params_set_color("color", 1.0, 0.0, 0.0)
    yi.params_set_string("diffuse_shader", "map1")
    yi.params_start_list()
    yi.params_push_list()
    yi.params_set_string("name", "map1")
    yi.params_set_string("type", "texture_mapper")
    yi.params_set_string("texture", "cloudtex")
    yi.params_set_string("texco", "global")
    yi.params_end_list()
    yi.create_material("noisy")

    yi.start_geometry()
    yi.start_tri_mesh()
    a = yi.add_vertex(-200, -200, 0)
    bb = yi.add_vertex(200, -200, 0)
    c = yi.add_vertex(0, 200, 0)
    yi.set_current_material("noisy")
    yi.add_triangle(a, bb, c)
    yi.end_tri_mesh()
    yi.end_geometry()

    yi.params_clear()
    yi.params_set_string("type", "pointlight")
    yi.params_set_point("from", 0, 0, 300)
    yi.params_set_color("color", 1, 1, 1)
    yi.params_set_float("power", 200000)
    yi.create_light("l")
    yi.params_clear()
    yi.params_set_string("type", "perspective")
    yi.params_set_point("from", 0, 0, 400)
    yi.params_set_point("to", 0, 0, 0)
    yi.params_set_point("up", 0, 1, 400)
    yi.params_set_int("resx", 24)
    yi.params_set_int("resy", 24)
    yi.create_camera("cam")
    yi.params_clear()
    yi.params_set_string("type", "directlighting")
    yi.create_integrator("surf")
    yi.params_clear()
    yi.params_set_string("type", "none")
    yi.create_integrator("vol")
    yi.setup_render(camera_name="cam", integrator_name="surf",
                    volintegrator_name="vol", AA_minsamples=1,
                    width=24, height=24)
    scene, opts = yi.compile()
    assert scene.node_programs, "node program not registered"
    img = yi.render()
    m = img[..., :3]
    hit = m.sum(-1) > 0
    assert hit.any()
    # texture variation: hit pixels are not all the same color
    assert np.asarray(m[hit]).std() > 1e-3
    # diffuse_shader REPLACES the base color: gray noise, not red
    reds = np.asarray(m[hit])
    assert (np.abs(reds[:, 0] - reds[:, 1]) < 0.15 * reds.max()).all()


def test_bump_mapping_perturbs_shading():
    """bump_shader: flat triangle + flat albedo + noise bump must show
    shading variation (applyBump, reference material.cc:68-75 +
    basicnodes.cc evalDerivative)."""
    from core_tpu.interface import Interface
    yi = Interface()
    yi.params_clear()
    yi.params_set_string("type", "clouds")
    yi.params_set_float("size", 0.05)
    yi.create_texture("tx")
    yi.params_clear()
    yi.params_set_string("type", "shinydiffusemat")
    yi.params_set_color("color", 0.7, 0.7, 0.7)
    yi.params_set_string("bump_shader", "bmap")
    yi.params_start_list()
    yi.params_push_list()
    yi.params_set_string("name", "bmap")
    yi.params_set_string("type", "texture_mapper")
    yi.params_set_string("texture", "tx")
    yi.params_set_string("texco", "global")
    yi.params_set_float("bump_strength", 20.0)
    yi.params_end_list()
    yi.create_material("bumpy")
    yi.start_geometry()
    yi.start_tri_mesh()
    a = yi.add_vertex(-300, -300, 0)
    b = yi.add_vertex(300, -300, 0)
    c = yi.add_vertex(0, 300, 0)
    yi.set_current_material("bumpy")
    yi.add_triangle(a, b, c)
    yi.end_tri_mesh()
    yi.end_geometry()
    yi.params_clear()
    yi.params_set_string("type", "pointlight")
    yi.params_set_point("from", 300, 300, 200)
    yi.params_set_color("color", 1, 1, 1)
    yi.params_set_float("power", 150000)
    yi.create_light("l")
    yi.params_clear()
    yi.params_set_string("type", "perspective")
    yi.params_set_point("from", 0, 0, 400)
    yi.params_set_point("to", 0, 0, 0)
    yi.params_set_point("up", 0, 1, 400)
    yi.params_set_int("resx", 32)
    yi.params_set_int("resy", 32)
    yi.create_camera("cam")
    yi.params_clear()
    yi.params_set_string("type", "directlighting")
    yi.create_integrator("surf")
    yi.params_clear()
    yi.params_set_string("type", "none")
    yi.create_integrator("vol")
    yi.setup_render(camera_name="cam", integrator_name="surf",
                    volintegrator_name="vol", AA_minsamples=1,
                    width=32, height=32)
    img = yi.render()
    m = img[..., :3]
    hit = m.sum(-1) > 0
    assert np.asarray(m[hit]).std() > 0.01


def test_architect_camera_differs_from_perspective():
    """Architect keeps vertical per-pixel steps aligned with world -Z
    (architectCamera.cc:53-66) — tilted cameras must produce different
    vup than perspective."""
    from core_tpu.cameras import make_perspective, make_architect
    kw = dict(pos=(0, -5, 1), look=(0, 0, 2), up=(0, -5, 2),
              resx=32, resy=32)
    p = make_perspective(**kw)
    a = make_architect(**kw)
    vup_p = np.asarray(p.vup)
    vup_a = np.asarray(a.vup)
    assert not np.allclose(vup_p, vup_a)
    # architect vup is along world Z only
    assert abs(vup_a[0]) < 1e-6 and abs(vup_a[1]) < 1e-6
