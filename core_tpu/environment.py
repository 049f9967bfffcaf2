"""Factory registry + scene assembly — the reference's renderEnvironment_t.

The reference loads plugin .so files and keeps factory tables per element
kind (src/yafraycore/environment.cc:119-135, include/core_api/environment.h:
51-123).  TPU-native: plain decorator registries of Python factories keyed
by the SAME type names the reference uses, so reference XML scenes resolve
unmodified.  `SceneBuilder` collects created elements plus geometry and
compiles the immutable Scene pytree; `setup_render_options` maps the
reference's global render params (environment.cc:481-705) onto
RenderOptions.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from core_tpu.params import ParamMap
from core_tpu.geometry.mesh import MeshAssembler
from core_tpu.materials.base import MaterialDef, MatType, build_material_table
from core_tpu.scene import Scene

_FACTORIES: dict[str, dict[str, Callable]] = {
    "light": {}, "material": {}, "texture": {}, "camera": {},
    "background": {}, "integrator": {}, "volumeregion": {}, "object": {},
}


def register(kind: str, *names: str):
    """Factory registration decorator (replaces registerPlugin/dlopen)."""
    def deco(fn):
        for n in names:
            _FACTORIES[kind][n] = fn
        return fn
    return deco


def factory(kind: str, type_name: str) -> Callable:
    try:
        return _FACTORIES[kind][type_name]
    except KeyError:
        raise KeyError(f"no {kind} factory registered for type "
                       f"'{type_name}' (have: {sorted(_FACTORIES[kind])})")


class SceneBuilder:
    """Accumulates created elements + geometry, then compiles a Scene.

    The stateful counterpart of scene_t's construction API plus
    renderEnvironment_t's name->instance tables.
    """

    def __init__(self):
        self.assembler = MeshAssembler()
        self.materials: list[MaterialDef] = []
        self.material_names: dict[str, int] = {}
        self.textures: list = []           # TextureDef list
        self.texture_names: dict[str, int] = {}
        self.lights: list = []
        self.camera = None
        self.background = None
        self.volumes: list = []
        self.integrator_params: Optional[ParamMap] = None
        self.volume_integrator_params: Optional[ParamMap] = None
        self.render_params = ParamMap()
        self._cur_mesh = None
        self._deferred_lights: list = []   # (factory, params) needing scene
        # shader-node programs: (mat_index, slot, node_defs, out_node_name)
        self.node_programs: list = []

    # ---- element creation (factory dispatch) ----

    def create(self, kind: str, name: str, params: ParamMap, extra=None):
        tname = params.get_str("type")
        fn = factory(kind, tname)
        obj = fn(self, name, params, extra or [])
        return obj

    def material_index(self, name: str) -> int:
        return self.material_names.get(name, 0)

    # shader-node slots every reference material can map
    # (shinydiffuse.cc:496-556, glossy2.cc:88-96)
    NODE_SLOTS = ("diffuse_shader", "mirror_color_shader", "glossy_shader",
                  "glossy_reflect_shader", "transparency_shader",
                  "translucency_shader", "mirror_shader", "sigma_oren_shader",
                  "bump_shader")

    def collect_node_programs(self, mat_idx: int, p: ParamMap, extra):
        """Parse the material's eparams list (shader-node descriptions,
        reference paramsStartList/PushList) and record which material
        slots are node-mapped (nodematerial.cc loadNodes + material
        factories reading '<slot>_shader' params)."""
        from core_tpu.textures.nodes import parse_node
        ndefs = tuple(nd for nd in (parse_node(pm) for pm in (extra or []))
                      if nd is not None)
        if not ndefs:
            return
        names = {nd.name for nd in ndefs}
        for slot in self.NODE_SLOTS:
            ref = p.get_str(slot, "")
            if ref and ref in names:
                self.node_programs.append((mat_idx, slot, ndefs, ref))

    def add_material(self, name: str, mdef: MaterialDef) -> int:
        mdef.name = name
        idx = len(self.materials)
        self.materials.append(mdef)
        if name:
            self.material_names[name] = idx
        return idx

    def add_texture(self, name: str, tdef) -> int:
        tdef.name = name
        idx = len(self.textures)
        self.textures.append(tdef)
        if name:
            self.texture_names[name] = idx
        return idx

    # ---- geometry (scene_t state machine equivalents) ----

    def start_mesh(self, obj_id=None, has_uv=False):
        self._cur_mesh = self.assembler.start_mesh()
        self._cur_mesh_mat = 0
        self._has_uv = has_uv
        return self._cur_mesh

    def add_vertex(self, x, y, z):
        return self.assembler.add_vertex(self._cur_mesh, x, y, z)

    def add_uv(self, u, v):
        return self.assembler.add_uv(self._cur_mesh, u, v)

    def set_material(self, name: str):
        self._cur_mesh_mat = self.material_index(name)

    def add_triangle(self, a, b, c, uv=None):
        self.assembler.add_triangle(self._cur_mesh, a, b, c,
                                    self._cur_mesh_mat, uv_ids=uv)

    def smooth_mesh(self, obj_id, angle):
        # find mesh by obj id (assembler meshes are ordered)
        for m in self.assembler.meshes:
            if m.obj_id == obj_id:
                self.assembler.smooth_mesh(m, angle)
                return True
        return False

    def end_mesh(self):
        self._cur_mesh = None

    def start_curve_mesh(self, obj_id=None):
        """Curve/strand mesh (reference scene_t::startCurveMesh,
        scene.cc:118): collect points until end_curve_mesh."""
        self._cur_mesh = self.assembler.start_mesh()
        self._curve_points = []
        return self._cur_mesh

    def add_curve_vertex(self, x, y, z):
        self._curve_points.append((float(x), float(y), float(z)))
        return len(self._curve_points) - 1

    def end_curve_mesh(self, mat_name: str, strand_start: float,
                       strand_end: float, strand_shape: float):
        """Tessellates the collected strand (scene_t::endCurveMesh)."""
        self.assembler.add_curve(self._cur_mesh, self._curve_points,
                                 self.material_index(mat_name),
                                 strand_start, strand_end, strand_shape)
        self._cur_mesh = None
        self._curve_points = []
        return True

    def add_instance(self, base_obj_id, matrix):
        return self.assembler.add_instance(base_obj_id, np.asarray(matrix))

    # ---- final compile ----

    def compile_scene(self) -> Scene:
        from core_tpu.textures.base import build_texture_set
        if not self.materials:
            self.add_material("default", MaterialDef())
        geom = self.assembler.build()
        ctex = build_texture_set(self.textures) if self.textures else None
        mats = build_material_table(self.materials)
        has_spec = any(
            d.mirror_strength > 0 or d.transparency > 0
            or d.mtype in (MatType.GLASS, MatType.COATED_GLOSSY)
            for d in self.materials)
        has_transp = any(d.transparency > 0 or d.mtype == MatType.GLASS
                         for d in self.materials)
        if self.camera is None:
            from core_tpu.cameras import make_perspective
            self.camera = make_perspective(pos=(0, 1, -5), look=(0, 1, 0),
                                           up=(0, 2, -5), resx=320, resy=240)
        from core_tpu.scene import resolve_intersector
        types = {int(d.mtype) for d in self.materials}
        for d in self.materials:
            if d.mtype in (MatType.BLEND, MatType.MASK):
                for sub in (d.sub_mat0, d.sub_mat1):
                    if 0 <= sub < len(self.materials):
                        types.add(int(self.materials[sub].mtype))
        isect = resolve_intersector("auto", geom.n_tris)
        accel = None
        if isect == "cluster":
            from core_tpu.geometry.cluster_intersect import build_clusters
            # camera position orders groups/clusters front-to-back so the
            # kernels' tcap gating prunes everything behind the first hit
            accel = build_clusters(np.asarray(geom.verts),
                                   np.asarray(geom.tri_vidx),
                                   sort_origin=np.asarray(self.camera.pos)
                                   if self.camera is not None else None)
        scene = Scene(geom=geom, materials=mats, lights=tuple(self.lights),
                      camera=self.camera, background=self.background,
                      accel=accel, textures=ctex,
                      volumes=tuple(self.volumes),
                      has_specular=has_spec, has_transparency=has_transp,
                      mat_types=tuple(sorted(types)),
                      node_programs=tuple(self.node_programs),
                      texture_name_map=tuple(sorted(
                          self.texture_names.items())),
                      intersector=isect)
        # deferred lights that need scene data (e.g. meshlight over an obj)
        for fn, name, params in self._deferred_lights:
            light = fn(self, name, params, scene=scene)
            if light is not None:
                scene = __import__("dataclasses").replace(
                    scene, lights=scene.lights + (light,))
        return scene

    def render_options(self):
        span = None
        if self.volumes:
            span = max(float(np.linalg.norm(np.asarray(v.bmax)
                                            - np.asarray(v.bmin)))
                       for v in self.volumes)
        return setup_render_options(self.render_params,
                                    self.integrator_params,
                                    self.volume_integrator_params,
                                    volume_span=span)


def volume_march_steps(step_size: float, volume_span: Optional[float]) -> int:
    """Static march step count from the reference's world-space stepSize
    (SingleScatterIntegrator.cc:16): steps ~= span / stepSize over the
    largest volume's diagonal, clamped so TPU static shapes stay sane."""
    if volume_span is None or volume_span <= 0:
        return 16
    return int(np.clip(np.ceil(volume_span / step_size), 4, 128))


def setup_render_options(rp: ParamMap, ip: Optional[ParamMap],
                         vp: Optional[ParamMap],
                         volume_span: Optional[float] = None):
    """Map the reference's global render + integrator params onto
    RenderOptions (environment.cc setupScene :596-705, createImageFilm
    :481-532; integrator factories in src/integrators/).

    volume_span: host-side diagonal of the largest volume region (used to
    turn the reference's world-space stepSize into a static march count)."""
    from core_tpu.render import RenderOptions
    from core_tpu.film import FilterType
    from core_tpu.integrators.direct import DirectOptions
    from core_tpu.integrators.path import PathOptions
    from core_tpu.integrators.volume import VolumeOptions

    ip = ip or ParamMap({"type": "directlighting"})
    itype = ip.get_str("type", "directlighting")
    raydepth = ip.get_int("raydepth", 5)
    common_ao = dict(
        transp_shad=ip.get_bool("transpShad", False),
        shadow_depth=ip.get_int("shadowDepth", 5),
        use_ao=ip.get_bool("do_AO", False),
        ao_samples=ip.get_int("AO_samples", 32),
        ao_dist=ip.get_float("AO_distance", 1.0),
        ao_color=ParamMap(ip).get_color("AO_color", (1.0, 1.0, 1.0)),
        transp_background=rp.get_bool("bg_transp", False),
    )
    if itype in ("pathtracing", "pathtracer"):
        integrator = "pathtracing"
        iopts = PathOptions(
            path_samples=ip.get_int("path_samples", 32),
            bounces=ip.get_int("bounces", 3),
            raydepth=raydepth,
            no_recursive=ip.get_bool("no_recursive", False),
            caustic_type=ip.get_str("caustic_type", "path"),
            c_photons=ip.get_int("photons", 500000),
            caustic_radius=ip.get_float("caustic_radius", 0.25),
            caustic_depth=ip.get_int("caustic_depth", 10),
            use_sss=ip.get_bool("useSSS", False),
            sss_photons=ip.get_int("sssPhotons", 8192),
            sss_steps=ip.get_int("sssDepth", 4),
            sss_scale=ip.get_float("sssScale", 1.0),
            **common_ao)
    elif itype == "photonmapping":
        from core_tpu.integrators.photonmap import PhotonOptions
        integrator = "photonmapping"
        iopts = PhotonOptions(
            photons=ip.get_int("photons", 100000),
            c_photons=ip.get_int("cPhotons", 50000),
            diffuse_radius=ip.get_float("diffuseRadius", 1.0),
            caustic_radius=ip.get_float("causticRadius", 0.1),
            bounces=ip.get_int("bounces", 5),
            final_gather=ip.get_bool("finalGather", True),
            fg_samples=ip.get_int("fg_samples", 16),
            raydepth=raydepth,
            transp_background=rp.get_bool("bg_transp", False))
    elif itype == "SPPM":
        from core_tpu.integrators.sppm import SPPMOptions
        integrator = "SPPM"
        iopts = SPPMOptions(
            passes=ip.get_int("passNums", 8),
            photons=ip.get_int("photons", 100000),
            bounces=ip.get_int("bounces", 5),
            search_radius=ip.get_float("photonRadius", 1.0)
            * ip.get_float("times", 1.0),
            pm_ire=ip.get_bool("pmIRE", False),
            search_count=ip.get_int("searchNum", 64),
            raydepth=raydepth)
    elif itype == "bidirectional":
        from core_tpu.integrators.bidir import BidirOptions
        integrator = "bidirectional"
        iopts = BidirOptions(
            eye_depth=min(raydepth, 6), light_depth=min(raydepth, 6),
            transp_background=rp.get_bool("bg_transp", False),
            do_light_image=ip.get_bool("do_LightImage", True))
    elif itype == "DebugIntegrator":
        from core_tpu.integrators.debug import DebugOptions
        integrator = "debug"
        dbg = {1: "N", 2: "dPdU", 3: "dPdV", 4: "NU", 5: "NV",
               6: "dSdU", 7: "dSdV"}
        iopts = DebugOptions(
            debug_type=dbg.get(ip.get_int("debugType", 1), "N"),
            show_pn=ip.get_bool("showPN", False))
    else:
        if itype not in ("directlighting",):
            # the reference aborts on an unknown integrator plugin
            # (environment.cc createIntegrator nullptr -> setupScene fail);
            # silently rendering a different algorithm would poison golden
            # comparisons, so raise instead of falling back
            raise ValueError(f"unknown surface integrator type '{itype}'")
        integrator = "directlight"
        iopts = DirectOptions(
            raydepth=raydepth,
            use_sss=ip.get_bool("useSSS", False),
            sss_photons=ip.get_int("sssPhotons", 8192),
            sss_steps=ip.get_int("sssDepth", 4),
            sss_scale=ip.get_float("sssScale", 1.0),
            **common_ao)

    vtype = (vp or ParamMap()).get_str("type", "none")
    vmap = {"EmissionIntegrator": "emission",
            "SingleScatterIntegrator": "singlescatter",
            # real background-driven Rayleigh+Mie marcher
            # (SkyIntegrator.cc:55-272)
            "SkyIntegrator": "sky",
            "none": "none"}
    vpm = vp or ParamMap()
    step_size = max(1e-4, vpm.get_float("stepSize", 1.0))
    vopts = VolumeOptions(integrator=vmap.get(vtype, "none"),
                          step_size=step_size,
                          steps=volume_march_steps(step_size, volume_span),
                          sky_alpha=vpm.get_float("alpha", 0.5),
                          sky_scale=vpm.get_float("sigma_t", 0.1),
                          sky_turbidity=vpm.get_float("turbidity", 3.0),
                          optimize=vpm.get_bool("optimize", False),
                          att_grid_res=max(
                              4, 8 * vpm.get_int("attgridScale", 2)))

    filt = {"box": FilterType.BOX, "mitchell": FilterType.MITCHELL,
            "gauss": FilterType.GAUSS, "lanczos": FilterType.LANCZOS}.get(
        rp.get_str("filter_type", "box").lower(), FilterType.BOX)
    return RenderOptions(
        aa_passes=max(1, rp.get_int("AA_passes", 1)),
        aa_samples=max(1, rp.get_int("AA_minsamples", 1)),
        aa_inc_samples=max(1, rp.get_int("AA_inc_samples", 1)),
        aa_threshold=rp.get_float("AA_threshold", 0.05),
        filter_type=filt,
        filter_size=rp.get_float("AA_pixelwidth", 1.5),
        gamma=rp.get_float("gamma", 1.0),
        clamp_rgb=rp.get_bool("clamp_rgb", False),
        premult=rp.get_bool("premult", False),
        show_sam_pix=rp.get_bool("show_sam_pix", False),
        integrator=integrator, integrator_opts=iopts, volume_opts=vopts,
        z_channel=rp.get_bool("z_channel", False))


# =====================  element factories  =====================

@register("material", "shinydiffusemat")
def _mat_shinydiffuse(b: SceneBuilder, name, p: ParamMap, extra):
    d = MaterialDef(
        mtype=MatType.SHINY_DIFFUSE,
        diffuse_color=p.get_color("color", (1.0, 1.0, 1.0)),
        mirror_color=p.get_color("mirror_color", (1.0, 1.0, 1.0)),
        mirror_strength=p.get_float("specular_reflect", 0.0),
        transparency=p.get_float("transparency", 0.0),
        translucency=p.get_float("translucency", 0.0),
        diffuse_strength=p.get_float("diffuse_reflect", 1.0),
        emit_strength=p.get_float("emit", 0.0),
        transmit_filter=p.get_float("transmit_filter", 1.0),
        ior=p.get_float("IOR", 1.33),
        fresnel=p.get_bool("fresnel_effect", False),
        oren_nayar_sigma=(p.get_float("sigma", 0.1)
                          if p.get_str("diffuse_brdf", "") == "oren_nayar"
                          else None))
    _maybe_diffuse_tex(b, d, p)
    idx = b.add_material(name, d)
    b.collect_node_programs(idx, p, extra)
    return idx


def _maybe_diffuse_tex(b: SceneBuilder, d: MaterialDef, p: ParamMap):
    tname = p.get_str("diffuse_shader", "")
    if tname and tname in b.texture_names:
        d.diffuse_tex = b.texture_names[tname]


@register("material", "glossy", "coated_glossy")
def _mat_glossy(b: SceneBuilder, name, p: ParamMap, extra):
    coated = p.get_str("type") == "coated_glossy"
    aniso = p.get_bool("anisotropic", False)
    exp = p.get_float("exponent", 50.0)
    d = MaterialDef(
        mtype=MatType.COATED_GLOSSY if coated else MatType.GLOSSY,
        diffuse_color=p.get_color("diffuse_color", (1.0, 1.0, 1.0)),
        glossy_color=p.get_color("color", (1.0, 1.0, 1.0)),
        glossy_reflect=p.get_float("glossy_reflect", 1.0),
        diffuse_strength=p.get_float("diffuse_reflect", 1.0),
        exp_u=p.get_float("exp_u", exp) if aniso else exp,
        exp_v=p.get_float("exp_v", exp) if aniso else exp,
        as_diffuse=p.get_bool("as_diffuse", False),
        ior=p.get_float("IOR", 1.4),
        mirror_color=p.get_color("mirror_color", (1.0, 1.0, 1.0)))
    _maybe_diffuse_tex(b, d, p)
    idx = b.add_material(name, d)
    b.collect_node_programs(idx, p, extra)
    return idx


@register("material", "glass", "rough_glass")
def _mat_glass(b: SceneBuilder, name, p: ParamMap, extra):
    rough = p.get_str("type") == "rough_glass"
    d = MaterialDef(
        mtype=MatType.ROUGH_GLASS if rough else MatType.GLASS,
        ior=p.get_float("IOR", 1.4),
        filter_color=p.get_color("filter_color", (1.0, 1.0, 1.0)),
        mirror_color=p.get_color("mirror_color", (1.0, 1.0, 1.0)),
        transmit_filter=p.get_float("transmit_filter", 1.0),
        absorption=p.get_color("absorption", (0.0, 0.0, 0.0)),
        dispersion=p.get_float("dispersion_power", 0.0),
        fake_shadows=p.get_bool("fake_shadows", False),
        alpha_rough=p.get_float("alpha", 0.5) if rough else 0.0)
    return b.add_material(name, d)


@register("material", "blend_mat")
def _mat_blend(b: SceneBuilder, name, p: ParamMap, extra):
    d = MaterialDef(
        mtype=MatType.BLEND,
        sub_mat0=b.material_index(p.get_str("material1", "")),
        sub_mat1=b.material_index(p.get_str("material2", "")),
        blend_val=p.get_float("blend_value", 0.5))
    return b.add_material(name, d)


@register("material", "mask_mat")
def _mat_mask(b: SceneBuilder, name, p: ParamMap, extra):
    d = MaterialDef(
        mtype=MatType.MASK,
        sub_mat0=b.material_index(p.get_str("material1", "")),
        sub_mat1=b.material_index(p.get_str("material2", "")),
        blend_val=p.get_float("threshold", 0.5))
    tname = p.get_str("mask", "")
    if tname in b.texture_names:
        d.blend_tex = b.texture_names[tname]
    return b.add_material(name, d)


@register("material", "mirror")
def _mat_mirror(b: SceneBuilder, name, p: ParamMap, extra):
    d = MaterialDef(mirror_strength=p.get_float("reflect", 1.0),
                    mirror_color=p.get_color("color", (1.0, 1.0, 1.0)),
                    diffuse_strength=0.0)
    return b.add_material(name, d)


@register("material", "null")
def _mat_null(b: SceneBuilder, name, p: ParamMap, extra):
    return b.add_material(name, MaterialDef(diffuse_strength=0.0))


@register("material", "light_mat")
def _mat_light(b: SceneBuilder, name, p: ParamMap, extra):
    d = MaterialDef(diffuse_color=p.get_color("color", (1.0, 1.0, 1.0)),
                    diffuse_strength=0.0,
                    emit_strength=p.get_float("power", 1.0))
    return b.add_material(name, d)


@register("material", "translucent")
def _mat_translucent(b: SceneBuilder, name, p: ParamMap, extra):
    # TheBounty SSS material (src/materials/translucent.cc): glossy+diffuse
    # surface; sigmaA/sigmaS/g medium params drive the dipole photon maps
    # (integrators/sss.py) when the integrator enables useSSS.
    d = MaterialDef(
        mtype=MatType.TRANSLUCENT,
        diffuse_color=p.get_color("color", (1.0, 1.0, 1.0)),
        glossy_color=p.get_color("glossy_color", (1.0, 1.0, 1.0)),
        glossy_reflect=p.get_float("glossy_reflect", 0.2),
        diffuse_strength=p.get_float("diffuse_reflect", 1.0),
        exp_u=p.get_float("exponent", 50.0),
        exp_v=p.get_float("exponent", 50.0),
        ior=p.get_float("IOR", 1.3),
        absorption=p.get_color("sigmaA", (0.01, 0.01, 0.01)),
        sigma_s=p.get_color("sigmaS", (1.0, 1.0, 1.0)),
        sss_g=p.get_float("g", 0.0))
    return b.add_material(name, d)


@register("light", "pointlight")
def _light_point(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.point import make_point_light
    l = make_point_light(pos=p.get_point("from"),
                         color=p.get_color("color", (1, 1, 1)),
                         power=p.get_float("power", 1.0))
    b.lights.append(l)
    return l


@register("light", "spotlight")
def _light_spot(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.spot import make_spot_light
    l = make_spot_light(pos=p.get_point("from"), to=p.get_point("to"),
                        color=p.get_color("color", (1, 1, 1)),
                        power=p.get_float("power", 1.0),
                        cone_angle=p.get_float("cone_angle", 45.0),
                        falloff=p.get_float("blend", 0.15),
                        photon_only=p.get_bool("photon_only", False))
    b.lights.append(l)
    return l


@register("light", "directional")
def _light_directional(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.sun import make_directional_light
    l = make_directional_light(
        direction=p.get_point("direction", (0, 0, 1)),
        color=p.get_color("color", (1, 1, 1)),
        power=p.get_float("power", 1.0),
        infinite=p.get_bool("infinite", True),
        pos=p.get_point("from"), radius=p.get_float("radius", 1.0))
    b.lights.append(l)
    return l


@register("light", "sunlight")
def _light_sun(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.sun import make_sun_light
    l = make_sun_light(direction=p.get_point("direction", (0, 0, 1)),
                       color=p.get_color("color", (1, 1, 1)),
                       power=p.get_float("power", 1.0),
                       angle=p.get_float("angle", 0.27),
                       samples=p.get_int("samples", 4))
    b.lights.append(l)
    return l


@register("light", "arealight")
def _light_area(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.area import make_area_light
    l = make_area_light(corner=p.get_point("corner"),
                        point1=p.get_point("point1"),
                        point2=p.get_point("point2"),
                        color=p.get_color("color", (1, 1, 1)),
                        power=p.get_float("power", 1.0),
                        samples=p.get_int("samples", 4))
    b.lights.append(l)
    return l


@register("light", "ieslight")
def _light_ies(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.ies import make_ies_light
    path = p.get_str("file", "")
    with open(path) as f:
        text = f.read()
    l = make_ies_light(pos=p.get_point("from"), to=p.get_point("to"),
                       color=p.get_color("color", (1.0, 1.0, 1.0))[:3],
                       power=p.get_float("power", 1.0), ies_text=text,
                       samples=p.get_int("samples", 1))
    b.lights.append(l)
    return l


@register("light", "bgPortalLight")
def _light_portal(b: SceneBuilder, name, p: ParamMap, extra):
    # bgportallight.cc binds a portal mesh object + the scene background;
    # both exist only at compile time -> deferred like meshlight
    obj_id = p.get_int("object", 0)

    def make(builder, name, p, scene):
        from core_tpu.lights.portal import make_bg_portal_light
        geom = scene.geom
        sel = np.asarray(geom.tri_obj) == obj_id
        if not sel.any():
            return None
        return make_bg_portal_light(
            np.asarray(geom.verts), np.asarray(geom.tri_vidx)[sel],
            background=scene.background, power=p.get_float("power", 1.0),
            samples=p.get_int("samples", 4), obj_id=obj_id)

    b._deferred_lights.append((make, name, p))
    return None


@register("light", "spherelight")
def _light_sphere(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.lights.sphere import make_sphere_light
    l = make_sphere_light(center=p.get_point("from"),
                          radius=p.get_float("radius", 1.0),
                          color=p.get_color("color", (1, 1, 1)),
                          power=p.get_float("power", 1.0),
                          samples=p.get_int("samples", 4))
    b.lights.append(l)
    return l


@register("light", "meshlight")
def _light_mesh(b: SceneBuilder, name, p: ParamMap, extra):
    obj_id = p.get_int("object", 0)

    def make(builder, name, p, scene):
        from core_tpu.lights.mesh import make_mesh_light
        geom = scene.geom
        sel = np.asarray(geom.tri_obj) == obj_id
        if not sel.any():
            return None
        verts = np.asarray(geom.verts)
        tris = np.asarray(geom.tri_vidx)[sel]
        return make_mesh_light(verts, tris,
                               color=p.get_color("color", (1, 1, 1)),
                               power=p.get_float("power", 1.0),
                               samples=p.get_int("samples", 4),
                               double_sided=p.get_bool("double_sided", False),
                               obj_id=obj_id)

    b._deferred_lights.append((make, name, p))
    return None


@register("light", "bglight")
def _light_bg(b: SceneBuilder, name, p: ParamMap, extra):
    def make(builder, name, p, scene):
        from core_tpu.lights.bg import make_bg_light
        if scene.background is None:
            return None
        return make_bg_light(scene.background,
                             samples=p.get_int("samples", 8),
                             abs_intersect=p.get_bool("abs_intersect", False))
    b._deferred_lights.append((make, name, p))
    return None


@register("texture", "clouds", "marble", "wood", "voronoi", "musgrave",
          "distorted_noise", "rgb_cube", "blend", "image")
def _texture(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.textures.base import TexType, TextureDef, MusgraveType
    t = p.get_str("type")
    kw = dict(color1=p.get_color("color1", (0, 0, 0)),
              color2=p.get_color("color2", (1, 1, 1)),
              size=p.get_float("size", 1.0),
              noise_type=p.get_str("noise_type", "newperlin"),
              hard=p.get_bool("hard", False))
    if t == "clouds":
        d = TextureDef(ttype=TexType.CLOUDS, depth=p.get_int("depth", 2),
                       bias={"none": 0, "positive": 1,
                             "negative": 2}.get(p.get_str("bias", "none"), 0),
                       **kw)
    elif t == "marble":
        d = TextureDef(ttype=TexType.MARBLE, depth=p.get_int("depth", 2),
                       turb=p.get_float("turbulence", 1.0),
                       sharpness=p.get_float("sharpness", 1.0),
                       shape=p.get_str("shape", "sin"), **kw)
    elif t == "wood":
        d = TextureDef(ttype=TexType.WOOD, depth=p.get_int("depth", 2),
                       turb=p.get_float("turbulence", 1.0),
                       rings=p.get_str("wood_type", "bands") == "rings",
                       shape=p.get_str("shape", "sin"), **kw)
    elif t == "voronoi":
        from core_tpu.textures import noise as nz
        vt = {"f1": nz.V_F1, "f2": nz.V_F2, "f3": nz.V_F3, "f4": nz.V_F4,
              "f2f1": nz.V_F2F1, "crackle": nz.V_CRACKLE}.get(
            p.get_str("pattern", "f1"), nz.V_F1)
        d = TextureDef(ttype=TexType.VORONOI, vor_type=vt,
                       vor_mk_exp=p.get_float("exponent", 2.5),
                       vor_iscale=p.get_float("intensity", 1.0),
                       vor_weights=(p.get_float("weight1", 1.0),
                                    p.get_float("weight2", 0.0),
                                    p.get_float("weight3", 0.0),
                                    p.get_float("weight4", 0.0)), **kw)
    elif t == "musgrave":
        mt = {"fBm": MusgraveType.FBM,
              "multifractal": MusgraveType.MULTIFRACTAL,
              "heteroterrain": MusgraveType.HETERO_TERRAIN,
              "hybridmf": MusgraveType.HYBRID_MF,
              "ridgedmf": MusgraveType.RIDGED_MF}.get(
            p.get_str("musgrave_type", "fBm"), MusgraveType.FBM)
        d = TextureDef(ttype=TexType.MUSGRAVE, mus_type=mt,
                       mus_h=p.get_float("H", 1.0),
                       mus_lacunarity=p.get_float("lacunarity", 2.0),
                       mus_octaves=p.get_float("octaves", 2.0),
                       mus_offset=p.get_float("offset", 1.0),
                       mus_gain=p.get_float("gain", 1.0),
                       mus_iscale=p.get_float("intensity", 1.0), **kw)
    elif t == "distorted_noise":
        d = TextureDef(ttype=TexType.DISTORTED,
                       distort=p.get_float("distort", 1.0),
                       noise_type2=p.get_str("noise_type2", "newperlin"),
                       **kw)
    elif t == "rgb_cube":
        d = TextureDef(ttype=TexType.RGB_CUBE)
    elif t == "blend":
        d = TextureDef(ttype=TexType.BLEND,
                       blend_type=p.get_str("stype", "lin"))
    else:  # image
        from core_tpu.io.image import read_image
        fname = p.get_str("filename")
        img = read_image(fname)
        d = TextureDef(ttype=TexType.IMAGE, image=img,
                       interpolate=p.get_str("interpolate", "bilinear"),
                       clip_mode=p.get_str("clipping", "repeat"),
                       xrepeat=p.get_int("xrepeat", 1),
                       yrepeat=p.get_int("yrepeat", 1),
                       gamma=p.get_float("gamma", 1.0),
                       use_alpha=p.get_bool("use_alpha", True))
    return b.add_texture(name, d)


@register("camera", "perspective", "architect")
def _cam_perspective(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.cameras import make_perspective, BokehType, BokehBias
    bt = {"disk1": BokehType.DISK1, "disk2": BokehType.DISK2,
          "triangle": BokehType.TRIANGLE, "square": BokehType.SQUARE,
          "pentagon": BokehType.PENTAGON, "hexagon": BokehType.HEXAGON,
          "ring": BokehType.RING}.get(p.get_str("bokeh_type", "disk1"),
                                      BokehType.DISK1)
    bb = {"uniform": BokehBias.NONE, "center": BokehBias.CENTER,
          "edge": BokehBias.EDGE}.get(p.get_str("bokeh_bias", "uniform"),
                                      BokehBias.NONE)
    cam = make_perspective(
        pos=p.get_point("from"), look=p.get_point("to"),
        up=p.get_point("up"), resx=p.get_int("resx", 320),
        resy=p.get_int("resy", 240), aspect=p.get_float("aspect_ratio", 1.0),
        focal=p.get_float("focal", 1.0),
        aperture=p.get_float("aperture", 0.0),
        dof_distance=p.get_float("dof_distance", 0.0),
        bokeh_type=bt, bokeh_bias=bb,
        bokeh_rot=p.get_float("bokeh_rotation", 0.0),
        architect=p.get_str("type") == "architect")
    b.camera = cam
    return cam


@register("camera", "angular")
def _cam_angular(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.cameras import make_angular
    cam = make_angular(pos=p.get_point("from"), look=p.get_point("to"),
                       up=p.get_point("up"), resx=p.get_int("resx", 320),
                       resy=p.get_int("resy", 240),
                       angle=p.get_float("angle", 90.0),
                       max_angle=p.get_float("max_angle", None)
                       if "max_angle" in p else None,
                       circular=p.get_bool("circular", True))
    b.camera = cam
    return cam


@register("camera", "orthographic", "ortho")
def _cam_ortho(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.cameras import make_orthographic
    cam = make_orthographic(pos=p.get_point("from"), look=p.get_point("to"),
                            up=p.get_point("up"), resx=p.get_int("resx", 320),
                            resy=p.get_int("resy", 240),
                            scale=p.get_float("scale", 1.0))
    b.camera = cam
    return cam


@register("background", "constant")
def _bg_constant(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.backgrounds import make_constant_background
    bg = make_constant_background(color=p.get_color("color", (1, 1, 1)),
                                  power=p.get_float("power", 1.0),
                                  ibl=p.get_bool("ibl", False),
                                  ibl_samples=p.get_int("ibl_samples", 8))
    b.background = bg
    _auto_ibl(b, bg, p)
    return bg


@register("background", "gradientback")
def _bg_gradient(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.backgrounds import make_gradient_background
    bg = make_gradient_background(
        horizon=p.get_color("horizon_color", (1, 1, 1)),
        zenith=p.get_color("zenith_color", (0.4, 0.5, 1.0)),
        horizon_ground=p.get_color("horizon_ground_color", None)
        if "horizon_ground_color" in p else None,
        zenith_ground=p.get_color("zenith_ground_color", None)
        if "zenith_ground_color" in p else None,
        power=p.get_float("power", 1.0), ibl=p.get_bool("ibl", False))
    b.background = bg
    _auto_ibl(b, bg, p)
    return bg


@register("background", "darksky")
def _bg_darksky(b: SceneBuilder, name, p: ParamMap, extra):
    """TheBounty darksky (src/backgrounds/darksky.cc:factory): spectral
    daylight with color-space selection, night mode, auto 'Real Sun'
    (attenuated spectral sun color) and auto background light."""
    from core_tpu.backgrounds import (make_darksky_background,
                                      darksky_sun_color)
    turb = p.get_float("turbidity", 4.0)
    night = p.get_bool("night", False)
    bright = p.get_float("bright", 1.0)
    sun_power = p.get_float("sun_power", 1.0)
    if night:
        bright *= 0.5
        sun_power *= 0.5
    bg = make_darksky_background(
        sun_dir=p.get_point("from", (1, 1, 1)),
        turbidity=turb,
        a_var=p.get_float("a_var", 1.0), b_var=p.get_float("b_var", 1.0),
        c_var=p.get_float("c_var", 1.0), d_var=p.get_float("d_var", 1.0),
        e_var=p.get_float("e_var", 1.0),
        power=p.get_float("power", 1.0), bright=bright,
        altitude=p.get_float("altitude", 0.0), night=night,
        exposure=p.get_float("exposure", 1.0),
        color_space=p.get_str("color_space", "CIE (E)"),
        ibl=p.get_bool("background_light", False),
        ibl_samples=p.get_int("light_samples", 8))
    b.background = bg
    d = np.asarray(p.get_point("from", (1, 1, 1)), np.float64)
    dn = d / max(np.linalg.norm(d), 1e-20)
    if p.get_bool("add_sun", False) and \
            np.degrees(np.arccos(np.clip(d[2], -1.0, 1.0))) < 100.0:
        from core_tpu.lights.sun import make_sun_light
        suncol = darksky_sun_color(bg, turb)
        b.lights.append(make_sun_light(
            direction=dn, color=suncol, power=sun_power,
            angle=float(0.5 * (2.0 - dn[2])),
            samples=p.get_int("light_samples", 8)))
    if p.get_bool("background_light", False):
        def make(builder, name, pp, scene):
            from core_tpu.lights.bg import make_bg_light
            return make_bg_light(bg, samples=pp.get_int("light_samples", 8))
        b._deferred_lights.append((make, "darksky_bglight", p))
    return bg


@register("background", "sunsky")
def _bg_sunsky(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.backgrounds import make_sunsky_background
    bg = make_sunsky_background(
        sun_dir=p.get_point("from", (1, 1, 1)),
        turbidity=p.get_float("turbidity", 4.0),
        a_var=p.get_float("a_var", 1.0), b_var=p.get_float("b_var", 1.0),
        c_var=p.get_float("c_var", 1.0), d_var=p.get_float("d_var", 1.0),
        e_var=p.get_float("e_var", 1.0),
        power=p.get_float("power", 1.0))
    b.background = bg
    if p.get_bool("add_sun", False):
        from core_tpu.lights.sun import make_sun_light
        b.lights.append(make_sun_light(
            direction=p.get_point("from", (1, 1, 1)), color=(1, 1, 1),
            power=p.get_float("sun_power", 1.0)))
    _auto_ibl(b, bg, p)
    return bg


@register("background", "textureback")
def _bg_texture(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.backgrounds import make_texture_background
    from core_tpu.textures.base import build_texture_set
    tname = p.get_str("texture")
    tid = b.texture_names.get(tname, 0)
    # the background owns its compiled texture set (scene textures may grow
    # after this call)
    ctex = build_texture_set([b.textures[tid]]) if b.textures else None
    bg = make_texture_background(
        ctex, tex_id=0, power=p.get_float("power", 1.0),
        rotation=p.get_float("rotation", 0.0),
        projection="angular" if p.get_str("mapping", "") == "probe"
        else "sphere", ibl=p.get_bool("ibl", False))
    b.background = bg
    _auto_ibl(b, bg, p)
    return bg


def _auto_ibl(b: SceneBuilder, bg, p: ParamMap):
    """Auto-create a bglight for importance-sampled IBL
    (textureback.cc:140-160 'ibl' param)."""
    if p.get_bool("ibl", False):
        def make(builder, name, pp, scene):
            from core_tpu.lights.bg import make_bg_light
            return make_bg_light(bg, samples=pp.get_int("ibl_samples", 8))
        b._deferred_lights.append((make, "ibl", p))


@register("integrator", "directlighting", "pathtracing", "photonmapping",
          "SPPM", "bidirectional", "DebugIntegrator")
def _integrator(b: SceneBuilder, name, p: ParamMap, extra):
    b.integrator_params = p
    return p


@register("integrator", "none", "EmissionIntegrator",
          "SingleScatterIntegrator", "SkyIntegrator")
def _vol_integrator(b: SceneBuilder, name, p: ParamMap, extra):
    b.volume_integrator_params = p
    return p


@register("object", "sphere")
def _obj_sphere(b: SceneBuilder, name, p: ParamMap, extra):
    """Sphere object (reference src/yafraycore/std_primitives.cc:33-90,
    sphere_factory).  The reference keeps spheres analytic in its generic
    kd-tree; a heterogeneous primitive type would break the uniform
    triangle wavefront on TPU, so here the sphere is tessellated at build
    time with *exact* sphere normals at every vertex (smooth-interpolated
    at shading, matching getSurface's analytic normal to first order) and
    the reference's U/V parametrization (atan2-based, std_primitives.cc:68-69).
    """
    center = np.asarray(p.get_point("center", (0.0, 0.0, 0.0)), np.float64)
    radius = p.get_float("radius", 1.0)
    mat = b.material_index(p.get_str("material", ""))
    n_u = int(p.get_int("tess_u", 64))
    n_v = int(p.get_int("tess_v", 32))
    m = b.assembler.start_mesh()
    idx = {}
    for j in range(n_v + 1):
        theta = np.pi * j / n_v
        for i in range(n_u + 1):
            phi = 2 * np.pi * i / n_u
            nrm = np.array([np.sin(theta) * np.cos(phi),
                            np.sin(theta) * np.sin(phi), np.cos(theta)])
            vi = b.assembler.add_vertex(m, *(center + radius * nrm))
            # U = atan2(y,x)/pi + 1, V = 1 - acos(z)/pi (std_primitives.cc)
            uvi = b.assembler.add_uv(m, np.arctan2(nrm[1], nrm[0]) / np.pi + 1.0,
                                     1.0 - theta / np.pi)
            idx[(j, i)] = (vi, uvi)
    for j in range(n_v):
        for i in range(n_u):
            (a, ua), (bb, ub) = idx[(j, i)], idx[(j, i + 1)]
            (c, uc), (d, ud) = idx[(j + 1, i + 1)], idx[(j + 1, i)]
            # outward-facing winding (geometric normal == sphere normal)
            if j > 0:
                b.assembler.add_triangle(m, a, c, bb, mat, uv_ids=(ua, uc, ub))
            if j < n_v - 1:
                b.assembler.add_triangle(m, a, d, c, mat, uv_ids=(ua, ud, uc))
    b.assembler.smooth_mesh(m, 181.0)  # all-smooth: exact vertex normals win
    return m.obj_id


@register("volumeregion", "UniformVolume")
def _vol_uniform(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.volumes import make_uniform_volume
    v = make_uniform_volume(
        sigma_a=p.get_float("sigma_a", 0.1),
        sigma_s=p.get_float("sigma_s", 0.1),
        l_e=p.get_float("l_e", 0.0), g=p.get_float("g", 0.0),
        bmin=(p.get_float("minX"), p.get_float("minY"), p.get_float("minZ")),
        bmax=(p.get_float("maxX"), p.get_float("maxY"), p.get_float("maxZ")))
    b.volumes.append(v)
    return v


@register("volumeregion", "ExpDensityVolume")
def _vol_exp(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.volumes import make_expdensity_volume
    v = make_expdensity_volume(
        sigma_a=p.get_float("sigma_a", 0.1),
        sigma_s=p.get_float("sigma_s", 0.1),
        l_e=p.get_float("l_e", 0.0), g=p.get_float("g", 0.0),
        a=p.get_float("a", 1.0), b=p.get_float("b", 1.0),
        bmin=(p.get_float("minX"), p.get_float("minY"), p.get_float("minZ")),
        bmax=(p.get_float("maxX"), p.get_float("maxY"), p.get_float("maxZ")))
    b.volumes.append(v)
    return v


@register("volumeregion", "GridVolume")
def _vol_grid(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.volumes import make_grid_volume
    import numpy as np_
    g = p.get("grid")
    density_file = p.get_str("density_file", "")
    if g is None and density_file:
        # reference GridVolume.cc:40-125 reads POV-Ray df3 voxel grids;
        # .npy accepted as the native-array convenience format
        from core_tpu.volumes.regions import load_density_grid
        g = load_density_grid(density_file)
    if g is None:
        g = np_.ones((2, 2, 2), np_.float32)
    v = make_grid_volume(
        grid=g,
        sigma_a=p.get_float("sigma_a", 0.1),
        sigma_s=p.get_float("sigma_s", 0.1),
        l_e=p.get_float("l_e", 0.0), g=p.get_float("g", 0.0),
        bmin=(p.get_float("minX"), p.get_float("minY"), p.get_float("minZ")),
        bmax=(p.get_float("maxX"), p.get_float("maxY"), p.get_float("maxZ")))
    b.volumes.append(v)
    return v


@register("volumeregion", "SkyVolume")
def _vol_sky(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.volumes.regions import make_sky_volume
    v = make_sky_volume(
        s_ray=p.get_float("sigma_t", 0.05) * 0.8,
        s_mie=p.get_float("sigma_t", 0.05) * 0.2,
        l_e=p.get_float("l_e", 0.0), g=p.get_float("g", 0.8),
        bmin=(p.get_float("minX"), p.get_float("minY"), p.get_float("minZ")),
        bmax=(p.get_float("maxX"), p.get_float("maxY"), p.get_float("maxZ")))
    b.volumes.append(v)
    return v


@register("volumeregion", "NoiseVolume")
def _vol_noise(b: SceneBuilder, name, p: ParamMap, extra):
    from core_tpu.volumes import make_noise_volume
    v = make_noise_volume(
        sigma_a=p.get_float("sigma_a", 0.1),
        sigma_s=p.get_float("sigma_s", 0.1),
        l_e=p.get_float("l_e", 0.0), g=p.get_float("g", 0.0),
        sharpness=p.get_float("sharpness", 1.0),
        cover=p.get_float("cover", 1.0),
        density=p.get_float("density", 1.0),
        bmin=(p.get_float("minX"), p.get_float("minY"), p.get_float("minZ")),
        bmax=(p.get_float("maxX"), p.get_float("maxY"), p.get_float("maxZ")))
    b.volumes.append(v)
    return v
