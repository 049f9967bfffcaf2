"""Built-in example scenes (the driver's benchmark configs, BASELINE.json).

cornell_box: config #1/#2 — the classic Cornell box with an area light,
shiny-diffuse walls and (optionally) glossy/glass blocks.
mesh_scene: config #3 — a ~100k-triangle displaced-terrain + torus mesh with
procedural-texture-mapped materials, a texture-environment background with
importance-sampled IBL (bglight 2-D luminance CDF) and a sun light.
"""
from __future__ import annotations

import numpy as np

from core_tpu.geometry.mesh import MeshAssembler
from core_tpu.materials.base import MaterialDef, MatType, build_material_table
from core_tpu.lights.area import make_area_light
from core_tpu.cameras import make_perspective
from core_tpu.scene import Scene


def _add_quad(a: MeshAssembler, m, p0, p1, p2, p3, mat: int):
    """Two triangles, CCW as seen from the visible side."""
    i0 = a.add_vertex(m, *p0)
    i1 = a.add_vertex(m, *p1)
    i2 = a.add_vertex(m, *p2)
    i3 = a.add_vertex(m, *p3)
    a.add_triangle(m, i0, i1, i2, mat)
    a.add_triangle(m, i0, i2, i3, mat)


def _box(a, m, corner, size_x, size_z, height, angle_deg, mat):
    """Axis-rotated box standing on the floor (classic Cornell blocks)."""
    c, s = np.cos(np.radians(angle_deg)), np.sin(np.radians(angle_deg))
    rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    base = np.asarray(corner, np.float64)
    dx = rot @ np.array([size_x, 0, 0])
    dz = rot @ np.array([0, 0, size_z])
    dy = np.array([0, height, 0])
    p = [base, base + dx, base + dx + dz, base + dz]
    q = [v + dy for v in p]
    _add_quad(a, m, q[0], q[1], q[2], q[3], mat)                  # top
    _add_quad(a, m, p[1], p[0], q[0], q[1], mat)                  # front
    _add_quad(a, m, p[2], p[1], q[1], q[2], mat)                  # right
    _add_quad(a, m, p[3], p[2], q[2], q[3], mat)                  # back
    _add_quad(a, m, p[0], p[3], q[3], q[0], mat)                  # left
    _add_quad(a, m, p[3], p[2], p[1], p[0], mat)                  # bottom


def cornell_box(resx=256, resy=256, light_samples=16, light_power=30.0,
                with_blocks=True, block_materials=("white", "white"),
                show_light_geo=True, intersector="auto") -> Scene:
    """The Cornell box (driver config #1: directlight, shiny-diffuse,
    1 area light).  block_materials picks ('white'|'mirror'|'glass'|'glossy'
    |'blend_diff'|'blend_cross') for the short and tall block."""
    WHITE, RED, GREEN, LIGHTMAT = 0, 1, 2, 3
    mats = [
        MaterialDef(name="white", diffuse_color=(0.75, 0.75, 0.75)),
        MaterialDef(name="red", diffuse_color=(0.63, 0.065, 0.05)),
        MaterialDef(name="green", diffuse_color=(0.14, 0.45, 0.091)),
        MaterialDef(name="light", diffuse_color=(1.0, 1.0, 1.0),
                    diffuse_strength=0.0, emit_strength=light_power),
    ]
    extra = {"white": WHITE}
    for bm in block_materials:
        if bm not in extra:
            if bm == "mirror":
                mats.append(MaterialDef(name="mirror", mirror_strength=1.0,
                                        diffuse_strength=0.0,
                                        mirror_color=(0.9, 0.9, 0.9)))
            elif bm == "glossy":
                # matches refgold/driver.cc's glossymat: as_diffuse=false
                # so the AS lobe goes through the glossy indirect branch
                # (recursiveRaytrace) exactly like the reference
                mats.append(MaterialDef(name="glossy", mtype=MatType.GLOSSY,
                                        diffuse_color=(0.3, 0.3, 0.3),
                                        glossy_color=(0.8, 0.8, 0.8),
                                        glossy_reflect=0.7, exp_u=120.0,
                                        exp_v=120.0, as_diffuse=False))
            elif bm == "glass":
                mats.append(MaterialDef(name="glass", mtype=MatType.GLASS,
                                        ior=1.5, filter_color=(1.0, 1.0, 1.0),
                                        transmit_filter=1.0))
            elif bm == "blend_diff":
                # same-family blend: white (+) red shinydiffuse at 0.35
                # (refgold/driver.cc "blend" mode short block; blend.cc)
                mats.append(MaterialDef(name="blend_diff",
                                        mtype=MatType.BLEND,
                                        sub_mat0=WHITE, sub_mat1=RED,
                                        blend_val=0.35))
            elif bm == "blend_cross":
                # CROSS-family blend: glossy (+) glass at 0.5 — exercises
                # scene.py's stochastic sub-material pick against the
                # reference's evaluated-BSDF mixture (blend.cc;
                # refgold/driver.cc "blend" mode tall block)
                mats.append(MaterialDef(name="bglossy", mtype=MatType.GLOSSY,
                                        diffuse_color=(0.3, 0.3, 0.3),
                                        glossy_color=(0.8, 0.8, 0.8),
                                        glossy_reflect=0.7, exp_u=120.0,
                                        exp_v=120.0, as_diffuse=False))
                mats.append(MaterialDef(name="bglass", mtype=MatType.GLASS,
                                        ior=1.5, filter_color=(1.0, 1.0, 1.0),
                                        transmit_filter=1.0))
                mats.append(MaterialDef(name="blend_cross",
                                        mtype=MatType.BLEND,
                                        sub_mat0=len(mats) - 2,
                                        sub_mat1=len(mats) - 1,
                                        blend_val=0.5))
            extra[bm] = len(mats) - 1

    a = MeshAssembler()
    m = a.start_mesh()
    # floor (y=0), normal +y
    _add_quad(a, m, (552.8, 0, 0), (0, 0, 0), (0, 0, 559.2),
              (549.6, 0, 559.2), WHITE)
    # ceiling (y=548.8), normal -y
    _add_quad(a, m, (556, 548.8, 0), (556, 548.8, 559.2),
              (0, 548.8, 559.2), (0, 548.8, 0), WHITE)
    # back wall (z=559.2), normal -z
    _add_quad(a, m, (549.6, 0, 559.2), (0, 0, 559.2),
              (0, 548.8, 559.2), (556, 548.8, 559.2), WHITE)
    # right wall (x=0) GREEN, normal +x
    _add_quad(a, m, (0, 0, 559.2), (0, 0, 0),
              (0, 548.8, 0), (0, 548.8, 559.2), GREEN)
    # left wall (x~552.8..556) RED, normal -x
    _add_quad(a, m, (552.8, 0, 0), (549.6, 0, 559.2),
              (556, 548.8, 559.2), (556, 548.8, 0), RED)

    if with_blocks:
        _box(a, m, (130.0, 0.0, 65.0), 160, 160, 165, -18.0,
             extra[block_materials[0]])
        _box(a, m, (265.0, 0.0, 296.0), 160, 160, 330, 17.0,
             extra[block_materials[1]])

    # area light quad on the ceiling, slightly below it, facing down (-y):
    # with the reference convention fnormal = toY x toX must point +y.
    lc = np.array([343.0, 548.0, 227.0])
    lp1 = np.array([343.0, 548.0, 332.0])
    lp2 = np.array([213.0, 548.0, 227.0])
    light = make_area_light(lc, lp1, lp2, color=(1.0, 1.0, 1.0),
                            power=light_power, samples=light_samples)
    if show_light_geo:
        lm = a.start_mesh()
        # geometry for the light so camera rays see it (emissive material)
        i0 = a.add_vertex(lm, *lc)
        i1 = a.add_vertex(lm, *lp1)
        i2 = a.add_vertex(lm, *(lp1 + (lp2 - lc)))
        i3 = a.add_vertex(lm, *lp2)
        a.add_triangle(lm, i0, i1, i2, LIGHTMAT)
        a.add_triangle(lm, i0, i2, i3, LIGHTMAT)

    geom = a.build()
    cam = make_perspective(pos=(278, 273, -800), look=(278, 273, 0),
                           up=(278, 274, -800), resx=resx, resy=resy,
                           focal=1.4)
    has_spec = any(d.mirror_strength > 0 or d.transparency > 0
                   or d.mtype in (MatType.GLASS, MatType.COATED_GLOSSY)
                   for d in mats)
    has_transp = any(d.transparency > 0 or d.mtype == MatType.GLASS
                     for d in mats)
    return Scene(geom=geom, materials=build_material_table(mats),
                 lights=(light,), camera=cam, background=None, accel=None,
                 has_specular=has_spec, has_transparency=has_transp,
                 mat_types=tuple(sorted({int(d.mtype) for d in mats})),
                 intersector=__import__("core_tpu.scene", fromlist=["x"])
                 .resolve_intersector(intersector, geom.n_tris))


def _terrain_height(x, z):
    """Deterministic multi-octave displacement (pure numpy, build time)."""
    h = np.zeros_like(x)
    for freq, amp, px, pz in ((0.7, 0.55, 0.0, 1.3), (1.7, 0.22, 2.1, 0.4),
                              (3.9, 0.11, 4.2, 5.0), (8.3, 0.05, 1.1, 2.7)):
        h = h + amp * np.sin(freq * x + px) * np.cos(freq * z + pz)
    return h


def _grid_mesh(a, m, n, extent, mat, uv_tiles=4.0):
    """n x n vertex grid on the XZ plane, displaced by _terrain_height.
    Bulk-extends the assembler's python lists (build-time numpy)."""
    xs = np.linspace(-extent, extent, n)
    zs = np.linspace(-extent, extent, n)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = _terrain_height(X, Z)
    base_v = len(m.verts)
    base_uv = len(m.uvs)
    verts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    m.verts.extend(map(tuple, verts))
    U, V = np.meshgrid(np.linspace(0, uv_tiles, n),
                       np.linspace(0, uv_tiles, n), indexing="ij")
    m.uvs.extend(map(tuple, np.stack([U, V], -1).reshape(-1, 2)))
    i, j = np.meshgrid(np.arange(n - 1), np.arange(n - 1), indexing="ij")
    v00 = (i * n + j).ravel() + base_v
    v01 = v00 + 1
    v10 = v00 + n
    v11 = v10 + 1
    f1 = np.stack([v00, v10, v11], axis=-1)
    f2 = np.stack([v00, v11, v01], axis=-1)
    faces = np.concatenate([f1, f2], axis=0)
    m.faces.extend(map(tuple, faces))
    uvf = faces - base_v + base_uv
    m.face_uvs.extend(map(tuple, uvf))
    m.face_mats.extend([mat] * len(faces))
    return len(faces)


def _torus_mesh(a, m, nu, nv, R, r, center, mat):
    """Parametric torus with UVs (bulk numpy)."""
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    U, V = np.meshgrid(us, vs, indexing="ij")
    cx, cy, cz = center
    x = (R + r * np.cos(V)) * np.cos(U) + cx
    z = (R + r * np.cos(V)) * np.sin(U) + cz
    y = r * np.sin(V) + cy
    base_v = len(m.verts)
    base_uv = len(m.uvs)
    m.verts.extend(map(tuple, np.stack([x, y, z], -1).reshape(-1, 3)))
    m.uvs.extend(map(tuple, np.stack(
        [U / (2 * np.pi) * 8.0, V / (2 * np.pi) * 2.0], -1).reshape(-1, 2)))
    i, j = np.meshgrid(np.arange(nu), np.arange(nv), indexing="ij")
    i1 = (i + 1) % nu
    j1 = (j + 1) % nv
    v00 = (i * nv + j).ravel() + base_v
    v01 = (i * nv + j1).ravel() + base_v
    v10 = (i1 * nv + j).ravel() + base_v
    v11 = (i1 * nv + j1).ravel() + base_v
    faces = np.concatenate([np.stack([v00, v10, v11], -1),
                            np.stack([v00, v11, v01], -1)], axis=0)
    m.faces.extend(map(tuple, faces))
    m.face_uvs.extend(map(tuple, faces - base_v + base_uv))
    m.face_mats.extend([mat] * len(faces))
    return len(faces)


def big_scene(resx=1024, resy=1024, ibl_samples=8, sun_samples=4):
    """BASELINE config #5 scale proof: ~1.02M-triangle scene at 1024^2
    (977k displaced-terrain tris + 40k torus tris) — the reference's
    kd-tree handles multi-million-triangle scenes (kdtree.cc); the TPU
    path is the grouped cluster kernel (cluster_intersect.py v2)."""
    return mesh_scene(resx=resx, resy=resy, n_grid=700, torus_u=250,
                      torus_v=80, ibl_samples=ibl_samples,
                      sun_samples=sun_samples)


def mesh_scene(resx=256, resy=256, n_grid=160, torus_u=180, torus_v=64,
               ibl_samples=8, sun_samples=4):
    """Driver config #3: ~100k-triangle mesh scene with texture-mapped
    materials and environment/background light importance sampling.

    Geometry: displaced terrain grid ((n_grid-1)^2 * 2 tris) + a smooth
    torus (torus_u * torus_v * 2 tris); defaults give ~73.6k tris — pass
    n_grid=200, torus_u=220, torus_v=72 for ~111k.  Materials: terrain is
    shiny-diffuse with a marble diffuse texture; the torus is glossy with a
    voronoi-driven diffuse.  Background: clouds texture environment with
    ibl=True, so compile creates the importance-sampled bglight (reference
    bglight.cc 2-D luminance CDF).  A sun light adds a dirac-ish key."""
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap
    from core_tpu.cameras import make_perspective

    b = SceneBuilder()
    b.create("texture", "rockmarble", ParamMap({
        "type": "marble", "color1": (0.22, 0.18, 0.14),
        "color2": (0.75, 0.7, 0.62), "size": 2.3, "depth": 3,
        "turbulence": 4.0, "sharpness": 2.0, "noise_type": "newperlin"}))
    b.create("texture", "cellvor", ParamMap({
        "type": "voronoi", "color1": (0.05, 0.12, 0.3),
        "color2": (0.9, 0.85, 0.6), "size": 1.4, "pattern": "f2f1",
        "intensity": 1.6}))
    b.create("texture", "skytex", ParamMap({
        "type": "clouds", "color1": (0.25, 0.45, 0.9),
        "color2": (1.0, 0.98, 0.92), "size": 0.8, "depth": 3,
        "noise_type": "stdperlin"}))

    b.create("material", "terrain", ParamMap({
        "type": "shinydiffusemat", "color": (0.7, 0.7, 0.7),
        "diffuse_reflect": 0.9, "diffuse_shader": "rockmarble"}))
    b.create("material", "torus", ParamMap({
        "type": "glossy", "diffuse_color": (0.4, 0.4, 0.45),
        "color": (0.7, 0.7, 0.75), "glossy_reflect": 0.35,
        "exponent": 80.0, "as_diffuse": False,
        "diffuse_shader": "cellvor"}))

    m = b.assembler.start_mesh()
    _grid_mesh(b.assembler, m, n_grid, 6.0, b.material_index("terrain"))
    b.assembler.smooth_mesh(m, 80.0)
    m2 = b.assembler.start_mesh()
    _torus_mesh(b.assembler, m2, torus_u, torus_v, 1.5, 0.55,
                (0.0, 1.6, 0.0), b.material_index("torus"))
    b.assembler.smooth_mesh(m2, 80.0)

    b.create("background", "world", ParamMap({
        "type": "textureback", "texture": "skytex", "ibl": True,
        "ibl_samples": ibl_samples, "power": 1.0}))
    b.create("light", "sun", ParamMap({
        "type": "sunlight", "direction": (0.45, 0.8, 0.3),
        "color": (1.0, 0.95, 0.85), "power": 1.6, "angle": 0.5,
        "samples": sun_samples}))

    b.camera = make_perspective(pos=(5.2, 3.4, -5.6), look=(0.0, 1.2, 0.0),
                                up=(5.2, 4.4, -5.6), resx=resx, resy=resy,
                                focal=1.25)
    return b.compile_scene()


def golden_mesh_scene(resx=128, resy=128, ibl_samples=8, asset_dir=None):
    """The EXACT scene of refgold/driver_ms.cc (BASELINE config #3
    golden): torus (48x24 quads, R=1.2 r=0.5, center (0,1.5,0), UVs
    x-tiled 3x, smooth 80 deg) + 24x24 ground quad (UV 0..6), both with
    a checker.tga diffuse through a texture_mapper(texco=uv) shader
    node, lit solely by a sky.tga textureback with ibl=True (the
    auto-created bglight importance CDF, reference bglight.cc:82-107).
    Assets: refgold/assets (make_assets.py)."""
    import os
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap
    if asset_dir is None:
        asset_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "refgold", "assets")

    b = SceneBuilder()
    b.create("texture", "checktex", ParamMap({
        "type": "image",
        "filename": os.path.join(asset_dir, "checker.tga"),
        "gamma": 1.0, "interpolate": "bilinear"}))
    b.create("texture", "skytex", ParamMap({
        "type": "image",
        "filename": os.path.join(asset_dir, "sky.tga"),
        "gamma": 1.0, "interpolate": "bilinear"}))

    def mapper(nm):
        return [ParamMap({"element": "shader_node", "name": nm,
                          "type": "texture_mapper", "texture": "checktex",
                          "texco": "uv"})]

    b.create("material", "ball", ParamMap({
        "type": "shinydiffusemat", "color": (1.0, 1.0, 1.0),
        "diffuse_reflect": 0.9, "diffuse_shader": "map_ball"}),
        extra=mapper("map_ball"))
    b.create("material", "ground", ParamMap({
        "type": "shinydiffusemat", "color": (1.0, 1.0, 1.0),
        "diffuse_reflect": 0.8, "diffuse_shader": "map_gnd"}),
        extra=mapper("map_gnd"))

    a = b.assembler
    U, V = 48, 24
    R, r, cy = 1.2, 0.5, 1.5
    ball_mat = b.material_index("ball")
    m = a.start_mesh()
    vid = {}
    uvid = {}
    for i in range(U + 1):
        u = 2.0 * np.pi * i / U
        for j in range(V + 1):
            v = 2.0 * np.pi * j / V
            x = (R + r * np.cos(v)) * np.cos(u)
            z = (R + r * np.cos(v)) * np.sin(u)
            y = cy + r * np.sin(v)
            vid[(i, j)] = a.add_vertex(m, x, y, z)
            uvid[(i, j)] = a.add_uv(m, 3.0 * i / U, j / V)
    for i in range(U):
        for j in range(V):
            p, q = vid[(i, j)], vid[(i + 1, j)]
            s, t = vid[(i + 1, j + 1)], vid[(i, j + 1)]
            up, uq = uvid[(i, j)], uvid[(i + 1, j)]
            us, ut = uvid[(i + 1, j + 1)], uvid[(i, j + 1)]
            a.add_triangle(m, p, q, s, ball_mat, uv_ids=(up, uq, us))
            a.add_triangle(m, p, s, t, ball_mat, uv_ids=(up, us, ut))
    a.smooth_mesh(m, 80.0)

    gnd_mat = b.material_index("ground")
    m2 = a.start_mesh()
    E, T = 12.0, 6.0
    v0 = a.add_vertex(m2, -E, 0.0, -E)
    v1 = a.add_vertex(m2, E, 0.0, -E)
    v2 = a.add_vertex(m2, E, 0.0, E)
    v3 = a.add_vertex(m2, -E, 0.0, E)
    u0 = a.add_uv(m2, 0.0, 0.0)
    u1 = a.add_uv(m2, T, 0.0)
    u2 = a.add_uv(m2, T, T)
    u3 = a.add_uv(m2, 0.0, T)
    a.add_triangle(m2, v0, v1, v2, gnd_mat, uv_ids=(u0, u1, u2))
    a.add_triangle(m2, v0, v2, v3, gnd_mat, uv_ids=(u0, u2, u3))

    b.create("background", "world", ParamMap({
        "type": "textureback", "texture": "skytex", "ibl": True,
        "ibl_samples": ibl_samples, "power": 1.0}))

    b.camera = make_perspective(pos=(6.0, 3.2, -7.5), look=(0.0, 1.8, 0.0),
                                up=(6.0, 4.2, -7.5), resx=resx, resy=resy,
                                focal=1.1)
    return b.compile_scene()


def golden_volume_scene(resx=128, resy=128):
    """The EXACT scene of refgold/driver_vol.cc (volume-integrator
    golden): gray 20x20 ground, UniformVolume box [-2,2]x[0,4]x[-2,2]
    (sigma_s 0.05, sigma_a 0.01), one 30-deg spotlight at (0,6,0)
    aimed straight down — the visible light shaft.  Render with
    VolumeOptions(integrator='singlescatter', step_size=0.2)."""
    from core_tpu.environment import SceneBuilder
    from core_tpu.params import ParamMap

    b = SceneBuilder()
    b.create("material", "gray", ParamMap({
        "type": "shinydiffusemat", "color": (0.6, 0.6, 0.6)}))
    a = b.assembler
    m = a.start_mesh()
    gray = b.material_index("gray")
    v0 = a.add_vertex(m, -10.0, 0.0, -10.0)
    v1 = a.add_vertex(m, 10.0, 0.0, -10.0)
    v2 = a.add_vertex(m, 10.0, 0.0, 10.0)
    v3 = a.add_vertex(m, -10.0, 0.0, 10.0)
    a.add_triangle(m, v0, v1, v2, gray)
    a.add_triangle(m, v0, v2, v3, gray)

    b.create("volumeregion", "fog", ParamMap({
        "type": "UniformVolume", "sigma_s": 0.05, "sigma_a": 0.01,
        "l_e": 0.0, "g": 0.0,
        "minX": -2.0, "minY": 0.0, "minZ": -2.0,
        "maxX": 2.0, "maxY": 4.0, "maxZ": 2.0}))
    b.create("light", "spot", ParamMap({
        "type": "spotlight", "from": (0.0, 6.0, 0.0), "to": (0.0, 0.0, 0.0),
        "color": (1.0, 1.0, 1.0), "power": 200.0, "cone_angle": 30.0,
        "blend": 0.15}))

    b.camera = make_perspective(pos=(5.0, 2.5, -6.0), look=(0.0, 1.5, 0.0),
                                up=(5.0, 3.5, -6.0), resx=resx, resy=resy,
                                focal=1.2)
    return b.compile_scene()
