"""Host-side scene geometry assembly -> SoA device arrays.

Replaces the reference's mesh construction state machine
(scene_t::startTriMesh/addVertex/addTriangle/smoothMesh, reference
src/yafraycore/scene.cc + src/yafraycore/triangle.cc) with a numpy
assembler that bakes every mesh and instance into one flat SoA triangle
soup — the layout the wavefront TPU kernels consume.  Per-object identity
is kept as an int column, not as C++ objects.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp


class GeomData(NamedTuple):
    """Flattened scene geometry (pytree of device arrays).

    verts is a differentiable leaf; triangle edges/normals derive from it
    in-jit.  Corner (shading) normals come from smoothMesh-style averaging
    at compile time (reference triangle.cc smoothing).
    """
    verts: jnp.ndarray          # [V,3] f32
    tri_vidx: jnp.ndarray       # [T,3] i32 vertex indices
    corner_n: jnp.ndarray       # [T,3,3] f32 per-corner shading normals
    smooth: jnp.ndarray         # [T] bool — use corner_n vs geometric normal
    uvs: jnp.ndarray            # [T,3,2] f32 per-corner uv
    tri_mat: jnp.ndarray        # [T] i32 material index
    tri_light: jnp.ndarray      # [T] i32 area-light index (-1 = none)
    tri_obj: jnp.ndarray        # [T] i32 object id

    @property
    def n_tris(self) -> int:
        return self.tri_vidx.shape[0]


@dataclass
class MeshObject:
    """One mesh being assembled (reference triangleObject_t, meshtypes.h)."""
    obj_id: int
    verts: list = field(default_factory=list)
    uvs: list = field(default_factory=list)          # uv pool
    faces: list = field(default_factory=list)        # (a,b,c) vertex ids
    face_uvs: list = field(default_factory=list)     # (ua,ub,uc) uv ids or None
    face_mats: list = field(default_factory=list)    # material index per face
    smooth_angle: Optional[float] = None             # degrees; None = flat
    light_idx: int = -1


class MeshAssembler:
    """Builds GeomData from a sequence of meshes/instances.

    Usage mirrors the reference interface calls (yafrayinterface.h:55-77):
        a = MeshAssembler()
        m = a.start_mesh()
        a.add_vertex(m, x, y, z); a.add_triangle(m, ia, ib, ic, mat)
        a.smooth_mesh(m, angle)
        a.add_instance(base_obj_id, matrix4)
        geom = a.build()
    """

    def __init__(self):
        self.meshes: list[MeshObject] = []
        self.instances: list[tuple[int, np.ndarray]] = []
        self._next_obj = 0

    def start_mesh(self, light_idx: int = -1) -> MeshObject:
        m = MeshObject(obj_id=self._next_obj, light_idx=light_idx)
        self._next_obj += 1
        self.meshes.append(m)
        return m

    def add_vertex(self, m: MeshObject, x, y, z) -> int:
        m.verts.append((float(x), float(y), float(z)))
        return len(m.verts) - 1

    def add_uv(self, m: MeshObject, u, v) -> int:
        m.uvs.append((float(u), float(v)))
        return len(m.uvs) - 1

    def add_triangle(self, m: MeshObject, a, b, c, mat: int, uv_ids=None):
        m.faces.append((int(a), int(b), int(c)))
        m.face_uvs.append(tuple(int(i) for i in uv_ids) if uv_ids is not None else None)
        m.face_mats.append(int(mat))

    def smooth_mesh(self, m: MeshObject, angle_deg: float):
        m.smooth_angle = float(angle_deg)

    def add_curve(self, m: MeshObject, points, mat: int,
                  strand_start: float = 0.01, strand_end: float = 0.01,
                  strand_shape: float = 0.0):
        """Strand/hair curve: extrudes a triangular ribbon along the point
        chain exactly like the reference curve mesh
        (scene_t::endCurveMesh, src/yafraycore/scene.cc:138-230): per point
        a radius from the strand taper shape, two extruded side vertices in
        the tangent frame, 6 side triangles per segment + end caps, and 1-D
        strand UV coordinates (u=v=arc parameter)."""
        pts = np.asarray(points, np.float64).reshape(-1, 3)
        n = pts.shape[0]
        if n < 2:
            raise ValueError("curve needs >= 2 points")
        base = len(m.verts)
        for p in pts:
            self.add_vertex(m, *p)
        u = v = None
        for i in range(n):
            t = i / (n - 1)
            if strand_shape < 0:
                r = strand_start + t ** (1 + strand_shape) \
                    * (strand_end - strand_start)
            else:
                r = strand_start + (1 - (1 - t) ** (1 - strand_shape)) \
                    * (strand_end - strand_start)
            if i < n - 1:
                N = pts[i + 1] - pts[i]
                N = N / max(np.linalg.norm(N), 1e-20)
                # createCS (include/core_api/vector3d.h:316-334)
                if N[0] == 0 and N[1] == 0:
                    u = np.array([-1.0, 0, 0]) if N[2] < 0 \
                        else np.array([1.0, 0, 0])
                    v = np.array([0.0, 1, 0])
                else:
                    d = 1.0 / np.sqrt(N[1] * N[1] + N[0] * N[0])
                    u = np.array([N[1] * d, -N[0] * d, 0.0])
                    v = np.cross(N, u)
            o = pts[i]
            a = o - 0.5 * r * v - 1.5 * r / np.sqrt(3.0) * u
            b = o - 0.5 * r * v + 1.5 * r / np.sqrt(3.0) * u
            self.add_vertex(m, *a)
            self.add_vertex(m, *b)

        def uvid(s):
            return self.add_uv(m, s, s)

        for i in range(n - 1):
            su = i / (n - 1)
            sv = su + 1.0 / (n - 1)
            iu, iv = uvid(su), uvid(sv)
            a1, a2 = base + i, base + n + 2 * i
            a3 = a2 + 1
            b1, b2 = base + i + 1, a2 + 2
            b3 = b2 + 1
            if i == 0:  # bottom cap
                self.add_triangle(m, a1, a3, a2, mat, uv_ids=(iu, iu, iu))
            self.add_triangle(m, a1, b2, b1, mat, uv_ids=(iu, iv, iv))
            self.add_triangle(m, a1, a2, b2, mat, uv_ids=(iu, iu, iv))
            self.add_triangle(m, a2, b3, b2, mat, uv_ids=(iu, iv, iv))
            self.add_triangle(m, a2, a3, b3, mat, uv_ids=(iu, iu, iv))
            self.add_triangle(m, b3, a3, a1, mat, uv_ids=(iv, iu, iu))
            self.add_triangle(m, b3, a1, b1, mat, uv_ids=(iv, iu, iv))
        # top cap (i = n-1 after the loop, reference scene.cc:227)
        i = n - 1
        iv_top = uvid(1.0)
        self.add_triangle(m, base + i, base + n + 2 * i, base + n + 2 * i + 1,
                          mat, uv_ids=(iv_top, iv_top, iv_top))

    def add_instance(self, base_obj_id: int, matrix: np.ndarray) -> int:
        """Instance an already-added mesh with a 4x4 transform
        (reference scene_t::addInstance, scene.cc:982)."""
        self.instances.append((base_obj_id, np.asarray(matrix, np.float64)))
        obj_id = self._next_obj
        self._next_obj += 1
        return obj_id

    # ---- build ----

    def build(self) -> GeomData:
        all_v, all_f, all_cn, all_sm, all_uv, all_mat, all_light, all_obj = \
            [], [], [], [], [], [], [], []
        v_off = 0
        base_ranges = {}

        def emit(verts, faces, face_uvs, uv_pool, face_mats, smooth_angle,
                 light_idx, obj_id):
            nonlocal v_off
            verts = np.asarray(verts, np.float32).reshape(-1, 3)
            faces = np.asarray(faces, np.int32).reshape(-1, 3)
            nT = faces.shape[0]
            corner_n, smooth = _smooth_normals(verts, faces, smooth_angle)
            uvs = np.zeros((nT, 3, 2), np.float32)
            has_uv_faces = any(fu is not None for fu in face_uvs)
            have_pool = uv_pool is not None and len(uv_pool)
            if has_uv_faces and not have_pool:
                raise ValueError("mesh has per-face UV indices but no UV pool")
            if len(face_uvs) and have_pool:
                pool = np.asarray(uv_pool, np.float32).reshape(-1, 2)
                if all(fu is not None for fu in face_uvs):
                    # vectorized fast path: the per-face python loop costs
                    # ~40 s at 1M faces (big_scene)
                    uvs = pool[np.asarray(face_uvs, np.int64)]
                else:
                    for i, fu in enumerate(face_uvs):
                        if fu is not None:
                            uvs[i] = pool[list(fu)]
            all_v.append(verts)
            all_f.append(faces + v_off)
            all_cn.append(corner_n)
            all_sm.append(smooth)
            all_uv.append(uvs)
            all_mat.append(np.asarray(face_mats, np.int32))
            all_light.append(np.full(nT, light_idx, np.int32))
            all_obj.append(np.full(nT, obj_id, np.int32))
            base_ranges[obj_id] = (verts, faces, face_uvs, None, face_mats,
                                   smooth_angle, light_idx)
            v_off += verts.shape[0]

        for m in self.meshes:
            emit(m.verts, m.faces, m.face_uvs, m.uvs, m.face_mats,
                 m.smooth_angle, m.light_idx, m.obj_id)
            # keep uv pool for instances
            base_ranges[m.obj_id] = (np.asarray(m.verts, np.float32).reshape(-1, 3),
                                     np.asarray(m.faces, np.int32).reshape(-1, 3),
                                     m.face_uvs, m.uvs, m.face_mats,
                                     m.smooth_angle, m.light_idx)

        for obj_id_src, mat4 in self.instances:
            verts, faces, face_uvs, uv_pool, face_mats, sm_ang, light_idx = \
                base_ranges[obj_id_src]
            vh = np.concatenate([verts, np.ones((verts.shape[0], 1), np.float32)], axis=1)
            tv = (vh @ mat4.T)[:, :3].astype(np.float32)
            emit(tv, faces, face_uvs, uv_pool, face_mats, sm_ang, light_idx,
                 obj_id=self._next_obj)
            self._next_obj += 1

        if not all_f:
            raise ValueError("empty scene geometry")
        return GeomData(
            verts=jnp.asarray(np.concatenate(all_v)),
            tri_vidx=jnp.asarray(np.concatenate(all_f)),
            corner_n=jnp.asarray(np.concatenate(all_cn)),
            smooth=jnp.asarray(np.concatenate(all_sm)),
            uvs=jnp.asarray(np.concatenate(all_uv)),
            tri_mat=jnp.asarray(np.concatenate(all_mat)),
            tri_light=jnp.asarray(np.concatenate(all_light)),
            tri_obj=jnp.asarray(np.concatenate(all_obj)),
        )


def _smooth_normals(verts: np.ndarray, faces: np.ndarray,
                    angle_deg: Optional[float]):
    """Angle-thresholded vertex-normal smoothing (reference
    triangleObject_t smoothing, src/yafraycore/triangle.cc).

    Returns ([T,3,3] corner normals, [T] smooth flags)."""
    nT = faces.shape[0]
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    fn = np.cross(e1, e2)
    norm = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.maximum(norm, 1e-20)
    corner_n = np.repeat(fn[:, None, :], 3, axis=1).astype(np.float32)
    if angle_deg is None:
        return corner_n, np.zeros(nT, bool)
    cos_thresh = np.cos(np.radians(angle_deg))
    # area-weighted accumulation of face normals at each vertex
    vn = np.zeros_like(verts)
    weighted = fn * norm  # un-normalized (area-weighted) face normals
    for c in range(3):
        np.add.at(vn, faces[:, c], weighted)
    vn_norm = vn / np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-20)
    for c in range(3):
        cand = vn_norm[faces[:, c]]
        ok = np.sum(cand * fn, axis=1) > cos_thresh
        corner_n[:, c, :] = np.where(ok[:, None], cand, fn).astype(np.float32)
    return corner_n, np.ones(nT, bool)
