"""Camera models, batched over pixel wavefronts.

Reimplements the reference camera plugins (src/cameras/): perspective with
thin-lens DOF + bokeh shapes (perspectiveCamera.cc), architect
(architectCamera.cc), angular/fisheye (angularCamera.cc), orthographic
(orthoCamera.cc).  A camera is a small pytree; `shoot_ray` maps continuous
image coordinates (px, py) in [0,resx)x[0,resy) plus lens samples to world
rays for the whole wavefront at once.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from core_tpu.types import Rays
from core_tpu.mathutils import normalize, cross
from core_tpu.sampling.utils import shirley_disk


class CamType(enum.IntEnum):
    PERSPECTIVE = 0
    ARCHITECT = 1
    ANGULAR = 2
    ORTHOGRAPHIC = 3


class BokehType(enum.IntEnum):
    DISK1 = 0
    DISK2 = 1
    TRIANGLE = 3
    SQUARE = 4
    PENTAGON = 5
    HEXAGON = 6
    RING = 7


class BokehBias(enum.IntEnum):
    NONE = 0
    CENTER = 1
    EDGE = 2


def _static(default):
    return field(metadata=dict(static=True), default=default)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    pos: jnp.ndarray            # [3]
    cam_x: jnp.ndarray          # [3] camera axes
    cam_y: jnp.ndarray
    cam_z: jnp.ndarray
    vto: jnp.ndarray            # [3] image-plane origin dir
    vup: jnp.ndarray            # [3] per-pixel y step
    vright: jnp.ndarray         # [3] per-pixel x step
    cam_type: int = _static(0)  # CamType
    resx: int = _static(320)
    resy: int = _static(240)
    aspect_ratio: float = _static(1.0)
    focal: float = _static(1.0)
    aperture: float = _static(0.0)
    dof_distance: float = _static(0.0)
    bokeh_type: int = _static(0)
    bokeh_bias: int = _static(0)
    bokeh_rot: float = _static(0.0)
    angle_deg: float = _static(0.0)  # angular camera: max angle
    circular: bool = _static(False)  # angular camera: circular mask
    max_r: float = _static(1.0)      # angular: radius at angle


def _axes(pos, look, up):
    pos = np.asarray(pos, np.float64)
    cam_y = np.asarray(up, np.float64) - pos
    cam_z = np.asarray(look, np.float64) - pos
    cam_x = np.cross(cam_z, cam_y)
    cam_y = np.cross(cam_z, cam_x)
    cam_x /= np.linalg.norm(cam_x)
    cam_y /= np.linalg.norm(cam_y)
    cam_z /= np.linalg.norm(cam_z)
    return pos, cam_x, cam_y, cam_z


def make_perspective(pos, look, up, resx, resy, aspect=1.0, focal=1.0,
                     aperture=0.0, dof_distance=0.0,
                     bokeh_type=BokehType.DISK1, bokeh_bias=BokehBias.NONE,
                     bokeh_rot=0.0, architect=False) -> Camera:
    """Pinhole/thin-lens camera (reference perspectiveCam_t ctor + setAxis,
    perspectiveCamera.cc:28-70)."""
    pos, cam_x, cam_y, cam_z = _axes(pos, look, up)
    aspect_ratio = aspect * resy / float(resx)
    vright = cam_x.copy()
    if architect:
        # vertical-line preserving projection: the per-pixel vertical step
        # is the world up axis (-Z in the reference's Blender-style world),
        # not the tilted camera Y (architectCamera.cc:53-66)
        vup = aspect_ratio * np.array([0.0, 0.0, -1.0])
    else:
        vup = aspect_ratio * cam_y
    vto = cam_z * focal - 0.5 * (vup + vright)
    vup /= resy
    vright /= resx
    f = lambda a: jnp.asarray(a, jnp.float32)
    return Camera(
        cam_type=int(CamType.ARCHITECT if architect else CamType.PERSPECTIVE),
        pos=f(pos), cam_x=f(cam_x), cam_y=f(cam_y), cam_z=f(cam_z),
        vto=f(vto), vup=f(vup), vright=f(vright),
        resx=int(resx), resy=int(resy), aspect_ratio=float(aspect_ratio),
        focal=float(focal), aperture=float(aperture),
        dof_distance=float(dof_distance), bokeh_type=int(bokeh_type),
        bokeh_bias=int(bokeh_bias), bokeh_rot=float(bokeh_rot),
        angle_deg=0.0, circular=False, max_r=1.0)


def make_architect(*args, **kw) -> Camera:
    """Vertical-line-preserving perspective (reference architectCam_t):
    identical ray generation except vup is aligned with world Z projection;
    we reproduce by re-orthogonalizing cam_y against world up."""
    return make_perspective(*args, architect=True, **kw)


def make_angular(pos, look, up, resx, resy, aspect=1.0, angle=90.0,
                 max_angle=None, circular=True) -> Camera:
    """Angular/fisheye camera (reference angularCamera.cc)."""
    pos, cam_x, cam_y, cam_z = _axes(pos, look, up)
    max_angle = angle if max_angle is None else max_angle
    f = lambda a: jnp.asarray(a, jnp.float32)
    return Camera(
        cam_type=int(CamType.ANGULAR),
        pos=f(pos), cam_x=f(cam_x), cam_y=f(cam_y), cam_z=f(cam_z),
        vto=f(cam_z), vup=f(cam_y), vright=f(cam_x),
        resx=int(resx), resy=int(resy), aspect_ratio=float(aspect * resy / resx),
        focal=1.0, aperture=0.0, dof_distance=0.0,
        bokeh_type=0, bokeh_bias=0, bokeh_rot=0.0,
        angle_deg=float(angle), circular=bool(circular),
        max_r=float(max_angle) / float(angle))


def make_orthographic(pos, look, up, resx, resy, aspect=1.0, scale=1.0) -> Camera:
    """Parallel projection (reference orthoCamera.cc)."""
    pos, cam_x, cam_y, cam_z = _axes(pos, look, up)
    aspect_ratio = aspect * resy / float(resx)
    vright = cam_x * scale
    vup = aspect_ratio * cam_y * scale
    p0 = pos - 0.5 * (vup + vright)
    vup /= resy
    vright /= resx
    f = lambda a: jnp.asarray(a, jnp.float32)
    return Camera(
        cam_type=int(CamType.ORTHOGRAPHIC),
        pos=f(p0), cam_x=f(cam_x), cam_y=f(cam_y), cam_z=f(cam_z),
        vto=f(cam_z), vup=f(vup), vright=f(vright),
        resx=int(resx), resy=int(resy), aspect_ratio=float(aspect_ratio),
        focal=float(scale), aperture=0.0, dof_distance=0.0,
        bokeh_type=0, bokeh_bias=0, bokeh_rot=0.0,
        angle_deg=0.0, circular=False, max_r=1.0)


def _bias_dist(r, bias):
    if bias == BokehBias.CENTER:
        return jnp.sqrt(jnp.sqrt(r) * r)
    if bias == BokehBias.EDGE:
        return jnp.sqrt(1.0 - r * r)
    return jnp.sqrt(r)


def _lens_uv(cam: Camera, r1, r2):
    """Bokeh sampling (reference perspectiveCam_t::getLensUV,
    perspectiveCamera.cc:100-123)."""
    bt = cam.bokeh_type
    if bt in (int(BokehType.TRIANGLE), int(BokehType.SQUARE),
              int(BokehType.PENTAGON), int(BokehType.HEXAGON)):
        ns = bt
        w0 = np.radians(cam.bokeh_rot)
        wi = 2.0 * np.pi / ns
        angles = w0 + wi * np.arange(ns + 2)
        ls = np.stack([np.cos(angles), np.sin(angles)], axis=1).astype(np.float32)
        fn = float(ns)
        idx = jnp.clip((r1 * fn).astype(jnp.int32), 0, ns - 1)
        r1f = (r1 - idx.astype(jnp.float32) / fn) * fn
        r1f = _bias_dist(r1f, cam.bokeh_bias)
        b1 = r1f * r2
        b0 = r1f - b1
        lsj = jnp.asarray(ls)
        u = lsj[idx, 0] * b0 + lsj[idx + 1, 0] * b1
        v = lsj[idx, 1] * b0 + lsj[idx + 1, 1] * b1
        return u, v
    if bt == int(BokehType.DISK2) or bt == int(BokehType.RING):
        w = 2.0 * np.pi * r2
        if bt == int(BokehType.RING):
            r = jnp.full_like(r1, np.sqrt(0.707106781 + 0.292893218))
        else:
            r = _bias_dist(r1, cam.bokeh_bias)
        return r * jnp.cos(w), r * jnp.sin(w)
    return shirley_disk(r1, r2)


def project(cam: Camera, d):
    """Project world directions d [N,3] (from the camera position) to
    continuous pixel coordinates — the inverse of shoot_ray's image-plane
    mapping (reference perspectiveCam_t::project,
    perspectiveCamera.cc:168-187).  Returns (px, py, cos_to_axis, ok);
    ok is False for directions behind the camera or outside the image.
    Supported for perspective/architect (the reference implements project
    only for the perspective family too)."""
    dx = d @ cam.cam_x
    dy = d @ cam.cam_y
    dz = d @ cam.cam_z
    front = dz > 1e-6
    dz_safe = jnp.where(front, dz, 1.0)
    u = dx * cam.focal / dz_safe
    v = dy * cam.focal / (dz_safe * cam.aspect_ratio)
    ok = front & (u >= -0.5) & (u <= 0.5) & (v >= -0.5) & (v <= 0.5)
    px = (u + 0.5) * cam.resx
    py = (v + 0.5) * cam.resy
    return px, py, dz, ok


def shoot_ray(cam: Camera, px, py, lu=None, lv=None) -> tuple[Rays, jnp.ndarray]:
    """Generate camera rays.  px,py: continuous pixel coords arrays [N].
    Returns (rays, weight).  Weight 0 marks rays outside the image mapping
    (angular camera circular mask)."""
    px = jnp.asarray(px, jnp.float32)
    py = jnp.asarray(py, jnp.float32)
    n = px.shape
    wt = jnp.ones(n, jnp.float32)

    if cam.cam_type in (int(CamType.PERSPECTIVE), int(CamType.ARCHITECT)):
        d = cam.vright[None] * px[..., None] + cam.vup[None] * py[..., None] \
            + cam.vto[None]
        d = normalize(d)
        o = jnp.broadcast_to(cam.pos, d.shape)
        if cam.aperture != 0.0:
            u, v = _lens_uv(cam, lu, lv)
            li = cam.aperture * (cam.cam_x[None] * u[..., None]
                                 + cam.cam_y[None] * v[..., None])
            o = o + li
            d = normalize(d * cam.dof_distance - li)
        return Rays(o, d, jnp.zeros(n, jnp.float32), jnp.full(n, -1.0, jnp.float32)), wt

    if cam.cam_type == int(CamType.ANGULAR):
        # reference angularCamera.cc shootRay: u,v in [-1,1]
        u = 2.0 * px / cam.resx - 1.0
        v = 2.0 * py / cam.resy - 1.0
        u = u * cam.aspect_ratio if False else u  # aspect handled via resy scaling
        r = jnp.sqrt(u * u + v * v)
        theta = r * np.radians(cam.angle_deg)
        phi = jnp.arctan2(v, jnp.where(jnp.abs(u) < 1e-12, 1e-12, u))
        sin_t = jnp.sin(theta)
        d = cam.cam_z[None] * jnp.cos(theta)[..., None] \
            + (cam.cam_x[None] * jnp.cos(phi)[..., None]
               + cam.cam_y[None] * jnp.sin(phi)[..., None]) * sin_t[..., None]
        d = normalize(d)
        if cam.circular:
            wt = jnp.where(r > cam.max_r, 0.0, wt)
        o = jnp.broadcast_to(cam.pos, d.shape)
        return Rays(o, d, jnp.zeros(n, jnp.float32), jnp.full(n, -1.0, jnp.float32)), wt

    # orthographic
    o = cam.pos[None] + cam.vright[None] * px[..., None] \
        + cam.vup[None] * py[..., None]
    d = jnp.broadcast_to(cam.cam_z, o.shape)
    return Rays(o, d, jnp.zeros(n, jnp.float32), jnp.full(n, -1.0, jnp.float32)), wt
