#!/usr/bin/env python
"""Independent float64 brute-force path tracer for the Cornell box —
the energy ARBITER (round-4 verdict weak #5: bidirectional's energy was
bounded only by core_tpu's own path tracer).

Everything here is written from scratch in numpy float64: Moller-
Trumbore over all triangles (no accel), Lambert + NEE with uniform
area-light sampling, cosine-weighted indirect bounces, emission counted
on camera hits only.  Geometry/materials/camera constants are read from
core_tpu.scenes.cornell_box's compiled scene (they ARE the scene
definition), but no core_tpu math is used.

Run: python refgold/arbiter64.py [spp] [bounces] [res]
Prints the mean image energy (mean over pixels of mean(RGB)) and the
standard error.  The recorded value is asserted (with the band derived
from its SE + truncation bound) by
tests/test_golden_photon_family.py::test_bidirectional_structure_and_energy.
"""
import sys

import numpy as np


def build(res=64):
    from core_tpu.scenes import cornell_box
    sc = cornell_box(resx=res, resy=res, light_samples=16)
    g = sc.geom
    verts = np.asarray(g.verts, np.float64)
    tv = np.asarray(g.tri_vidx)
    a = verts[tv[:, 0]]
    e1 = verts[tv[:, 1]] - a
    e2 = verts[tv[:, 2]] - a
    mat = np.asarray(g.tri_mat)
    mats = sc.materials
    albedo = np.asarray(mats.diffuse_color, np.float64)
    # shinydiffuse diffuse strength lives in strengths[:, 3]
    dstr = np.asarray(mats.strengths, np.float64)[:, 3]
    emit = np.asarray(mats.emit_strength, np.float64)
    cam = sc.camera
    return dict(a=a, e1=e1, e2=e2, mat=mat, albedo=albedo, dstr=dstr,
                emit=emit,
                cam_pos=np.asarray(cam.pos, np.float64),
                vto=np.asarray(cam.vto, np.float64),
                vup=np.asarray(cam.vup, np.float64),
                vright=np.asarray(cam.vright, np.float64),
                # area light constants (scenes.py:135-139)
                lc=np.array([343.0, 548.0, 227.0]),
                lx=np.array([0.0, 0.0, 105.0]),     # lp1 - lc
                ly=np.array([-130.0, 0.0, 0.0]),    # lp2 - lc
                lpow=30.0)


def intersect(S, o, d, exclude):
    """Closest hit over all triangles; returns (t, tri, u, v)."""
    a, e1, e2 = S["a"], S["e1"], S["e2"]
    pv = np.cross(d[:, None, :], e2[None])          # [N,T,3]
    det = np.einsum("tj,ntj->nt", e1, pv)
    ok = np.abs(det) > 1e-14
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o[:, None, :] - a[None]
    u = np.einsum("ntj,ntj->nt", tvec, pv) * inv
    qv = np.cross(tvec, e1[None])
    v = np.einsum("nj,ntj->nt", d, qv) * inv
    t = np.einsum("tj,ntj->nt", e2, qv) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-9)
    if exclude is not None:
        hit &= np.arange(a.shape[0])[None] != exclude[:, None]
    t = np.where(hit, t, np.inf)
    tri = np.argmin(t, axis=1)
    tbest = t[np.arange(t.shape[0]), tri]
    ubest = u[np.arange(t.shape[0]), tri]
    vbest = v[np.arange(t.shape[0]), tri]
    return tbest, tri, ubest, vbest


def occluded(S, o, target, exclude):
    d = target - o
    dist = np.linalg.norm(d, axis=1)
    d = d / dist[:, None]
    t, tri, _, _ = intersect(S, o, d, exclude)
    return t < dist * (1.0 - 1e-9)


def run(spp=256, bounces=8, res=64, seed=1):
    S = build(res)
    rng = np.random.default_rng(seed)
    N = res * res
    acc = np.zeros((N, 3))
    per_spp = []
    larea = np.linalg.norm(np.cross(S["ly"], S["lx"]))
    lnrm = np.cross(S["ly"], S["lx"])
    lnrm = lnrm / np.linalg.norm(lnrm)              # points +y? -> down -y
    Le = np.full(3, S["lpow"])

    for s in range(spp):
        ys, xs = np.divmod(np.arange(N), res)
        px = xs + rng.random(N)
        py = ys + rng.random(N)
        d = (S["vright"][None] * px[:, None] + S["vup"][None] * py[:, None]
             + S["vto"][None])
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(S["cam_pos"], d.shape).copy()
        thr = np.ones((N, 3))
        exclude = None
        col = np.zeros((N, 3))
        for b in range(bounces + 1):
            t, tri, _, _ = intersect(S, o, d, exclude)
            alive = np.isfinite(t)
            if not alive.any():
                break
            m = S["mat"][tri]
            p = o + d * t[:, None]
            n = np.cross(S["e1"][tri], S["e2"][tri])
            n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                               1e-300)
            n = np.where(np.einsum("nj,nj->n", n, d)[:, None] > 0, -n, n)
            # emission on CAMERA hits only (NEE covers the rest)
            if b == 0:
                col += np.where(alive[:, None], thr * S["emit"][m][:, None]
                                * S["albedo"][m], 0.0)
            rho = S["albedo"][m] * S["dstr"][m][:, None]
            # NEE: uniform point on the light quad
            y = (S["lc"][None] + rng.random(N)[:, None] * S["lx"][None]
                 + rng.random(N)[:, None] * S["ly"][None])
            wi = y - p
            dist2 = np.einsum("nj,nj->n", wi, wi)
            dist = np.sqrt(dist2)
            wi = wi / dist[:, None]
            coss = np.einsum("nj,nj->n", n, wi)
            # fnormal convention (scenes.py:133-139): cross(to_y, to_x)
            # points +y INTO the scene; the light illuminates points with
            # dot(wi, fnormal) > 0 (area.py illum_sample)
            cosl = np.einsum("j,nj->n", lnrm, wi)
            front = (coss > 0) & (cosl > 0) & alive
            sh = occluded(S, p + n * 1e-7, y, tri)
            gterm = np.where(front & ~sh,
                             coss * cosl / dist2 * larea, 0.0)
            # YafaRay radiometric convention (materials/shinydiffuse.py
            # header): BSDF eval omits the 1/pi Lambert factor and area
            # lights bake a *pi into their radiance — net direct-light
            # contribution is rho * Le * cos*cosL*A/d^2 (pi x physical).
            # The arbiter reproduces the SYSTEM convention so its energy
            # is directly comparable with rendered images.
            col += thr * rho * Le[None] * gterm[:, None]
            if b == bounces:
                break
            # cosine-weighted bounce
            r1 = rng.random(N)
            r2 = rng.random(N)
            sq = np.sqrt(r1)
            lx_ = sq * np.cos(2 * np.pi * r2)
            ly_ = sq * np.sin(2 * np.pi * r2)
            lz_ = np.sqrt(np.maximum(0.0, 1.0 - r1))
            tb = np.where(np.abs(n[:, 0:1]) < 0.9,
                          np.array([[1.0, 0.0, 0.0]]),
                          np.array([[0.0, 1.0, 0.0]]))
            tang = np.cross(tb, n)
            tang = tang / np.linalg.norm(tang, axis=1, keepdims=True)
            bit = np.cross(n, tang)
            nd = (tang * lx_[:, None] + bit * ly_[:, None]
                  + n * lz_[:, None])
            thr = np.where(alive[:, None], thr * rho, 0.0)
            # kill lanes that hit the (non-reflective) light or escaped
            thr = np.where(np.isfinite(t)[:, None], thr, 0.0)
            o, d, exclude = p, nd, tri
        acc += col
        per_spp.append(col.mean())
    img = acc / spp
    e = img.mean()
    # SE from the spread of per-spp energy estimates
    se = np.std(per_spp) / np.sqrt(max(len(per_spp), 1))
    return e, se


if __name__ == "__main__":
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    e, se = run(spp, bounces, res)
    print(f"arbiter64 energy={e:.6f} se={se:.6f} "
          f"(spp={spp} bounces={bounces} res={res})")
