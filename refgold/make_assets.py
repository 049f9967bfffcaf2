#!/usr/bin/env python
"""Deterministic TGA assets for the mesh+IBL golden scene (driver_ms.cc
and core_tpu.scenes.golden_mesh_scene build the SAME scene; the textures
are 24-bit uncompressed TGAs so both renderers decode identical 8-bit
values — the reference's own tgaHandler.cc codec has no external deps).
"""
import os
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ASSETS = os.path.join(HERE, "assets")


def write_tga(path, img):
    """24-bit uncompressed TGA, top-left origin (descriptor 0x20)."""
    h, w, _ = img.shape
    b = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    hdr = bytearray(18)
    hdr[2] = 2                      # uncompressed true-color
    hdr[12] = w & 0xFF
    hdr[13] = (w >> 8) & 0xFF
    hdr[14] = h & 0xFF
    hdr[15] = (h >> 8) & 0xFF
    hdr[16] = 24
    hdr[17] = 0x20                  # top-left origin
    bgr = b[..., ::-1]              # TGA stores BGR
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(bgr.tobytes())


def checker(n=256, tiles=16):
    y, x = np.mgrid[0:n, 0:n]
    cell = ((x * tiles // n) + (y * tiles // n)) % 2
    a = np.array([0.9, 0.85, 0.8])
    bcol = np.array([0.2, 0.3, 0.55])
    img = np.where(cell[..., None] == 0, a, bcol)
    # horizontal gradient breaks the symmetry so mapping-mode errors
    # (u flip, rotation) shift energy visibly
    img = img * (0.55 + 0.45 * x[..., None] / (n - 1.0))
    return img.astype(np.float32)


def sky(w=256, h=128):
    v = np.linspace(0.0, 1.0, h)[:, None, None]      # 0 top .. 1 bottom
    u = np.linspace(0.0, 1.0, w)[None, :, None]
    top = np.array([1.0, 0.97, 0.9])
    horizon = np.array([0.35, 0.55, 0.95])
    ground = np.array([0.10, 0.09, 0.12])
    img = np.where(v < 0.5,
                   top + (horizon - top) * (v / 0.5),
                   horizon + (ground - horizon) * ((v - 0.5) / 0.5))
    img = np.broadcast_to(img, (h, w, 3)).copy()
    # bright disc (importance-sampling hot spot) in the upper sky
    du = (u - 0.3) * 2.0
    dv = ((v - 0.18) * 1.0)
    d2 = du * du + dv * dv
    disc = np.clip(1.0 - d2 / 0.012, 0.0, 1.0) ** 0.5
    img = img + disc * np.array([1.0, 0.95, 0.8]) * 0.9
    return np.clip(img, 0.0, 1.0).astype(np.float32)


if __name__ == "__main__":
    os.makedirs(ASSETS, exist_ok=True)
    write_tga(os.path.join(ASSETS, "checker.tga"), checker())
    write_tga(os.path.join(ASSETS, "sky.tga"), sky())
    print("wrote", ASSETS)
