"""Image I/O.

The reference ships six native codecs (src/image_handlers/: TGA, HDR/RGBE,
PNG, JPEG, TIFF, EXR).  Here: PNG (pure-python zlib encoder, no deps),
HDR/RGBE (own codec like the reference's), TGA, and NPY for lossless
float I/O.  JPEG/TIFF/EXR write through PIL/imageio when available.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_png(path: str, img: np.ndarray, alpha: bool = False):
    """img: [H,W,3|4] float in [0,1] (gamma already applied)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    ch = 4 if alpha and img.shape[-1] >= 4 else 3
    data = to_uint8(img[..., :ch])
    h, w = data.shape[:2]
    color_type = 6 if ch == 4 else 2
    raw = b"".join(b"\x00" + data[r].tobytes() for r in range(h))

    def chunk(tag, payload):
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    png += chunk(b"IDAT", zlib.compress(raw, 6))
    png += chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(png)


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader (8-bit RGB/RGBA, no interlace) -> float [0,1]."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = ch = None
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and interlace == 0, "unsupported PNG"
            ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        if ft == 1:    # sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # up
            line = (line + prev) & 0xFF
        elif ft == 3:  # avg
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # paeth
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        out[r] = line
        prev = line
    return out.reshape(h, w, ch).astype(np.float32) / 255.0


def write_hdr(path: str, img: np.ndarray):
    """Radiance RGBE writer (reference src/image_handlers/hdrHandler.cc)."""
    rgb = np.asarray(img)[..., :3].astype(np.float32)
    h, w = rgb.shape[:2]
    maxc = rgb.max(axis=-1)
    e = np.zeros(maxc.shape, np.int32)
    m = np.zeros(maxc.shape, np.float32)
    nz = maxc > 1e-32
    m[nz], e[nz] = np.frexp(maxc[nz])
    scale = np.where(nz, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def read_hdr(path: str) -> np.ndarray:
    """Radiance RGBE reader (flat + RLE scanlines)."""
    with open(path, "rb") as f:
        buf = f.read()
    pos = buf.index(b"\n\n") + 2 if b"\n\n" in buf else 0
    # resolution line
    eol = buf.index(b"\n", pos)
    res = buf[pos:eol].decode().split()
    h, w = int(res[1]), int(res[3])
    data = buf[eol + 1:]
    rgbe = np.zeros((h, w, 4), np.uint8)
    p = 0
    for r in range(h):
        if data[p] == 2 and data[p + 1] == 2:  # new RLE
            p += 4
            for c in range(4):
                x = 0
                while x < w:
                    cnt = data[p]; p += 1
                    if cnt > 128:
                        rgbe[r, x:x + cnt - 128, c] = data[p]; p += 1
                        x += cnt - 128
                    else:
                        rgbe[r, x:x + cnt, c] = np.frombuffer(
                            data[p:p + cnt], np.uint8)
                        p += cnt
                        x += cnt
        else:
            row = np.frombuffer(data[p:p + 4 * w], np.uint8).reshape(w, 4)
            rgbe[r] = row
            p += 4 * w
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def write_tga(path: str, img: np.ndarray, alpha: bool = False):
    """Uncompressed TGA (reference tgaHandler.cc)."""
    data = to_uint8(np.asarray(img))
    h, w = data.shape[:2]
    ch = 4 if alpha and data.shape[-1] >= 4 else 3
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h, ch * 8,
                      0x20 | (8 if ch == 4 else 0))
    px = data[..., :ch][..., ::-1] if ch == 3 else \
        np.concatenate([data[..., 2::-1][..., ::1], data[..., 3:4]], axis=-1)
    # BGR(A) order
    bgr = data[..., [2, 1, 0]] if ch == 3 else data[..., [2, 1, 0, 3]]
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(bgr.tobytes())


def _exr_attr(name: bytes, typ: bytes, payload: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<i", len(payload)) \
        + payload


def write_exr(path: str, img: np.ndarray, alpha: bool = False):
    """OpenEXR 2.0 writer, uncompressed FLOAT scanlines (the reference's
    exrHandler.cc writes half+zip via libIlmImf; here a dependency-free
    subset: 32-bit float, compression NONE)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    chans = ["A", "B", "G", "R"] if (alpha and img.shape[-1] > 3) else \
        ["B", "G", "R"]
    # channel list: name\0, pixel type (2=FLOAT), pLinear+fill, xy sampling
    chl = b"".join(c.encode() + b"\0" + struct.pack("<iBBBBii", 2, 0, 0, 0,
                                                    0, 1, 1)
                   for c in chans) + b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    hdr = b"\x76\x2f\x31\x01" + struct.pack("<i", 2)
    hdr += _exr_attr(b"channels", b"chlist", chl)
    hdr += _exr_attr(b"compression", b"compression", b"\0")
    hdr += _exr_attr(b"dataWindow", b"box2i", box)
    hdr += _exr_attr(b"displayWindow", b"box2i", box)
    hdr += _exr_attr(b"lineOrder", b"lineOrder", b"\0")
    hdr += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    hdr += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    hdr += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    hdr += b"\0"
    nch = len(chans)
    line_bytes = w * 4 * nch
    data0 = len(hdr) + 8 * h
    with open(path, "wb") as f:
        f.write(hdr)
        for y in range(h):
            f.write(struct.pack("<Q", data0 + y * (8 + line_bytes)))
        src = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2],
               "A": img[..., 3] if img.shape[-1] > 3 else
               np.ones((h, w), np.float32)}
        for y in range(h):
            f.write(struct.pack("<ii", y, line_bytes))
            for c in chans:  # channels stored in sorted-name order
                f.write(np.ascontiguousarray(src[c][y]).tobytes())


def read_exr(path: str) -> np.ndarray:
    """Reads the uncompressed-FLOAT scanline EXR subset written above."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:4] == b"\x76\x2f\x31\x01", "not an EXR file"
    pos = 8
    chans, xmax, ymax = [], 0, 0
    while buf[pos] != 0:
        e = buf.index(b"\0", pos)
        name = buf[pos:e]
        pos = e + 1
        e = buf.index(b"\0", pos)
        typ = buf[pos:e]
        pos = e + 1
        (sz,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos:pos + sz]
        pos += sz
        if name == b"channels":
            p = 0
            while payload[p] != 0:
                ce = payload.index(b"\0", p)
                cname = payload[p:ce].decode()
                (ptype,) = struct.unpack_from("<i", payload, ce + 1)
                assert ptype == 2, "only FLOAT EXR channels supported"
                chans.append(cname)
                p = ce + 1 + 16
        elif name == b"compression":
            assert payload[0] == 0, "only uncompressed EXR supported"
        elif name == b"dataWindow":
            x0, y0, xmax, ymax = struct.unpack("<iiii", payload)
    pos += 1
    h, w = ymax + 1, xmax + 1
    pos += 8 * h  # offset table
    planes = {c: np.empty((h, w), np.float32) for c in chans}
    for _ in range(h):
        y, nb = struct.unpack_from("<ii", buf, pos)
        pos += 8
        for c in chans:
            planes[c][y] = np.frombuffer(buf, np.float32, w, pos)
            pos += w * 4
    out = [planes.get(c, np.zeros((h, w), np.float32)) for c in "RGB"]
    if "A" in planes:
        out.append(planes["A"])
    return np.stack(out, axis=-1)


def write_image(path: str, img: np.ndarray, alpha: bool = False):
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "png":
        return write_png(path, img, alpha)
    if ext == "hdr":
        return write_hdr(path, img)
    if ext == "tga":
        return write_tga(path, img, alpha)
    if ext == "exr":
        return write_exr(path, img, alpha)
    if ext == "npy":
        return np.save(path, np.asarray(img))
    try:
        from PIL import Image
        Image.fromarray(to_uint8(img[..., :3])).save(path)
    except Exception as e:
        raise ValueError(f"unsupported image format .{ext}: {e}")


def read_image(path: str) -> np.ndarray:
    """Load an image by extension -> float32 [H,W,3/4] linear-ish values
    (the reference's imageHandler load path, src/image_handlers/)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("hdr", "pic"):
        return read_hdr(path)
    if ext == "png":
        return read_png(path)
    if ext == "exr":
        return read_exr(path)
    if ext == "npy":
        return np.asarray(np.load(path), np.float32)
    try:
        from PIL import Image
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.float32) / 255.0
    except Exception as e:
        raise ValueError(f"unsupported texture image format .{ext}: {e}")
