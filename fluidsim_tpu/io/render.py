"""Volume rendering and LOD tools — the framework's ``vdb_render`` /
``vdb_lod`` (``openvdb/cmd/openvdb_render``, ``openvdb/cmd/openvdb_lod``).

``render_volume`` is an orthographic emission-absorption integrator over a
dense density grid with simple depth cueing — enough to produce the
water-cube-drop frames the reference showcases (``screenshots/grid*_*.png``)
without GL or EXR dependencies.  Output is PNG via a minimal zlib-based
encoder (no imaging libraries in this environment).

``build_lod`` produces the mean-pooled mip pyramid of ``vdb_lod``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, img: np.ndarray):
    """Write an (H, W) grayscale or (H, W, 3) RGB uint8 PNG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        color_type, nch = 0, 1
        img = img[..., None]
    else:
        color_type, nch = 2, 3
    h, w = img.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                         0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(data)


def render_volume(density: np.ndarray, axis: int = 2, absorption: float = 0.1,
                  color=(70, 130, 200), background=(255, 255, 255)):
    """Orthographic emission-absorption render of a density grid.

    Integrates transmittance along ``axis`` (front-to-back) with density-
    proportional emission; adds a cheap depth cue so nearer fluid is
    brighter.
    Returns an (H, W, 3) uint8 image.
    """
    d = np.moveaxis(np.asarray(density, np.float32), axis, 0)
    nz = d.shape[0]
    trans = 1.0
    acc = np.zeros(d.shape[1:], np.float32)
    transmittance = np.ones(d.shape[1:], np.float32)
    depth_cue = np.linspace(1.0, 0.55, nz, dtype=np.float32)
    for k in range(nz):
        a = 1.0 - np.exp(-absorption * d[k])
        acc += transmittance * a * depth_cue[k]
        transmittance *= (1.0 - a)
    col = np.asarray(color, np.float32)
    bg = np.asarray(background, np.float32)
    img = acc[..., None] * col + transmittance[..., None] * bg
    # orient: world +y up -> image row 0 at top
    return np.clip(img, 0, 255).astype(np.uint8).transpose(1, 0, 2)[::-1]


def build_lod(values: np.ndarray, levels: int | None = None):
    """Mean-pooled mip pyramid (``vdb_lod`` analogue).  Pads each level to
    even extents with zeros.  Returns [level0, level1, ...]."""
    out = [np.asarray(values, np.float32)]
    v = out[0]
    while (levels is None and min(v.shape) > 1) or \
          (levels is not None and len(out) <= levels and min(v.shape) > 1):
        pad = [(0, s % 2) for s in v.shape]
        v = np.pad(v, pad)
        v = v.reshape(v.shape[0] // 2, 2, v.shape[1] // 2, 2,
                      v.shape[2] // 2, 2).mean(axis=(1, 3, 5))
        out.append(v)
        if levels is not None and len(out) > levels:
            break
    return out
