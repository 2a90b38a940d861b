"""Image output: the headless framebuffer boundary.

Replaces the reference's GGUI presentation + ``ti.tools.image.imwrite``
screenshot path (scene.py:260-273). Buffers are (W, H, 3) with v=0 at the
bottom (GL convention, like the reference's canvas); PNG rows run top-down.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def to_uint8_rows(img_wh3: np.ndarray) -> np.ndarray:
    """(W, H, 3) float [0,1], v-up  ->  (H, W, 3) uint8 rows top-down."""
    img = np.clip(np.asarray(img_wh3, dtype=np.float32), 0.0, 1.0)
    img = (img * 255.0 + 0.5).astype(np.uint8)
    return img.transpose(1, 0, 2)[::-1]


def write_png(path: str, img_wh3: np.ndarray) -> str:
    """PNG writer — native C++ encoder when built, pure zlib fallback."""
    from voxelrt.utils.native import encode_png

    rows = to_uint8_rows(img_wh3)
    h, w, _ = rows.shape
    png = encode_png(np.ascontiguousarray(rows), w, h)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(png)
    return path


def read_png(path: str) -> np.ndarray:
    """Read an 8-bit RGB(A) PNG back to (W, H, 3) float v-up (for golden
    tests). Uses PIL when available, else a minimal decoder for our own
    writer's output."""
    try:
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    except Exception:
        arr = _read_png_minimal(path).astype(np.float32) / 255.0
    return arr[::-1].transpose(1, 0, 2)


def _read_png_minimal(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert bits == 8 and ctype == 2, "minimal reader: 8-bit RGB only"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = np.zeros((h, w, 3), np.uint8)
    prev = np.zeros(w * 3, np.int32)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        filt, body = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int32)
        if filt == 0:
            cur = body
        elif filt == 1:
            cur = body.copy()
            for i in range(3, len(cur)):
                cur[i] = (cur[i] + cur[i - 3]) & 0xFF
        elif filt == 2:
            cur = (body + prev) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        prev = cur
        out[y] = cur.reshape(w, 3).astype(np.uint8)
    return out
