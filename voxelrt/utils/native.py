"""Loader for the optional C++ runtime extension (native/voxelrt_native.cpp).

Falls back to pure-python implementations when unbuilt; `have_native()`
reports availability. Build with `make -C native`.
"""

from __future__ import annotations

import os
import sys

_native = None
_tried = False


def _load():
    global _native, _tried
    if _tried:
        return _native
    _tried = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(root, "native")
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    try:
        import voxelrt_native  # type: ignore

        _native = voxelrt_native
    except Exception:
        _native = None
    return _native


def have_native() -> bool:
    return _load() is not None


def build_occupancy(material_xyz, res: int, n_lods: int):
    """Native-or-numpy occupancy pyramid build. material_xyz: int8 [x][y][z]."""
    import numpy as np

    nat = _load()
    if nat is not None:
        words = nat.build_occupancy(
            np.ascontiguousarray(material_xyz, dtype=np.int8).tobytes(),
            res, n_lods,
        )
        return np.frombuffer(words, dtype=np.uint32).copy()
    from voxelrt.world import build_occupancy_pyramid

    return build_occupancy_pyramid(material_xyz != 0, n_lods)


def encode_png(rgb_topdown, w: int, h: int, level: int = 6) -> bytes:
    """Native-or-python PNG encode; rgb rows top-down, (h, w, 3) uint8."""
    nat = _load()
    if nat is not None:
        return nat.encode_png(rgb_topdown.tobytes(), w, h, level)
    import struct
    import zlib

    raw = b"".join(b"\x00" + rgb_topdown[y].tobytes() for y in range(h))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level)) + chunk(b"IEND", b"")
    )


def frame_writer():
    """Async frame writer (native worker thread) or None."""
    nat = _load()
    return nat.FrameWriter() if nat is not None else None
