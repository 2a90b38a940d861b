"""Native C++ runtime extension parity tests (skipped when unbuilt)."""

import os
import tempfile

import numpy as np
import pytest

from voxelrt.utils import native
from voxelrt.world import build_occupancy_pyramid

pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="voxelrt_native not built (make -C native)"
)


def test_occupancy_matches_numpy():
    rng = np.random.default_rng(1)
    for res, lods in [(32, 5), (64, 6)]:
        mat = (rng.random((res,) * 3) < 0.07).astype(np.int8)
        assert np.array_equal(
            native.build_occupancy(mat, res, lods),
            build_occupancy_pyramid(mat != 0, lods),
        )


def test_png_roundtrip():
    from PIL import Image
    import io

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (33, 47, 3), dtype=np.uint8)
    png = native.encode_png(img, 47, 33)
    back = np.asarray(Image.open(io.BytesIO(png)))
    assert np.array_equal(back, img)


def test_frame_writer():
    fw = native.frame_writer()
    img = np.zeros((8, 8, 3), np.uint8)
    with tempfile.TemporaryDirectory() as d:
        for i in range(3):
            fw.submit(os.path.join(d, f"f{i}.png"), img.tobytes(), 8, 8)
        fw.drain()
        assert fw.written() == 3
        assert len(os.listdir(d)) == 3
