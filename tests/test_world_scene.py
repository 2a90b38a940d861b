"""Scene API semantics (SURVEY.md §2.1) and world storage tests."""

import numpy as np
import pytest

from voxelrt.world import VoxelWorld, build_occupancy_pyramid, lod_bases
from voxelrt.materials import MaterialList


def make_world():
    return VoxelWorld(1.0 / 64.0, 128, 0.06)


def test_set_get_roundtrip():
    w = make_world()
    idx = np.array([[0, 0, 0], [-64, -64, -64], [63, 63, 63], [10, -5, 3]])
    w.set_voxels(idx, np.array([1, 2, 50, 81]), np.array([0.5, 0.25, 0.75]))
    mats, cols = w.get_voxels(idx)
    assert list(mats) == [1, 2, 50, 81]
    assert np.abs(cols - np.array([0.5, 0.25, 0.75])).max() < 1 / 255.0


def test_out_of_bounds_ignored():
    w = make_world()
    w.set_voxels(np.array([[64, 0, 0], [-65, 0, 0], [0, 200, 0]]), 1, (1, 1, 1))
    assert (w.material == 0).all()
    mats, cols = w.get_voxels(np.array([[64, 0, 0]]))
    assert mats[0] == 0 and (cols[0] == 0).all()


def test_round_half_away_from_zero():
    w = make_world()
    w.set_voxels(np.array([[1.5, -1.5, 0.4]]), 2, (1, 1, 1))
    mats, _ = w.get_voxels(np.array([[2, -2, 0]]))
    assert mats[0] == 2


def test_last_write_wins():
    w = make_world()
    idx = np.array([[3, 3, 3], [3, 3, 3]])
    w.set_voxels(idx, np.array([1, 2]), np.array([[1, 0, 0], [0, 1, 0]]))
    mats, cols = w.get_voxels(np.array([[3, 3, 3]]))
    assert mats[0] == 2
    assert cols[0][1] > 0.9 and cols[0][0] < 0.1


def test_bbox():
    w = make_world()
    w.set_voxels(np.array([[0, 0, 0], [10, 5, -3]]), 1, (1, 1, 1))
    lo, hi = w.recompute_bbox()
    assert np.allclose(lo, (np.array([0, 0, -3]) - 1) / 64.0)
    assert np.allclose(hi, (np.array([10, 5, 0]) + 2) / 64.0)


def test_occupancy_pyramid_sizes():
    occ = np.zeros((16, 16, 16), bool)
    occ[3, 4, 5] = True
    words = build_occupancy_pyramid(occ, 4)
    total_bits = sum((16 >> i) ** 3 for i in range(4))
    assert len(words) == (total_bits + 31) // 32
    bases = lod_bases(16, 4)
    # exactly one bit per lod level must be set
    assert np.unpackbits(words.view(np.uint8)).sum() == 4


def test_material_csv_loader(tmp_path):
    csv_text = (
        "ID, r, g, b, subsurface, metallic, specular, specular_tint, roughness,"
        " anisotropic, sheen, sheen_tint, clearcoat, clearcoat_gloss, ior_minus_one\n"
        "99,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,0.1,0.2,0.3,0.4,0.5\n"
    )
    ml = MaterialList.from_csv(csv_text)
    row = ml.params_np[99]
    assert np.allclose(row[:3], [0.1, 0.2, 0.3])
    assert row[7] == pytest.approx(0.8)  # roughness column
    # untouched slots keep the defaults (materials.py:49-63)
    assert ml.params_np[1][7] == pytest.approx(0.9)
    assert ml.params_np[1][5] == pytest.approx(0.04)


def test_default_palette_values():
    ml = MaterialList()
    # mirror (id 52): metallic 1, roughness 1
    assert ml.params_np[52][4] == 1.0 and ml.params_np[52][7] == 1.0
    # brushed metal (53): anisotropic 0.8
    assert ml.params_np[53][8] == pytest.approx(0.8)
    # cloth (82): sheen 0.9
    assert ml.params_np[82][9] == pytest.approx(0.9)
