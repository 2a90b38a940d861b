"""Golden-image regression tests (SURVEY.md §4b).

The reference validates by eye against demo JPGs; here small fixed-seed
renders of scene slices are compared by RMSE against captured goldens in
tests/golden/. Regenerate after intentional image changes with:

    python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
RES = (96, 54)
SPP = 24


def _build_scenes():
    from voxelrt import Scene

    scenes = {}

    s = Scene(exposure=10, image_res=RES, quiet=True, seed=7)
    s.set_floor(-0.05, (1.0, 1.0, 1.0))
    s.set_background_color((1.0, 0, 0))
    s.set_voxel((0, 0, 0), 2, (0.9, 0.1, 0.1))
    scenes["main"] = s

    s = Scene(exposure=3, image_res=RES, quiet=True, seed=7)
    s.set_floor(-0.05, (0.6, 0.7, 0.9))
    s.set_directional_light((1, 1, -1), 0.1, (1.0, 0.95, 0.9))
    s.set_background_color((0.2, 0.3, 0.5))
    ii, jj = np.meshgrid(np.arange(-10, 10), np.arange(-10, 10), indexing="ij")
    idx = np.stack([ii.ravel(), np.zeros(ii.size, int), jj.ravel()], -1)
    s.set_voxel(idx, 1, np.array([0.8, 0.5, 0.3]))
    # a metal block and an emissive pillar exercise specular + emission
    for k in range(6):
        s.set_voxel((3, k + 1, 2), 51, (0.9, 0.9, 0.95))
        s.set_voxel((-4, k + 1, -3), 2 if k == 5 else 11, (1.0, 0.9, 0.6))
    scenes["lit_blocks"] = s
    return scenes


def _render(scene):
    return scene.finish(spp=SPP, save=False)


@pytest.mark.parametrize("name", ["main", "lit_blocks"])
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} missing — run tests/test_golden.py --regen")
    from voxelrt.utils.image import read_png

    golden = read_png(path)
    img = _render(_build_scenes()[name])
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    # MC noise at 24 spp dominates; identical seeds make this tight.
    assert rmse < 0.02, f"{name}: RMSE {rmse}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")  # goldens are CPU renders
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from voxelrt.utils.image import write_png

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, scene in _build_scenes().items():
            img = _render(scene)
            write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
            print("wrote", name)
