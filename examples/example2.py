"""Port of example2.py: striped light wall, hue wall, checkered ground."""

import numpy as np

from _common import grid2, make_scene, run

scene = make_scene()
scene.set_floor(0, (0.5, 0.5, 1))


def initialize_voxels():
    ij = grid2(0, 31, 0, 31)
    i, j = ij[:, 0], ij[:, 1]

    is_light = (j % 10 != 0).astype(int)
    scene.set_voxel(
        np.stack([j, i, np.full_like(i, -30)], -1), is_light + 1, np.array([1, 1, 1])
    )

    color = np.maximum(i, j)
    even = color % 2 == 0
    cols = np.stack(
        [
            (color % 3 // 2) * 0.5 + 0.5,
            ((color + 1) % 3 // 2) * 0.5 + 0.5,
            ((color + 2) % 3 // 2) * 0.5 + 0.5,
        ],
        axis=-1,
    )
    scene.set_voxel(
        np.stack([np.zeros_like(i), i, j - 30], -1)[even], 1, cols[even]
    )

    c = (i + j) % 2
    ground_cols = np.stack(
        [c * 0.3 + 0.3, (1 - c) * 0.8 + 0.2, np.ones_like(c)], axis=-1
    )
    scene.set_voxel(np.stack([i, np.zeros_like(i), j - 30], -1), 1, ground_cols)


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example2")
