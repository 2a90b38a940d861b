"""Port of example3.py: Cornell-style box with metal floor/back wall,
emissive ceiling panel and a sine ribbon."""

import numpy as np

from _common import grid2, make_scene, run

scene = make_scene(voxel_edges=0, exposure=30)
scene.set_floor(0, (1.0, 1.0, 1.0))

n = 50


def initialize_voxels():
    ij = grid2(0, n, 0, n)
    i, j = ij[:, 0], ij[:, 1]
    z = np.zeros_like(i)

    scene.set_voxel(np.stack([z, i, j], -1), 1, np.array([0.9, 0.3, 0.3]))  # left
    scene.set_voxel(np.stack([z + n, i, j], -1), 1, np.array([0.3, 0.9, 0.3]))  # right
    scene.set_voxel(np.stack([i, z + n, j], -1), 11, np.array([1, 1, 1]))  # ceiling
    scene.set_voxel(np.stack([i, z, j], -1), 50, np.array([1.0, 1.0, 1.0]))  # floor
    scene.set_voxel(np.stack([i, j, z], -1), 50, np.array([1, 1, 1]))  # back wall

    panel = grid2(-n // 8, n // 8, -n // 8, n // 8)
    scene.set_voxel(
        np.stack(
            [panel[:, 0] + n // 2, np.full(len(panel), n - 1), panel[:, 1] + n // 2],
            -1,
        ),
        2,
        np.array([1, 1, 1]),
    )

    for i_ in range(n // 8 * 3):
        i = i_ * 2
        js = np.arange(n // 4 * 3)
        ys = n // 4 + np.sin((i + js) / n * 30) * 0.05 * n + i / 10
        scene.set_voxel(
            np.stack([js + n // 8, ys, np.full_like(js, -i + n // 8 * 7)], -1),
            1,
            np.array([0.3, 0.3, 0.9]),
        )


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example3")
