"""Port of example1.py: bordered grid platform with random emissive pillars."""

import numpy as np

from _common import grid2, make_scene, run

scene = make_scene(exposure=10)
scene.set_floor(-0.05, (1.0, 1.0, 1.0))

rng = np.random.default_rng(1)


def initialize_voxels():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(1)
    n = 50
    ij = grid2(0, n, 0, n)
    border = (np.minimum(ij[:, 0], ij[:, 1]) == 0) | (
        np.maximum(ij[:, 0], ij[:, 1]) == n - 1
    )
    idx = np.stack([ij[:, 0], np.zeros(len(ij), int), ij[:, 1]], axis=-1)
    scene.set_voxel(idx, np.where(border, 2, 1), np.array([0.9, 0.1, 0.1]))

    pillar = (rng.random(len(ij)) < 0.04) & ~border
    for i, j in ij[pillar]:
        height = int(rng.random() * 20)
        if height > 1:
            ks = np.arange(1, height)
            scene.set_voxel(
                np.stack([np.full_like(ks, i), ks, np.full_like(ks, j)], -1),
                1,
                np.array([0.0, 0.5, 0.9]),
            )
        if height:
            scene.set_voxel(np.array([i, height, j]), 2, np.array([1, 1, 1]))


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example1")
