"""Port of example6.py: terraced garden with trees, fences, physical sky +
clouds — the reference's flagship/benchmark scene."""

import numpy as np

from _common import grid2, grid3, make_scene, run

scene = make_scene(voxel_edges=0, exposure=2.0)
scene.set_floor(-0.85, (1.0, 1.0, 1.0))
scene.set_directional_light((1, 1, -1), 0.025, (1.0 * 1.3, 0.949 * 1.3, 0.937 * 1.3))
scene.set_use_physical_sky(True)
scene.set_use_clouds(True)

rng = np.random.default_rng(6)


def create_block(pos, size, color, color_noise):
    idx = grid3(pos[0], pos[0] + size[0], pos[1], pos[1] + size[1],
                pos[2], pos[2] + size[2])
    cols = np.asarray(color) + np.asarray(color_noise) * rng.random((len(idx), 1))
    scene.set_voxel(idx, 11, cols)


def create_leaves(pos, radius, color):
    idx = grid3(-radius, radius, -radius, radius, -radius, radius)
    f = idx / radius
    h = 0.5 - np.maximum(f[:, 1], -0.5) * 0.5
    d = np.linalg.norm(f[:, [0, 2]], axis=-1)
    prob = np.maximum(0, 1 - d) ** 2 * h * h
    prob = prob + np.sin(f[:, 0] * 5 + pos[0]) * 0.02
    prob = prob + np.sin(f[:, 1] * 9 + pos[1]) * 0.01
    prob = prob + np.sin(f[:, 2] * 10 + pos[2]) * 0.03
    prob = np.where(prob < 0.1, 0.0, prob)
    keep = rng.random(len(idx)) < prob
    cols = np.asarray(color) + (rng.random((keep.sum(), 1)) - 0.5) * 0.2
    scene.set_voxel(idx[keep] + np.asarray(pos), 80, cols)


def create_tree(pos, height, radius, color):
    create_block(pos, (3, int(height - radius * 0.5), 3), np.full(3, 0.7),
                 np.full(3, 0.3))
    create_leaves(np.asarray(pos) + np.array([0, height, 0]), radius, color)
    ij = grid2(-radius, radius, -radius, radius)
    prob = np.maximum((radius - np.linalg.norm(ij, axis=-1)) / radius, 0) ** 2
    keep = rng.random(len(ij)) < prob * prob
    idx = np.stack([ij[:, 0], np.ones(len(ij), int), ij[:, 1]], -1)[keep]
    cols = np.asarray(color) + rng.random((keep.sum(), 1)) * np.array([0.1, 0.1, 0.1])
    scene.set_voxel(idx + np.asarray(pos), 11, cols)


def make_fence(start, direction, length):
    color = np.array([0.5, 0.3, 0.2])
    d = np.asarray(direction)
    create_block(start, d * length + np.array([3, 2, 3]), color, np.full(3, 0.1))
    fence_dist = 3
    for i in range(length // fence_dist + 1):
        create_block(
            np.asarray(start) + d * i * fence_dist + np.array([1, -3, 1]),
            (1, 5, 1), color, np.zeros(3),
        )


def initialize_voxels():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(6)
    for i in range(4):
        create_block(
            (-60, -((i + 1) ** 2) - 40, -60),
            (120, 2 * i + 1, 120),
            np.full(3, 0.5 - i * 0.1) * np.array([1.0, 0.8, 0.6]),
            np.full(3, 0.05 * (3 - i)),
        )
    create_block((-60, -40, -60), (120, 1, 120), np.array([0.3, 0.2, 0.1]),
                 np.full(3, 0.01))

    create_tree((-20, -40, 25), 65, 35, np.array([1.0, 0.3, 0.15]))
    create_tree((45, -40, -45), 15, 10, np.array([0.8, 0.4, 0.1]))
    create_tree((20, -40, 0), 45, 25, np.array([1.0, 0.4, 0.1]))
    create_tree((30, -40, -20), 25, 15, np.array([1.0, 0.4, 0.1]))
    create_tree((30, -40, 30), 45, 25, np.array([1.0, 0.4, 0.1]))

    make_fence((-58, -36, -58), (1, 0, 0), 115)
    make_fence((-59, -36, 57), (1, 0, 0), 115)
    make_fence((-59, -36, -58), (0, 0, 1), 115)
    make_fence((57, -36, -58), (0, 0, 1), 115)


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example6")
