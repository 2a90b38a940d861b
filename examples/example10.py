"""Port of example10.py: brick temple with pillars, physical sky + clouds."""

import numpy as np

from _common import grid3, make_scene, run

scene = make_scene(voxel_edges=0, exposure=3.3)
scene.set_floor(-0.85, (1.0, 1.0, 1.0))
scene.set_directional_light((-0.8, 1.3, -1), 0.025, (1.0, 0.949, 0.937))
scene.set_use_physical_sky(True)
scene.set_use_clouds(True)

rng = np.random.default_rng(10)

scale = 4
offset = np.array([-60, 0, -60])
brick_noise = np.full(3, 0.05)
wood_noise = np.full(3, 0.08)
stone_noise = np.full(3, 0.08)
pillar_noise = np.full(3, 0.2)
metal_noise = np.full(3, 0.01)


def _box(pos, size):
    pos = np.asarray(pos)
    size = np.asarray(size)
    return grid3(pos[0], pos[0] + size[0], pos[1], pos[1] + size[1],
                 pos[2], pos[2] + size[2])


def create_air(pos, size):
    scene.set_voxel(_box(pos, size), 0, np.zeros(3))


def create_brick(pos, size):
    idx = _box(pos, size)
    c = np.array([130.0, 87.0, 73.0]) / 255.0 - 0.15 - brick_noise * rng.random(
        (len(idx), 1)
    )
    scene.set_voxel(idx, 10, c)


def create_wood(pos, size, dark=False):
    idx = _box(pos, size)
    base = np.array([183.0, 150.0, 91.0]) * (0.5 if dark else 1.0) / 255.0
    c = base + wood_noise * rng.random((len(idx), 1))
    scene.set_voxel(idx, 31, c)


def create_stone(pos, size):
    idx = _box(pos, size)
    c = np.array([246.0, 237.0, 226.0]) / 255.0 + stone_noise * rng.random(
        (len(idx), 1)
    )
    scene.set_voxel(idx, 21, c)


def create_metal(pos, size):
    idx = _box(pos, size)
    c = np.array([0.9, 0.9, 0.9]) + metal_noise * rng.random((len(idx), 1))
    scene.set_voxel(idx, 50, c)


def create_pillar(pos, is_corner):
    pos = np.asarray(pos)
    idx = _box(pos, (scale, scale * 4, scale))
    checker = ((idx[:, 0] + idx[:, 2]) % 2 == 0).astype(float)
    c = np.array([246.0, 237.0, 226.0]) / 255.0 - pillar_noise * checker[:, None]
    scene.set_voxel(idx, 21, c)

    create_stone(pos + np.array([0, 7, -2]) * scale // 2,
                 (scale, scale // 2, scale))
    create_stone(pos + np.array([0, 6, -1]) * scale // 2,
                 (scale, scale // 2, scale // 2))
    create_stone(pos + np.array([0, 7, 2]) * scale // 2,
                 (scale, scale // 2, scale))
    create_stone(pos + np.array([0, 6, 2]) * scale // 2,
                 (scale, scale // 2, scale // 2))
    if is_corner:
        create_stone(pos + np.array([-2, 7, 0]) * scale // 2,
                     (scale, scale // 2, scale))
        create_stone(pos + np.array([-1, 6, 0]) * scale // 2,
                     (scale // 2, scale // 2, scale))
        create_stone(pos + np.array([2, 7, 0]) * scale // 2,
                     (scale, scale // 2, scale))
        create_stone(pos + np.array([2, 6, 0]) * scale // 2,
                     (scale // 2, scale // 2, scale))


def initialize_voxels():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(10)
    s = scale
    create_brick(np.array([-1, 1, -1]) * s + offset, np.array([11, 9, 27]) * s)
    create_air(np.array([0, 2, 0]) * s + offset, np.array([9, 4, 25]) * s)
    create_air(np.array([2, 6, 3]) * s + offset, np.array([5, 4, 19]) * s)

    create_stone(np.array([0, 1, 0]) * s + offset, np.array([9, 1, 25]) * s)
    create_metal(np.array([3, 1, 2]) * s + offset, np.array([3, 1, 21]) * s)

    create_brick(np.array([2, 2, 1]) * s + offset, np.array([5, 4, 1]) * s)
    create_air(np.array([3, 2, 1]) * s + offset, np.array([3, 3, 1]) * s)
    create_brick(np.array([2, 2, 23]) * s + offset, np.array([5, 4, 1]) * s)
    create_air(np.array([3, 2, 23]) * s + offset, np.array([3, 3, 1]) * s)

    create_wood(np.array([3, 2, 0]) * s + offset, np.array([3, 3, 1]) * s)
    create_wood(np.array([4, 2, 0]) * s + offset, np.array([1, 2, 1]) * s, dark=True)
    create_air(np.array([8, 4, 1]) * s // 2 + offset, np.array([2, 4, 1]) * s // 2)

    create_wood(np.array([3, 2, 24]) * s + offset, np.array([3, 3, 1]) * s)
    create_wood(np.array([4, 2, 24]) * s + offset, np.array([1, 2, 1]) * s, dark=True)
    create_air(np.array([8, 4, 48]) * s // 2 + offset, np.array([2, 4, 1]) * s // 2)

    for i in range(0, 5):
        create_pillar(np.array([1, 2, 2 + i * 5]) * s + offset, i == 0 or i == 4)
        create_pillar(np.array([7, 2, 2 + i * 5]) * s + offset, i == 0 or i == 4)


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example10")
