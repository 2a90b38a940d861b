"""Port of example5.py: emissive night cloud-city with voxel clouds."""

import numpy as np

from _common import grid2, grid3, make_scene, run

scene = make_scene(voxel_edges=0, exposure=1)
scene.set_directional_light((1, 0.3, 0.3), 0.8, (1, 1, 1))
scene.set_background_color((0, 0, 0))
scene.set_floor(-64, (0.01, 0.01, 0.012))

rng = np.random.default_rng(5)


def rgb(r, g, b):
    return np.array([r, g, b]) / 255.0


def get_emmit_color(r):
    a = rgb(242, 239, 193)
    b = rgb(236, 195, 107)
    return a + (b - a) * np.asarray(r)[..., None]


def make_tiny_cloud(pos, s, r1, r2, density, gray_val):
    u = [int(r2 * x) for x in s]
    idx = grid3(-u[0], u[0], -u[1], u[1], -u[2], u[2])
    x = idx / np.asarray(s, np.float64)
    keep = (np.sum(x * x, -1) < r1 + (r2 - r1) * rng.random(len(idx))) & (
        rng.random(len(idx)) < density
    )
    scene.set_voxel(idx[keep] + np.asarray(pos), 1, np.full(3, gray_val / 255.0))


def make_cloud_city(base, n):
    ij = grid2(-n, n, -n, n)
    dis = np.power(np.maximum(0, 1 - np.linalg.norm(ij, axis=-1) / n) * 1.1, 3)
    height = rng.random(len(ij)) * n * dis
    for (i, j), d, h in zip(ij, dis, height):
        ks = np.arange(int(-h * 0.6 + base), int(h * 1.2 + base))
        if len(ks) == 0:
            continue
        emit = (ks > base) & (d * 0.1 > rng.random(len(ks)))
        cols = np.where(
            emit[:, None],
            get_emmit_color(rng.random(len(ks))),
            np.full((len(ks), 3), (1 - 0.8 * d**0.6)),
        )
        scene.set_voxel(
            np.stack([np.full_like(ks, i), ks, np.full_like(ks, j)], -1),
            np.where(emit, 2, 1),
            cols,
        )


def initialize_voxels():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(5)
    n = 60
    base = -24
    make_cloud_city(base, n)
    make_tiny_cloud((30, -30, -20), (2, 1, 2), 20, 40, 0.3, 120)
    make_tiny_cloud((20, -28, 24), (2, 1, 2), 10, 30, 0.4, 80)
    make_tiny_cloud((-30, -32, 28), (2, 1, 2), 10, 30, 0.35, 80)
    make_tiny_cloud((-40, -50, -34), (3, 2, 3), 10, 30, 0.2, 120)
    make_tiny_cloud((36, -46, -36), (2, 1, 2.4), 20, 50, 0.3, 90)


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example5")
