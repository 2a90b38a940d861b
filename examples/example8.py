"""Port of example8.py: night ocean with breaking waves, foam and a moon."""

import numpy as np

from _common import grid3, make_scene, run

night_mode = True
exposure = 1.0 + night_mode * 4.0
foam_material = int(1 + night_mode * 1)
foam_color = np.array([0.7, 0.8, 1.0])

scene = make_scene(voxel_edges=0, exposure=exposure)
scene.set_floor(-20, (0.6, 0.8, 1.0))
scene.set_directional_light((1, 1, 0), 0.2, np.array([1.0, 1.0, 1.0]) / exposure)
scene.set_background_color(np.array([0.6, 0.8, 1.0]) / exposure)

rng = np.random.default_rng(8)


def create_ocean_base(pos, size, color):
    pos = np.asarray(pos)
    for i in range(size[0]):
        for k in range(size[2]):
            t = (np.sin(i / 23.0 * 3.14) * np.sin(k / 27.0 * 3.14) + 1) / 2.0
            r = rng.random()
            h = (t - 0.1 * r) * size[1] + (1 - t + 0.1 * r) * size[1] / 2
            js = np.arange(int(h))
            if len(js):
                cols = (0.3 + 0.7 * js / h)[:, None] * np.asarray(color)
                scene.set_voxel(
                    pos + np.stack([np.full_like(js, i), js, np.full_like(js, k)], -1),
                    1, cols,
                )
            if r < 0.02:
                scene.set_voxel(pos + np.array([i, int(h) - 1, k]),
                                foam_material, foam_color)


def create_wave(pos, radius, color, portion, flipped):
    idx = grid3(-radius, radius, -radius, radius, -radius, radius)
    uv = idx[:, 0:2] / radius
    theta = np.arctan2(uv[:, 1], uv[:, 0]) / 3.14 * 2
    offset = idx.copy()
    offset[:, 0] *= 1 - flipped * 2
    norm = np.linalg.norm(uv, axis=-1)
    r1 = rng.random(len(idx))
    r2 = rng.random(len(idx))

    crest = (theta >= 0) & (theta < portion) & (np.abs(norm - 0.95) < 0.05 + 0.05 * r1)
    # portion == 0 makes crest empty; avoid the div-by-zero NaN/inf mask
    ratio = theta / portion if portion != 0 else np.full_like(theta, -np.inf)
    foam = crest & (1 - r2**2 < ratio - 0.1)
    body = (theta <= 0) & (theta >= -1) & (norm > 0.9 - 0.05 * r1)

    p = np.asarray(pos)
    scene.set_voxel(p + offset[foam], foam_material, foam_color)
    scene.set_voxel(p + offset[crest & ~foam], 1, np.asarray(color))
    scene.set_voxel(p + offset[body], 1, np.asarray(color))


def create_moon(pos, radius, color):
    idx = grid3(-radius, radius, -radius, radius, -radius, radius)
    keep = np.linalg.norm(idx, axis=-1) < radius
    scene.set_voxel(np.asarray(pos) + idx[keep], 2, np.asarray(color))


def initialize_voxels():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(8)
    create_ocean_base((-60, -40, -60), (120, 20, 120), np.array([0.2, 0.4, 1.0]))
    create_wave((-20, 0, -20), 40, (0.2, 0.4, 1.0), 1, True)
    create_wave((29, -5, 29), 30, (0.2, 0.4, 1.0), 0.5, False)
    create_wave((-20, -15, 15), 20, (0.2, 0.4, 1.0), 0.7, True)
    create_wave((-57, -15, 15), 20, (0.2, 0.4, 1.0), 0.0, False)
    create_wave((20, -15, -39), 20, (0.2, 0.4, 1.0), 0.56, False)
    create_wave((57, -15, -39), 20, (0.2, 0.4, 1.0), 0.0, True)
    if night_mode:
        create_moon((40, 40, -40), 10, (1.0, 1.0, 0.1))


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example8")
