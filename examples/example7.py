"""Port of example7.py: procedural night city (roads via get_voxel feedback,
buildings, parks), physical sky + clouds."""

import numpy as np

from _common import make_scene, run

day = False
manual_seed = 77

scene = make_scene(voxel_edges=0, exposure=2.5 - day)
scene.set_floor(-0.05, (1.0, 1.0, 1.0), 20)
scene.set_directional_light((-0.7, 0.25, -1), 0.025, (1.0, 0.949, 0.937))
scene.set_use_physical_sky(True)
scene.set_use_clouds(True)

lgrid, ngrid = 15, 8
rng = np.random.default_rng(manual_seed)


def rand(i, j):
    """Deterministic hash-rand (example7.py:12)."""
    v = np.sin(i * 12.9898 + j * 78.233) * 43758.5453
    return v - np.floor(v)


def is_road(i, j):
    if not (0 <= i < ngrid and 0 <= j <= ngrid):
        return False
    return scene.get_voxel((i, -8, j))[0] == 1


def initialize():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(manual_seed)
    """Road layout seeding (example7.py:18-30)."""
    for i in range(8):
        for j in range(8):
            scene.set_voxel((i, -8, j), 0, (0, 0, 0))
    start = 1 + (rng.random(2) * (ngrid - 2)).astype(int)
    end = 1 + (rng.random(2) * (ngrid - 2)).astype(int)
    turn = start + 1
    while np.any((np.abs(turn - start) == 1) | (np.abs(turn - end) == 1)):
        turn = 1 + (rng.random(2) * (ngrid - 2)).astype(int)
    for k in (0, 1):
        d = np.array([k, 1 - k])
        p = start[k] * np.array([1 - k, k]) - d
        while p[1 - k] < ngrid - 1:
            p = p + d
            scene.set_voxel((p[0], -8, p[1]), 1, (0.5, 0.5, 0.5))
            if p[1 - k] == turn[1 - k]:
                d = (1 if start[k] < end[k] else -1) * np.array([1 - k, k])
            if p[k] == end[k]:
                d = np.array([k, 1 - k])


def mix(a, b, t):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return a + (b - a) * t


def build_road(X, uv, d):
    if d.sum() <= 2:
        if ((d[0] | d[2]) ^ (d[1] | d[3])) & 1:
            uv = np.array([uv[1], uv[0]]) if (d[1] | d[3]) & 1 else uv
        else:  # curve
            while d[2] == 0 or d[3] == 0:
                d = np.roll(d, -1)
                uv = np.array([14 - uv[1], uv[0]])
            uv = np.array(
                [np.linalg.norm(uv), np.arctan2(uv[0], uv[1]) * 2 / np.pi * lgrid]
            )
    elif d.sum() >= 3:  # junction
        while d.sum() == 3 and d[1] != 0:
            d = np.roll(d, -1)
            uv = np.array([14 - uv[1], uv[0]])
        if d.sum() > 3 or uv[0] <= 7:
            uv = np.array(
                [mix(14 - uv[0], uv[0], uv[0] <= 7), mix(14 - uv[1], uv[1], uv[1] <= 7)]
            )
            uv = np.array(
                [np.linalg.norm(uv), np.arctan2(uv[0], uv[1]) * 2 / np.pi * lgrid]
            )
    ux, uy = uv[0], uv[1]
    pav = 1.0 if (ux == 7 and 4 < uy < 12) else 0.5
    scene.set_voxel((X[0], 0, X[1]), 10, (pav, pav, pav))
    if ux <= 1 or ux >= 13:
        scene.set_voxel((X[0], 1, X[1]), 11, (0.7, 0.65, 0.6))
    if uy == 7 and (ux == 1 or ux == 13):
        for i in range(2, 9):
            scene.set_voxel((X[0], i, X[1]), 50, (0.6, 0.6, 0.6))
    if uy == 7 and (1 <= ux <= 2 or 12 <= ux <= 13):
        scene.set_voxel((X[0], 8, X[1]), 50, (0.6, 0.6, 0.6))
    if uy == 7 and (ux == 2 or ux == 12):
        scene.set_voxel((X[0], 7, X[1]), 2, (1, 1, 0.6))


def build_building(X, uv, d, r):
    while d.sum() > 0 and d[2] == 0:
        d = np.roll(d, -1)
        uv = np.array([14 - uv[1], uv[0]])
    fl = int(3 + 10 * r)
    style = rand(r, 5)
    wall = np.array([rand(r, 1), rand(r, 2), rand(r, 2)]) * 0.2 + 0.4
    wall2 = mix(np.full(3, rand(r, 9) * 0.2 + 0.2), wall,
                float(style > 0.5 and rand(r, 4) < 0.4))
    ux, uy = uv[0], uv[1]
    maxdist = max(abs(ux - 7), abs(uy - 7))
    for i in range(2, fl * 4):
        lit = rand(rand(X[0], X[1]), i // 2) > 0.6
        light = mix((0.25, 0.35, 0.38), (0.7, 0.7, 0.6), float(lit))
        win = i % 4 < 2
        if maxdist < 6:
            scene.set_voxel((X[0], i, X[1]), 0 if win else 10,
                            mix(wall2, light, float(win)))
            if ((ux == 2 or ux == 12) and (uy == 2 or uy == 12)) or (
                style > 0.5 and (ux % 3 == 1 or uy % 3 == 1)
            ):
                scene.set_voxel((X[0], i, X[1]), 10, wall)
        if maxdist < 5:
            scene.set_voxel((X[0], i, X[1]), 2 if win else 10,
                            mix(wall, light, float(win)))
    if maxdist == 5:
        for i in range(fl * 4, fl * 4 + 2):
            scene.set_voxel((X[0], i, X[1]), 11, wall)
    if maxdist < 5:
        scene.set_voxel((X[0], fl * 4, X[1]), 11, np.full(3, rand(r, 7) * 0.2 + 0.4))
    for i in range(2):
        scene.set_voxel((X[0], i, X[1]), 10, (0.7, 0.65, 0.6))
    if fl > 10 and ux == 6 and uy == 6:  # antenna
        for i in range(fl + 1):
            scene.set_voxel(
                (X[0], fl * 5 - i, X[1]),
                2 if i == 0 else 50,
                mix((0.6, 0.6, 0.6), (0.8, 0, 0), float(i == 0)),
            )
    if d.sum() > 0 and uy == 2 and 4 < ux < 10:  # billboard
        ri = int(r * 3)
        for i in range(5, 7):
            c = np.array([ri == 0, ri == 1, ri == 2], float) * (
                0.2 + rng.random() * 0.3
            )
            scene.set_voxel((X[0], i, X[1]), 2, c)
        for i in range(2, 5):
            scene.set_voxel((X[0], i, X[1]), 0, (0, 0, 0))
    if d.sum() > 0 and uy == 3 and 4 < ux < 10:
        for i in range(2, 5):
            scene.set_voxel((X[0], i, X[1]), 1, (0.7, 0.7, 0.6))
    if max(abs(ux - rand(r, 8) * 7 - 4), abs(uy - rand(r, 10) * 7 - 4)) < 1.5:  # HVAC
        for i in range(fl * 4 + 1, fl * 4 + 3):
            scene.set_voxel((X[0], i, X[1]), 51, (0.6, 0.6, 0.6))


def build_park(X, uv, d, r):
    center = np.array([int(rand(r, 1) * 7 + 4), int(rand(r, 2) * 7 + 4)])
    height = 9 + int(rand(r, 3)) * 5
    for i in range(height + 3):  # tree
        if np.linalg.norm(uv - center) < 1:
            scene.set_voxel((X[0], i, X[1]), 30, (0.36, 0.18, 0.06))
        if i > min(height - 4, (height + 5) // 2) and np.linalg.norm(
            uv - center
        ) < (height + 3 - i) * (rand(r, 4) * 0.6 + 0.4):
            scene.set_voxel(
                (X[0], i, X[1]),
                80 if rng.random() < 0.8 else 0,
                (0.1, 0.3 + rng.random() * 0.2, 0.1),
            )
    h = (
        2 * np.sin((uv[0] ** 2 + uv[1] ** 2 + rand(r, 0) ** 2 * 256) / 1024 * 2 * np.pi)
        + 2
        + (rng.random() > 0.95)
    )
    for i in range(int(h)):  # grass
        scene.set_voxel((X[0], i, X[1]), 80, (0.2, 0.5 + rng.random() * 0.2, 0.05))
    if max(abs(uv[0] - rand(r, 4) * 7 - 4), abs(uv[1] - rand(r, 5) * 7 - 4)) < 0.5:
        for i in range(3):  # light
            scene.set_voxel(
                (X[0], h + i, X[1]),
                2 if i == 1 else 1,
                mix((0.2, 0.2, 0.2), (0.9, 0.8, 0.6), float(i == 1)),
            )


def draw():
    for x in range(-60, 60):
        for y in range(-60, 60):
            X = np.array([x, y])
            I = (X + 60) // lgrid
            uv = ((X + 60) % lgrid).astype(float)
            d = np.array(
                [
                    is_road(I[0], I[1] + 1),
                    is_road(I[0] + 1, I[1]),
                    is_road(I[0], I[1] - 1),
                    is_road(I[0] - 1, I[1]),
                ],
                dtype=int,
            )
            r = mix(rand(I[0], I[1]), float(np.any(d > 0)), 0.4)
            if is_road(I[0], I[1]):
                build_road(X, uv, d)
            elif r > 0.5:
                build_building(X, uv, d, 2 * r - 1)
            else:
                build_park(X, uv, d, 2 * r)


if __name__ == "__main__":
    initialize()
    draw()
    run(scene, "example7")
