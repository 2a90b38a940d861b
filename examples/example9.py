"""Port of example9.py: furnished indoor room exercising get_voxel-based
repainting (fill paint mode, brighten)."""

import numpy as np

from _common import grid3, make_scene, run

scene = make_scene(voxel_edges=0, exposure=2.75)
scene.set_background_color((0.3, 0.3, 0.3))
scene.set_floor(-1e5, (0, 0, 0))
scene.set_directional_light((0, 0.55, -1), 0.03, (0.9, 0.8, 0.7))

rng = np.random.default_rng(9)
PI = np.pi


def rd(n=None):
    return rng.random() if n is None else rng.random(n)


def set_(idx, mat, color=(0, 0, 0), noise=(0, 0, 0)):
    idx = np.atleast_2d(np.asarray(idx))
    col = np.asarray(color, float) + rd((len(idx), 1)) * np.asarray(noise, float)
    scene.set_voxel(idx, mat, col)


def fill(p0, s, mat, color=(0, 0, 0), noise=(0, 0, 0), paint=False):
    p0 = np.asarray(p0)
    s = np.broadcast_to(np.asarray(s), (3,))
    idx = grid3(p0[0], p0[0] + s[0], p0[1], p0[1] + s[1], p0[2], p0[2] + s[2])
    if paint:
        mats, _ = scene.get_voxel(idx.astype(float))
        idx = idx[mats != 0]
        if len(idx) == 0:
            return
    set_(idx, mat, color, noise)


def brighten(p0, s, scale):
    p0 = np.asarray(p0)
    s = np.asarray(s)
    idx = grid3(p0[0], p0[0] + s[0], p0[1], p0[1] + s[1], p0[2], p0[2] + s[2])
    mats, colors = scene.get_voxel(idx.astype(float))
    scene.set_voxel(idx, mats, scale * colors)


def c1():
    v = rd()
    if v < 0.7:
        return np.ones(3)
    if v < 0.8:
        return np.array([0.5, 1, 1])
    if v < 0.9:
        return np.array([1, 0.5, 1])
    return np.array([1, 1, 0.5])


def c2():
    a = rd()
    if a < 0.4:
        return np.array([1, rd(), 0])
    if a < 0.7:
        return np.array([rd(), 1, 0])
    return np.array([0, rd(), 1])


def stuff(p0, s, r):
    p0 = np.asarray(p0)
    for x in range(s[0]):
        fill(
            p0 + np.array([x, 0, 0]),
            (1, int(round(s[1] - r * rd())), s[2] - int(round(rd()))),
            1, c2(),
        )


def initialize():
    # Re-seed on every (re)build: repeat builds in one process must
    # generate the SAME scene (bench/test harnesses rebuild modules).
    global rng
    rng = np.random.default_rng(9)
    wood = np.array([0.6, 0.5, 0.3])
    fill((-64, -20, -60), (128, 74, 120), 1, np.full(3, 0.6))  # Wall
    fill((-64, -19, -60), (128, 1, 120), 1, (0.2, 0.1, 0.0))
    fill((-63, -19, -59), (126, 72, 119), 0)
    fill((0, 52, -60), (64, 1, 120), 2, (1.0, 0.85, 0.7))
    for x in range(-64, 64):
        for y in range(-18, 54):
            wallpaper = (
                x % 9 == 1 or x % 9 == 7 or (abs(x % 9 - 4) + abs(y % 7 - 3)) == 1
            )
            set_((x, y, -60), 1,
                 (0.5, 0.55, 0.6) if wallpaper else (0.6, 0.6, 0.6))
    for x in range(-64, 64):  # Floor
        zs = np.arange(-60, 60)
        base = np.array([1.0, 0.7, 0.35]) * (0.7 if x % 4 == 0 else 1)
        set_(np.stack([np.full_like(zs, x), np.full_like(zs, -20), zs], -1), 1,
             base, (0.1, 0.1, 0.1))
    fill((-32, -3, -64), (64, 40, 6), 1, (1, 1, 1))  # Window
    fill((-31, -2, -63), (62, 38, 5), 0)
    fill((1, -1, -64), (21, 27, 1), 0)
    fill((1, 28, -64), (21, 7, 1), 0)
    fill((24, -1, -64), (6, 36, 1), 0)
    for x in range(-32, 0):
        for y in range(-4, 37):
            c = (
                c1()
                if (x % 6 == 2 and y % 5 == 4) or (x % 6 == 3 and y % 5 == 3)
                else np.array([0.9, 0.6, 0.7])
            )
            set_((x, y, -56 + round(np.sin(x / 3 * PI))), 1, 0.65 * c,
                 (0.03, 0.03, 0.03))
    brighten((-22, -1, -58), (21, 27, 5), 1.8)
    brighten((-22, 28, -58), (21, 7, 5), 1.8)
    brighten((-31, -1, -58), (6, 36, 5), 1.8)
    # Carpet
    for x in range(-30, 0):
        for z in range(-22, 38):
            white = 24 < max(abs(z - 8), -x) < 27
            set_((x, -19, z), 1, (1, 1, 1) if white else (0.9, 0.6, 0.7))
    for a in range(1024):
        v = a / 1024 * PI
        x = round((10 * abs(np.sin(12 * v)) + 10) * np.cos(10 * v))
        z = 8 + (10 * abs(np.sin(12 * v)) + 10) * np.sin(10 * v)
        set_((x, -19, z), 1 if x < 0 else 0, (1, 1, 1))
    fill((-8, -19, -50), (8, 15, 8), 1, (1, 1, 1))  # Box 1
    fill((-7, -19, -50), (6, 1, 8), 0)
    fill((-7, -9, -49), (6, 4, 7), 0)
    stuff((-6, -9, -49), (4, 3, 5), 2)
    fill((-7, -14, -49), (6, 4, 7), 0)
    stuff((-6, -14, -49), (4, 3, 5), 2)
    fill((-7, -17, -43), (6, 2, 2), 0)
    fill((-33, -8, -50), (24, 1, 14), 1, wood, (0.1, 0.1, 0.1))  # Desk
    fill((-32, -19, -49), (22, 12, 12), 1, wood, (0.1, 0.1, 0.1))
    fill((-31, -19, -49), (20, 9, 12), 0)
    stuff((-30, -7, -48), (7, 6, 6), 4)
    fill((-27, -19, -30), (8, 14, 1), 1, wood, (0.1, 0.1, 0.1))  # Chair
    fill((-27, -19, -37), (8, 6, 8), 1, wood, (0.1, 0.1, 0.1))
    fill((-27, -19, -36), (8, 5, 6), 0)
    fill((-26, -19, -37), (6, 5, 8), 0)
    fill((-27, -13, -37), (8, 1, 7), 1, (0.5, 0.2, 0.3), (0.1, 0.1, 0.1))
    fill((-15, -7, -45), (3, 1, 3), 1, (0.2, 0.1, 0.1), (0.1, 0.1, 0.1))  # Lamp
    fill((-14, -7, -44), (1, 6, 1), 1, (0.2, 0.1, 0.1), (0.1, 0.1, 0.1))
    lamp = grid3(-4, 5, 0, 5, -4, 5)
    keep = np.linalg.norm(lamp, axis=-1) < 4
    set_(np.array([-14, -2, -44]) + lamp[keep], 1,
         1.5 * np.array([0.9, 0.6, 0.7]), (0.1, 0.1, 0.1))
    for x in range(-62, -35):  # Bed
        h = 11 + round(1.7 * np.cos((x + 49) * 0.3))
        fill((x, -19, -57), (1, h + 5, 1), 1, wood, (0.1, 0.1, 0.1))
        fill((x, -19, 20), (1, h, 1), 1, wood, (0.1, 0.1, 0.1))
    fill((-62, -15, -56), (26, 1, 76), 1, wood, (0.1, 0.1, 0.1))
    fill((-61, -14, -56), (24, 3, 76), 1, (1, 1, 1), (0.1, 0.1, 0.1))
    fill((-56, -11, -54), (14, 2, 9), 1, (1, 1, 1), (0.1, 0.1, 0.1))
    fill((-55, -9, -54), (12, 1, 9), 1, (1, 1, 1), (0.1, 0.1, 0.1))
    fill((-62, -14, -36), (26, 3, 52), 1, (0.9, 0.6, 0.7), (0.1, 0.1, 0.1))
    fill((-61, -11, -36), (24, 1, 52), 1, (0.9, 0.6, 0.7), (0.1, 0.1, 0.1))
    for a in range(1024):
        v = a / 1024 * 2 * PI
        x = 9 * np.cos(3 * v) - 49
        z = 15 * np.sin(5 * v) - 10
        set_((x, -11, z), 1, (1, 1, 1), (0.1, 0.1, 0.1))
    fill((-6, -4, -48), (4, 4, 4), 1, (0.5, 0.4, 0.3))  # Plant
    fill((-5, 0, -47), (2, 3, 2), 1, (0.3, 0.6, 0.5))
    pts = grid3(0, 6, 0, 4, 0, 6)
    mats = np.where(rd(len(pts)) < 0.2, 1, 0)
    set_(np.array([-7, 3, -49]) + pts, mats, (0.3, 0.6, 0.5))
    fill((-43, 3, -59), (11, 9, 1), 1, (0.2, 0.1, 0.1))  # White Board
    fill((-42, 4, -59), (9, 7, 1), 1, (0.5, 0.5, 0.5), (0.4, 0.4, 0.4))
    fill((-61, 3, -59), (17, 8, 9), 1, (1, 1, 1))  # Box 2
    fill((-60, 4, -58), (7, 6, 8), 0)
    stuff((-59, 4, -58), (5, 5, 6), 3)
    fill((-52, 4, -58), (7, 6, 8), 0)
    stuff((-51, 4, -58), (5, 5, 6), 3)
    fill((-53, 17, -59), (10, 1, 9), 1, (1, 1, 1))  # Shelf
    stuff((-51, 18, -59), (6, 5, 7), 3)
    fill((-60, 26, -59), (25, 16, 11), 1, (0.8, 0.8, 0.8), (0.2, 0.2, 0.2))  # Box 3
    fill((-60, 27, -59), (25, 1, 11), 1, (0.6, 0.6, 0.6), (0.1, 0.1, 0.1))
    fill((-48, 28, -59), (1, 14, 11), 1, (0.6, 0.6, 0.6), (0.1, 0.1, 0.1))


if __name__ == "__main__":
    initialize()
    run(scene, "example9")
