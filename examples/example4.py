"""Port of example4.py: solid red sphere under a pure directional light."""

import numpy as np

from _common import grid3, make_scene, run

scene = make_scene(exposure=1)
scene.set_directional_light((1, 1, 1), 0.1, (1, 1, 1))
scene.set_background_color((0.3, 0.4, 0.6))


def initialize_voxels():
    n = 60
    x = grid3(-n, n, -n, n, -n, n)
    inside = np.sum(x * x, axis=-1) < n * n * 0.5
    scene.set_voxel(x[inside], 1, np.array([0.9, 0.3, 0.3]))


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "example4")
