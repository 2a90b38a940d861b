"""Port of the reference's main.py: one emissive voxel, floor, red sky."""

import numpy as np

from _common import make_scene, run

scene = make_scene(exposure=10)
scene.set_floor(-0.05, (1.0, 1.0, 1.0))
scene.set_background_color((1.0, 0, 0))


def initialize_voxels():
    scene.set_voxel(np.array([0, 0, 0]), 2, np.array([0.9, 0.1, 0.1]))


if __name__ == "__main__":
    initialize_voxels()
    run(scene, "main")
