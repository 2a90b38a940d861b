"""Host-side camera: pose controller + GL-style matrices.

Replaces the reference's ``Camera`` (scene.py:25-109) and its use of
``ti.ui.Camera`` for projection/view matrices (scene.py:186-237). The pose
controller keeps the WASDQE/mouse-orbit semantics as programmatic methods so
animated camera paths (the interactive-equivalent benchmark config) can be
scripted headlessly.
"""

from __future__ import annotations

import math

import numpy as np


def np_normalize(v):
    """renderer/math_utils.py:126-128."""
    return v / np.sqrt(np.sum(v**2))


def np_rotate_matrix(axis, theta):
    """Rotation about axis by theta (renderer/math_utils.py:131-149)."""
    axis = np_normalize(axis)
    a = math.cos(theta / 2.0)
    b, c, d = -axis * math.sin(theta / 2.0)
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    bc, ad, ac, ab, bd, cd = b * c, a * d, a * c, a * b, b * d, c * d
    return np.array(
        [
            [aa + bb - cc - dd, 2 * (bc + ad), 2 * (bd - ac), 0],
            [2 * (bc - ad), aa + cc - bb - dd, 2 * (cd + ab), 0],
            [2 * (bd + ac), 2 * (cd - ab), aa + dd - bb - cc, 0],
            [0, 0, 0, 1],
        ]
    )


def perspective_matrix(fovy, aspect, z_near, z_far):
    """GL perspective, column-vector convention (clip = P @ view)."""
    f = 1.0 / math.tan(fovy * 0.5)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (z_far + z_near) / (z_near - z_far)
    m[2, 3] = 2.0 * z_far * z_near / (z_near - z_far)
    m[3, 2] = -1.0
    return m


def look_at_matrix(eye, center, up):
    """GL lookAt, column-vector convention (view = M @ world)."""
    eye = np.asarray(eye, dtype=np.float64)
    f = np_normalize(np.asarray(center, dtype=np.float64) - eye)
    s = np_normalize(np.cross(f, np_normalize(np.asarray(up, dtype=np.float64))))
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


class Camera:
    """Pose controller mirroring scene.py:25-109.

    Default pose: position (0.4, 0.5, 2.0) looking at the origin
    (scene.py:28-29).
    """

    def __init__(self, up=(0.0, 1.0, 0.0)):
        self._camera_pos = np.array((0.4, 0.5, 2.0))
        self._lookat_pos = np.array((0.0, 0.0, 0.0))
        self._up = np_normalize(np.array(up, dtype=np.float64))

    @property
    def position(self):
        return self._camera_pos

    @property
    def look_at(self):
        return self._lookat_pos

    @property
    def target_dir(self):
        return np_normalize(self.look_at - self.position)

    def set_pose(self, position, look_at):
        self._camera_pos = np.asarray(position, dtype=np.float64).copy()
        self._lookat_pos = np.asarray(look_at, dtype=np.float64).copy()

    def _compute_left_dir(self, tgtdir):
        """scene.py:105-109."""
        cos = np.dot(self._up, tgtdir)
        if abs(cos) > 0.999:
            return np.array([-1.0, 0.0, 0.0])
        return np.cross(self._up, tgtdir)

    def translate(self, keys, delta_time):
        """WASDQE movement (scene.py:68-91). ``keys`` is an iterable of
        characters from 'wasdqe'. Returns True when the pose changed."""
        tgtdir = self.target_dir
        leftdir = self._compute_left_dir(tgtdir)
        lut = {
            "w": tgtdir,
            "a": leftdir,
            "s": -tgtdir,
            "d": -leftdir,
            "e": np.array([0.0, -1.0, 0.0]),
            "q": np.array([0.0, 1.0, 0.0]),
        }
        direction = np.zeros(3)
        pressed = False
        for key in keys:
            if key in lut:
                pressed = True
                direction = direction + lut[key]
        if not pressed:
            return False
        direction = direction * delta_time
        self._lookat_pos = self._lookat_pos + direction
        self._camera_pos = self._camera_pos + direction
        return True

    def orbit(self, dx, dy, scale=3.0):
        """Mouse-drag rotation (scene.py:42-66); dx/dy in cursor units."""
        out_dir = self._lookat_pos - self._camera_pos
        leftdir = self._compute_left_dir(np_normalize(out_dir))
        rotx = np_rotate_matrix(self._up, dx * scale)
        roty = np_rotate_matrix(leftdir, dy * scale)
        out_dir_homo = np.array(list(out_dir) + [0.0])
        new_out_dir = np.matmul(np.matmul(roty, rotx), out_dir_homo)[:3]
        self._lookat_pos = self._camera_pos + new_out_dir
        return True

    def matrices(self, fov, aspect, z_near=0.01, z_far=10.0):
        """Projection + view matrices for the current pose (scene.py:232-237)."""
        proj = perspective_matrix(fov, aspect, z_near, z_far)
        view = look_at_matrix(self._camera_pos, self._lookat_pos, self._up)
        return proj, view
