"""Pallas traversal kernel vs the portable reference DDA (interpret mode on
CPU; the same test runs compiled on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelrt.ops.accel import build_pallas_tables
from voxelrt.ops.dda import OccupancyPyramid, raytrace
from voxelrt.ops.dda_pallas import raytrace_pallas
from voxelrt.world import VoxelWorld, build_occupancy_pyramid


def make_setup(res=32, fill=0.03, seed=0):
    rng = np.random.default_rng(seed)
    world = VoxelWorld(1.0 / res, res, 0.0)
    mat = (rng.random((res,) * 3) < fill).astype(np.int8)
    world.material = mat
    world.color = rng.integers(0, 255, (res, res, res, 3), dtype=np.uint8)
    arrays = world.device_arrays()
    tables = build_pallas_tables(mat, np.asarray(arrays["voxels"]), res)
    pyr = OccupancyPyramid(arrays["occ_words"], res, int(np.log2(res)))
    return world, tables, pyr, arrays


@pytest.mark.parametrize("seed,fill", [(0, 0.03), (1, 0.15)])
def test_pallas_matches_reference_dda(seed, fill):
    res = 32
    world, tables, pyr, arrays = make_setup(res, fill, seed)
    rng = np.random.default_rng(seed + 10)
    n = 1024
    o = np.where(
        rng.random((n, 1)) < 0.5,
        rng.uniform(-res, 2 * res, (n, 3)),
        rng.uniform(0, res, (n, 3)),
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    ref = raytrace(pyr, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf)
    got = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                          np.inf, res, interpret=True)

    rd = np.asarray(ref.distance)
    gd = np.asarray(got.distance)
    ri = np.asarray(ref.ipos)
    gi = np.asarray(got.ipos)
    rn = np.asarray(ref.normal)
    gn = np.asarray(got.normal)

    hit_ref = np.isfinite(rd)
    hit_got = np.isfinite(gd)
    mismatch = 0
    for i in range(n):
        if hit_ref[i] != hit_got[i]:
            mismatch += 1
        elif hit_ref[i]:
            same_cell = np.array_equal(ri[i], gi[i])
            if not same_cell and abs(rd[i] - gd[i]) > 1e-2:
                mismatch += 1
            elif same_cell and abs(rd[i] - gd[i]) > 1e-2:
                mismatch += 1
            elif same_cell and not np.array_equal(rn[i], gn[i]):
                mismatch += 1  # normals must agree on agreed hits
    assert mismatch <= n * 0.01, f"{mismatch}/{n}"

    # color word must match the voxel grid at the hit cell
    voxels = np.asarray(arrays["voxels"])
    gc = np.asarray(got.color_word)
    checked = 0
    for i in range(n):
        if hit_got[i] and hit_ref[i] and np.array_equal(ri[i], gi[i]):
            x, y, z = gi[i]
            want = voxels[(z * res + y) * res + x]
            assert gc[i] == want, (i, gc[i], want)
            checked += 1
    assert checked > 10


def test_pallas_empty_and_full():
    res = 32
    world, tables, pyr, _ = make_setup(res, 0.0, 3)
    o = jnp.asarray([[-5.0, 8.0, 8.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    r = raytrace_pallas(tables, o, d, 1e-6, np.inf, res, interpret=True)
    assert np.isinf(np.asarray(r.distance)[0])

    world.material[:] = 1
    arrays = world.device_arrays()
    tables = build_pallas_tables(world.material, np.asarray(arrays["voxels"]),
                                 res)
    r = raytrace_pallas(tables, o, d, 1e-6, np.inf, res, interpret=True)
    assert abs(float(r.distance[0]) - 5.0) < 1e-3
    assert np.array_equal(np.asarray(r.ipos)[0], [0, 8, 8])
    assert np.allclose(np.asarray(r.normal)[0], [-1, 0, 0])
