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


def test_palette_mode_colors_match_direct():
    """≤1024 distinct voxel words switch the color table to packed 10-bit
    palette indices (accel.py palette mode) — hit colors must be bitwise
    identical to direct mode, which a few-color scene verifies end to end."""
    res = 32
    rng = np.random.default_rng(7)
    world = VoxelWorld(1.0 / res, res, 0.0)
    world.material = (rng.random((res,) * 3) < 0.1).astype(np.int8)
    # 8 distinct colors → palette mode
    world.color = (rng.integers(0, 8, (res, res, res, 1), dtype=np.uint8)
                   * 31).repeat(3, axis=-1)
    arrays = world.device_arrays()
    tables = build_pallas_tables(world.material, np.asarray(arrays["voxels"]),
                                 res)
    assert tables.palette_words.size == 1024  # palette mode engaged
    direct = tables._replace(
        palette_words=jnp.zeros((0,), jnp.uint32),
        cell_colors=jnp.asarray(_direct_color_table(world, res)),
    )
    n = 2048
    o = rng.uniform(0, res, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                        res, interpret=True)
    b = raytrace_pallas(direct, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                        res, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.distance), np.asarray(b.distance))
    np.testing.assert_array_equal(np.asarray(a.color_word),
                                  np.asarray(b.color_word))
    assert np.isfinite(np.asarray(a.distance)).sum() > 100


def _direct_color_table(world, res):
    """Rebuild the uncompressed (64 words/cell) color table for comparison."""
    from voxelrt.ops.accel import _pad_to, _pack_bits, morton3_np
    arrays = world.device_arrays()
    colors_zyx = np.asarray(arrays["voxels"])
    r2 = res // 4
    occ = (world.material != 0).transpose(2, 1, 0)
    cells = (occ.reshape(r2, 4, r2, 4, r2, 4).transpose(0, 2, 4, 1, 3, 5)
             .reshape(r2 * r2 * r2, 64))
    colors = (colors_zyx.reshape(r2, 4, r2, 4, r2, 4)
              .transpose(0, 2, 4, 1, 3, 5).reshape(r2 * r2 * r2, 64))
    occupied = cells.any(axis=1)
    cz_, cy_, cx_ = np.indices((r2, r2, r2), dtype=np.uint32)
    code = morton3_np(cx_, cy_, cz_).reshape(-1)
    occ_m = np.zeros_like(occupied)
    occ_m[code] = occupied
    colors_m = np.zeros_like(colors)
    colors_m[code] = colors
    return _pad_to(colors_m[occ_m].reshape(-1), 1024)


def test_queued_wavefront_matches_plain():
    """queue_depth > 1 (v6 queued wavefront: per-slot ray queues with
    in-place refill) must produce bitwise-identical results to the plain
    kernel — same init, same march math, only the scheduling differs."""
    res = 32
    world, tables, pyr, arrays = make_setup(res, 0.10, 11)
    rng = np.random.default_rng(33)
    n = 4096
    o = np.where(
        rng.random((n, 1)) < 0.3,
        rng.uniform(-res, 2 * res, (n, 3)),
        rng.uniform(0, res, (n, 3)),
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # mix in dead lanes (tmax = 0 pattern comes from the caller's mask)
    a = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                        res, interpret=True)
    for c, r, un, fc in ((4, 2, 1, 2), (2, 3, 1, 2), (4, 2, 2, 1),
                         (2, 3, 3, 2)):
        b = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                            np.inf, res, interpret=True, queue_depth=c,
                            refill_every=r, march_unroll=un,
                            fetch_cadence=fc)
        for f in ("distance", "ipos", "normal", "color_word", "iters",
                  "active"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f"{f} C={c} R={r} U={un}")
    # march_unroll alone (unqueued) must also be bitwise-identical
    b = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                        np.inf, res, interpret=True, march_unroll=2,
                        fetch_cadence=1)
    for f in ("distance", "ipos", "normal", "color_word", "iters", "active"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f"{f} unqueued U=2")
    # any-hit (shadow) mode too
    sa = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                         res, interpret=True, any_hit=True,
                         fetch_colors=False)
    sb = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                         res, interpret=True, any_hit=True,
                         fetch_colors=False, queue_depth=4, refill_every=2,
                         march_unroll=2, fetch_cadence=1)
    np.testing.assert_array_equal(np.asarray(sa.distance),
                                  np.asarray(sb.distance))


def test_in_kernel_nee_matches_two_dispatch():
    """nee= (in-kernel NEE: a retired primary converts in place into its
    sun-cone shadow ray) must reproduce the two-dispatch formulation exactly:
    identical primary outputs, and the same visibility verdict as a separate
    any-hit sun_open dispatch from the offset hit points."""
    import math

    from voxelrt.ops.accel import add_sun_open_table
    from voxelrt.ops.sampling import (make_orthonormal_basis,
                                      sample_cone_oriented)

    res = 32
    world, tables, pyr, arrays = make_setup(res, 0.10, 11)
    L = np.array([1.0, 1.0, -1.0])
    L /= np.linalg.norm(L)
    cone_cos = math.cos(0.025 * 0.5)
    tables = add_sun_open_table(tables, world.material, L, cone_cos)
    rng = np.random.default_rng(77)
    n = 4096
    o = rng.uniform(0, res, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    u = rng.random((n, 2)).astype(np.float32)
    EPS = 1e-4
    eps_grid = EPS * 16.0
    alt = np.full(n, np.inf, np.float32)  # no floor plane in this test

    Lj = jnp.asarray(L, jnp.float32)
    X, Y = make_orthonormal_basis(Lj)
    nee = dict(u=jnp.asarray(u), alt_t=jnp.asarray(alt), light_dir=Lj,
               tangent=X, bitangent=Y, cone_cos=cone_cos,
               eps_grid=eps_grid, shadow_tmin=EPS)
    a = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                        res, interpret=True, queue_depth=4, refill_every=2,
                        march_unroll=2, fetch_cadence=1, nee=nee)
    b = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf,
                        res, interpret=True)
    for f in ("distance", "ipos", "normal", "color_word", "iters"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f"primary {f}")

    bd = np.asarray(b.distance)
    hit = np.isfinite(bd)
    nrm = np.asarray(b.normal)
    spos = o + bd[:, None] * d + nrm * eps_grid
    ld = np.asarray(sample_cone_oriented(
        cone_cos, jnp.broadcast_to(Lj, (n, 3)), jnp.asarray(u)))
    ndl = (ld * nrm).sum(1)
    mask = hit & (ndl > 0)
    sh = raytrace_pallas(
        tables,
        jnp.asarray(np.where(hit[:, None], spos, 0).astype(np.float32)),
        jnp.asarray(ld), EPS,
        jnp.asarray(np.where(mask, np.inf, 0.0).astype(np.float32)),
        res, interpret=True, any_hit=True, fetch_colors=False,
        use_sun_open=True)
    vis_ref = mask & ~np.isfinite(np.asarray(sh.distance))
    vis_got = np.asarray(a.nee_visible) != 0
    assert mask.sum() > 500
    np.testing.assert_array_equal(vis_got[mask], vis_ref[mask])


def test_queued_alive_skip_matches_plain():
    """alive= (per-slot dead-entry skip): queued traces must equal the
    plain kernel on every ALIVE lane and return the canonical miss
    (inf/-1/0) on skipped lanes — in closest-hit, any-hit and in-kernel-NEE
    modes. This is the wavefront contract render/pathtracer.py relies on
    (dead paths at later bounce depths drain for free)."""
    import math

    from voxelrt.ops.accel import add_sun_open_table
    from voxelrt.ops.sampling import make_orthonormal_basis

    res = 32
    world, tables, pyr, arrays = make_setup(res, 0.10, 11)
    L = np.array([1.0, 1.0, -1.0])
    L /= np.linalg.norm(L)
    cone_cos = math.cos(0.025 * 0.5)
    tables = add_sun_open_table(tables, world.material, L, cone_cos)
    rng = np.random.default_rng(5)
    n = 4096
    o = rng.uniform(0, res, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    alive = rng.random(n) < 0.4  # most lanes dead, scattered
    tmax = np.where(alive, np.inf, 0.0).astype(np.float32)

    ref = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                          jnp.asarray(tmax), res, interpret=True)
    got = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                          jnp.asarray(tmax), res, interpret=True,
                          queue_depth=4, refill_every=2, march_unroll=2,
                          fetch_cadence=1, alive=jnp.asarray(alive))
    for f in ("distance", "ipos", "normal", "color_word", "iters"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f))[alive],
            np.asarray(getattr(got, f))[alive], err_msg=f"alive {f}")
    dead = ~alive
    assert np.all(np.isinf(np.asarray(got.distance)[dead]))
    assert np.all(np.asarray(got.ipos)[dead] == -1)
    assert np.all(np.asarray(got.normal)[dead] == 0)
    assert np.all(np.asarray(got.iters)[dead] == 0)
    assert np.all(np.asarray(got.color_word)[dead] == 0)
    assert np.all(np.asarray(got.active)[dead] == 0)

    # any-hit (shadow) mode
    sa = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                         jnp.asarray(tmax), res, interpret=True,
                         any_hit=True, fetch_colors=False)
    sb = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                         jnp.asarray(tmax), res, interpret=True,
                         any_hit=True, fetch_colors=False, queue_depth=4,
                         refill_every=2, march_unroll=2, fetch_cadence=1,
                         alive=jnp.asarray(alive))
    np.testing.assert_array_equal(np.asarray(sa.distance)[alive],
                                  np.asarray(sb.distance)[alive])
    assert np.all(np.isinf(np.asarray(sb.distance)[~alive]))

    # in-kernel NEE: alive lanes' primary outputs + visibility must match
    # the no-mask nee trace; dead lanes report nee done + invisible.
    u = rng.random((n, 2)).astype(np.float32)
    alt = np.full(n, np.inf, np.float32)
    Lj = jnp.asarray(L, jnp.float32)
    X, Y = make_orthonormal_basis(Lj)
    nee = dict(u=jnp.asarray(u), alt_t=jnp.asarray(alt), light_dir=Lj,
               tangent=X, bitangent=Y, cone_cos=cone_cos,
               eps_grid=1e-4 * 16.0, shadow_tmin=1e-4)
    na = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                         jnp.asarray(tmax), res, interpret=True,
                         queue_depth=4, refill_every=2, march_unroll=2,
                         fetch_cadence=1, nee=nee)
    nb = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                         jnp.asarray(tmax), res, interpret=True,
                         queue_depth=4, refill_every=2, march_unroll=2,
                         fetch_cadence=1, nee=nee, alive=jnp.asarray(alive))
    for f in ("distance", "ipos", "normal", "color_word", "nee_visible"):
        np.testing.assert_array_equal(
            np.asarray(getattr(na, f))[alive],
            np.asarray(getattr(nb, f))[alive], err_msg=f"nee alive {f}")
    assert np.all(np.asarray(nb.nee_visible)[dead] == 0)

    # sun_mode is a pure scheduling knob: 'half' (early-out only on the
    # unrolled segments) and 'off' must give identical per-ray results.
    for sm in ("half", "off"):
        nc = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                             jnp.asarray(tmax), res, interpret=True,
                             queue_depth=4, refill_every=2, march_unroll=2,
                             fetch_cadence=1, nee=nee, sun_mode=sm,
                             alive=jnp.asarray(alive))
        for f in ("distance", "ipos", "normal", "color_word",
                  "nee_visible"):
            np.testing.assert_array_equal(
                np.asarray(getattr(nb, f))[alive],
                np.asarray(getattr(nc, f))[alive],
                err_msg=f"sun_mode={sm} {f}")


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


def _cone_dirs(rng, light_dir, cone_cos, n):
    """Uniform directions in the cone of half-angle acos(cone_cos)."""
    L = np.asarray(light_dir, np.float64)
    L /= np.linalg.norm(L)
    cos_t = 1.0 - rng.random(n) * (1.0 - cone_cos)
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t**2))
    phi = rng.random(n) * 2 * np.pi
    a = np.array([1.0, 0.0, 0.0]) if abs(L[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    t1 = np.cross(L, a)
    t1 /= np.linalg.norm(t1)
    t2 = np.cross(L, t1)
    d = (
        cos_t[:, None] * L
        + (sin_t * np.cos(phi))[:, None] * t1
        + (sin_t * np.sin(phi))[:, None] * t2
    )
    return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


def make_terrain_setup(res=32, seed=0):
    """Terrain heightfield + pillars — the shadow-ray geometry class the
    sun-open table exists for (random fill occupies every 4³ cell)."""
    rng = np.random.default_rng(seed)
    world = VoxelWorld(1.0 / res, res, 0.0)
    mat = np.zeros((res,) * 3, np.int8)
    h = (4 + 6 * rng.random((res, res))).astype(int)
    for x in range(res):
        for z in range(res):
            mat[x, : h[x, z], z] = 1
    for _ in range(6):
        x, z = rng.integers(0, res - 2, 2)
        mat[x : x + 2, : rng.integers(10, 25), z : z + 2] = 1
    world.material = mat
    world.color = rng.integers(0, 255, (res, res, res, 3), dtype=np.uint8)
    arrays = world.device_arrays()
    tables = build_pallas_tables(mat, np.asarray(arrays["voxels"]), res)
    pyr = OccupancyPyramid(arrays["occ_words"], res, int(np.log2(res)))
    return world, tables, pyr


@pytest.mark.parametrize("seed,noise", [(0, 0.1), (2, 0.4)])
def test_sun_open_certificate_sound(seed, noise):
    """Every cell certified sun-open must see ONLY misses for rays starting
    anywhere inside it with any direction in the NEE cone (oracle: the
    portable DDA)."""
    from voxelrt.ops.accel import build_sun_open_bits

    res = 32
    world, tables, pyr = make_terrain_setup(res, seed)
    rng = np.random.default_rng(seed + 77)
    light = rng.normal(size=3)
    light[1] = abs(light[1]) + 0.5  # sun above horizon, like the scenes
    cone_cos = np.cos(noise * 0.5)

    r2 = res // 4
    occ_cells = (
        (world.material != 0)
        .transpose(2, 1, 0)
        .reshape(r2, 4, r2, 4, r2, 4)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(r2, r2, r2, 64)
        .any(axis=-1)
    )
    bits = build_sun_open_bits(occ_cells, light, cone_cos)
    n_open = int(bits.sum())
    assert n_open > 0, "test scene certified nothing; weaken the fill"

    open_idx = np.argwhere(bits)  # (k, 3) [cz, cy, cx]
    k = min(64, len(open_idx))
    sel = open_idx[rng.choice(len(open_idx), k, replace=False)]
    per = 16
    origins = []
    for cz, cy, cx in sel:
        o = np.stack(
            [
                cx * 4 + rng.random(per) * 4,
                cy * 4 + rng.random(per) * 4,
                cz * 4 + rng.random(per) * 4,
            ],
            axis=1,
        )
        origins.append(o)
    o = np.concatenate(origins).astype(np.float32)
    d = _cone_dirs(rng, light, cone_cos, len(o))
    ref = raytrace(pyr, jnp.asarray(o), jnp.asarray(d), 1e-6, np.inf)
    assert not np.isfinite(np.asarray(ref.distance)).any(), (
        "sun-open certificate violated: a certified cell produced a hit"
    )


def test_sun_open_kernel_matches_plain_shadow():
    """any_hit traversal with the sun table must classify cone rays exactly
    like the plain shadow trace (the certificate only short-circuits rays
    that would miss anyway)."""
    from voxelrt.ops.accel import add_sun_open_table

    res = 32
    seed, noise = 4, 0.2
    world, tables, pyr = make_terrain_setup(res, seed)
    rng = np.random.default_rng(seed + 5)
    light = np.array([0.6, 1.0, -0.3])
    cone_cos = np.cos(noise * 0.5)
    tables = add_sun_open_table(tables, world.material, light, cone_cos)
    assert int(np.asarray(tables.sun_open_words).sum()) != 0

    n = 2048
    o = rng.uniform(0, res, (n, 3)).astype(np.float32)
    d = _cone_dirs(rng, light, cone_cos, n)
    plain = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                            np.inf, res, any_hit=True, fetch_colors=False,
                            interpret=True)
    fast = raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                           np.inf, res, any_hit=True, fetch_colors=False,
                           use_sun_open=True, interpret=True)
    hp = np.isfinite(np.asarray(plain.distance))
    hf = np.isfinite(np.asarray(fast.distance))
    assert np.array_equal(hp, hf), int((hp != hf).sum())
    # the table must actually save work on escaping rays
    assert int(np.asarray(fast.iters)[~hf].sum()) < int(
        np.asarray(plain.iters)[~hp].sum()
    )


def test_nee_src_open_matches_plain():
    """nee_src_open (conversion-time sun-open retirement of in-kernel NEE
    shadow rays) is a pure scheduling optimization: the sun-open
    certificate guarantees the shadow march could only end 'visible', and
    an AABB-missing shadow is 'visible' by the escape contract — so all
    consumed outputs (primary hit fields + nee_visible) must be bitwise
    identical, across queue depths, unrolls and sun modes."""
    import math

    from voxelrt.ops.accel import add_sun_open_table, build_pallas_tables
    from voxelrt.ops.sampling import make_orthonormal_basis

    res = 32
    rng = np.random.default_rng(33)
    world = VoxelWorld(1.0 / res, res, 0.0)
    # ground slab + occluders confined to the lower half: cells in the
    # open upper half carry the sun-open certificate (the random-scatter
    # alternative defeats it — no cell-wide cone stays clear), while
    # low surfaces still get occluded shadows
    mat = (rng.random((res,) * 3) < 0.04).astype(np.int8)
    mat[:, 10:, :] = 0
    mat[:, 0:2, :] = 1
    world.material = mat
    world.color = rng.integers(0, 255, (res, res, res, 3), dtype=np.uint8)
    arrays = world.device_arrays()
    tables = build_pallas_tables(mat, np.asarray(arrays["voxels"]), res)
    L = np.array([0.4, 1.0, 0.2])
    L /= np.linalg.norm(L)
    cone_cos = math.cos(0.025 * 0.5)
    tables = add_sun_open_table(tables, mat, L, cone_cos)
    assert int(np.asarray(tables.sun_open_words).astype(np.uint32).sum()) != 0

    n = 4096
    o = rng.uniform(0, res, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    alive = rng.random(n) < 0.8
    tmax = np.where(alive, np.inf, 0.0).astype(np.float32)
    u = rng.random((n, 2)).astype(np.float32)
    # a mix of floor-crossing and pure-voxel NEE conversions
    alt = np.where(rng.random(n) < 0.3,
                   rng.uniform(1.0, 40.0, n), np.inf).astype(np.float32)
    Lj = jnp.asarray(L, jnp.float32)
    X, Y = make_orthonormal_basis(Lj)
    nee = dict(u=jnp.asarray(u), alt_t=jnp.asarray(alt), light_dir=Lj,
               tangent=X, bitangent=Y, cone_cos=cone_cos,
               eps_grid=1e-4 * 16.0, shadow_tmin=1e-4)

    def run(src_open, **kw):
        return raytrace_pallas(tables, jnp.asarray(o), jnp.asarray(d), 1e-6,
                               jnp.asarray(tmax), res, interpret=True,
                               nee=nee, alive=jnp.asarray(alive),
                               nee_src_open=src_open, **kw)

    fields = ("distance", "ipos", "normal", "color_word", "nee_visible")
    combos = [
        dict(queue_depth=4, refill_every=2, march_unroll=2, fetch_cadence=1,
             sun_mode="all"),
        dict(queue_depth=4, refill_every=2, march_unroll=2, fetch_cadence=1,
             sun_mode="half"),
        dict(queue_depth=2, refill_every=3, march_unroll=1, fetch_cadence=2,
             sun_mode="off"),
    ]
    for kw in combos:
        a = run(False, **kw)
        b = run(True, **kw)
        for f in fields:
            av = np.asarray(getattr(a, f))
            bv = np.asarray(getattr(b, f))
            np.testing.assert_array_equal(av, bv, err_msg=f"{kw} {f}")
        # the feature must have verdicts to write: some shadows visible
        assert np.asarray(b.nee_visible).sum() > 0

