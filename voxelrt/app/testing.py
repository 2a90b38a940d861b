"""Small scene/params builders shared by tests, bench and the graft entry."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from voxelrt.camera import look_at_matrix, perspective_matrix
from voxelrt.config import RenderConfig
from voxelrt.materials import MaterialList
from voxelrt.render.pathtracer import RenderParams, SceneData
from voxelrt.world import VoxelWorld


def tiny_config(**overrides) -> RenderConfig:
    # dda_block_rows=8 / dda_queue_depth=2: tests run the Pallas kernel in
    # CPU interpret mode, where the production block/queue sizes only pad
    # tiny ray sets and slow the suite (the queued path itself is equality-
    # tested in tests/test_dda_pallas.py).
    base = dict(image_res=(64, 32), grid_res=32, voxel_dx=1.0 / 16.0,
                dda_block_rows=8, dda_queue_depth=2)
    base.update(overrides)
    return RenderConfig(**base)


def production_test_config(**overrides) -> RenderConfig:
    """The PRODUCTION feature set on test shapes: the Pallas traversal
    kernel (interpret mode for CPU hosts), queued wavefront + in-kernel
    NEE, and the physical sky + cloud pipeline at test-sized knobs. The
    multichip dryrun/tests use this so the thing being sharded is the real
    render path, not the portable-DDA smoke configuration."""
    base = dict(
        image_res=(64, 32), grid_res=32, voxel_dx=1.0 / 16.0,
        dda_block_rows=8, dda_queue_depth=2,
        use_pallas_dda=True, pallas_interpret=True,
        use_physical_sky=True, use_clouds=True,
        skybox_res=64, sky_steps=4, sky_sun_samples=2, sky_ms_samples=2,
        sky_ms_steps=2, cloud_steps=4, cloud_sun_samples=2,
        cloud_shadow_steps=2, cloud_accum_passes=2,
    )
    base.update(overrides)
    return RenderConfig(**base)


def make_test_world(cfg: RenderConfig, seed=0) -> VoxelWorld:
    """A platform + pillars + emissive blocks scene (example1-flavoured)."""
    rng = np.random.default_rng(seed)
    world = VoxelWorld(cfg.voxel_dx, cfg.grid_res, cfg.voxel_edges)
    r = cfg.grid_res // 4
    ii, jj = np.meshgrid(np.arange(-r, r), np.arange(-r, r), indexing="ij")
    idx = np.stack([ii.ravel(), np.zeros(ii.size, int), jj.ravel()], -1)
    world.set_voxels(idx, 1, np.array([0.8, 0.6, 0.4]))
    pil = rng.random(len(idx)) < 0.05
    for x, _, z in idx[pil]:
        h = int(rng.random() * (r // 2)) + 1
        ks = np.arange(1, h + 1)
        world.set_voxels(
            np.stack([np.full_like(ks, x), ks, np.full_like(ks, z)], -1),
            np.where(ks == h, 2, 1),
            np.array([0.2, 0.6, 0.9]),
        )
    return world


# Light constants shared by make_scene_data (sun-open table / sky sun) and
# make_params — they must agree for in-kernel NEE + sky tests to be
# meaningful.
TEST_LIGHT_DIR = (1.0, 1.0, 1.0)
TEST_LIGHT_COLOR = (1.0, 0.95, 0.9)
TEST_CONE_COS = float(np.cos(0.05))


def make_scene_data(cfg: RenderConfig, world: VoxelWorld | None = None,
                    seed=0) -> SceneData:
    world = world or make_test_world(cfg, seed)
    arrays = world.device_arrays()
    ld = np.asarray(TEST_LIGHT_DIR, np.float64)
    ld = ld / np.linalg.norm(ld)
    sky = None
    if cfg.use_physical_sky:
        from voxelrt.sky.atmos import prepare_sky

        sky = prepare_sky(
            cfg, ld.astype(np.float32),
            np.asarray(TEST_LIGHT_COLOR, np.float32) * cfg.light_weight,
            TEST_CONE_COS, quiet=True,
        )
    tables = None
    if cfg.use_pallas_dda:
        from voxelrt.ops.accel import add_sun_open_table, build_pallas_tables

        tables = build_pallas_tables(
            world.material, arrays["voxels_np"], cfg.grid_res
        )
        if cfg.use_directional_light:
            tables = add_sun_open_table(
                tables, world.material, ld, TEST_CONE_COS
            )
    return SceneData(
        occ_words=arrays["occ_words"],
        voxels=arrays["voxels"],
        mat_params=MaterialList().params,
        sky=sky,
        tables=tables,
    )


def make_params(cfg: RenderConfig, camera_pos=(0.4, 0.5, 2.0),
                look_at=(0.0, 0.0, 0.0)) -> RenderParams:
    proj = perspective_matrix(cfg.fov, cfg.aspect_ratio, cfg.z_near, cfg.z_far)
    view = look_at_matrix(camera_pos, look_at, (0, 1, 0))
    light = np.array(TEST_LIGHT_DIR, np.float64)
    light /= np.linalg.norm(light)
    return RenderParams(
        camera_pos=jnp.asarray(camera_pos, jnp.float32),
        proj=jnp.asarray(proj),
        proj_inv=jnp.asarray(np.linalg.inv(proj)),
        view=jnp.asarray(view),
        view_inv=jnp.asarray(np.linalg.inv(view)),
        prev_proj=jnp.asarray(proj),
        prev_view=jnp.asarray(view),
        prev_camera_pos=jnp.asarray(camera_pos, jnp.float32),
        light_direction=jnp.asarray(light, jnp.float32),
        light_cone_cos_theta_max=jnp.float32(TEST_CONE_COS),
        light_color=jnp.asarray(TEST_LIGHT_COLOR, jnp.float32),
        floor_height=jnp.float32(-0.1),
        floor_color=jnp.asarray([0.8, 0.8, 0.85], jnp.float32),
        floor_material=jnp.int32(1),
        background_color=jnp.asarray([0.2, 0.3, 0.5], jnp.float32),
        max_accum_frames=jnp.float32(1e9),
        taa_jitter=jnp.zeros(2, jnp.float32),
        frame_idx=jnp.int32(0),
        voxel_edges=jnp.float32(cfg.voxel_edges),
    )
