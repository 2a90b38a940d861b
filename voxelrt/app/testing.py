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


def make_scene_data(cfg: RenderConfig, world: VoxelWorld | None = None,
                    seed=0) -> SceneData:
    world = world or make_test_world(cfg, seed)
    arrays = world.device_arrays()
    return SceneData(
        occ_words=arrays["occ_words"],
        voxels=arrays["voxels"],
        mat_params=MaterialList().params,
        sky=None,
    )


def make_params(cfg: RenderConfig, camera_pos=(0.4, 0.5, 2.0),
                look_at=(0.0, 0.0, 0.0)) -> RenderParams:
    proj = perspective_matrix(cfg.fov, cfg.aspect_ratio, cfg.z_near, cfg.z_far)
    view = look_at_matrix(camera_pos, look_at, (0, 1, 0))
    light = np.array([1.0, 1.0, 1.0])
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
        light_cone_cos_theta_max=jnp.float32(np.cos(0.05)),
        light_color=jnp.asarray([1.0, 0.95, 0.9], jnp.float32),
        floor_height=jnp.float32(-0.1),
        floor_color=jnp.asarray([0.8, 0.8, 0.85], jnp.float32),
        floor_material=jnp.int32(1),
        background_color=jnp.asarray([0.2, 0.3, 0.5], jnp.float32),
        max_accum_frames=jnp.float32(1e9),
        taa_jitter=jnp.zeros(2, jnp.float32),
        frame_idx=jnp.int32(0),
        voxel_edges=jnp.float32(cfg.voxel_edges),
    )
