"""Headless renderer driver: owns device scene data, render params and the
progressive accumulation loop — the application shell that replaces the
reference's GGUI frame loop (scene.py:171-297)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from voxelrt.materials import MaterialList
from voxelrt.render import pipeline
from voxelrt.render.pathtracer import RenderParams, SceneData


def enable_compile_cache():
    """Persistent XLA compilation cache — the reference leans on Taichi's
    offline_cache=True (scene.py:114) for the same reason (42.7 s compiles,
    profile.log:2)."""
    import os

    try:
        cache = os.environ.get(
            "VOXELRT_XLA_CACHE", os.path.expanduser("~/.cache/voxelrt/xla")
        )
        os.makedirs(cache, exist_ok=True)
        # Repo-shipped pre-warmed entries (data/xlacache/) seed fresh
        # environments, same role as data/skycache/: the flagship pipeline's
        # first compile is minutes on a cold remote-compile server (r3
        # measured 402 s), but the compiled executables are tiny and stable,
        # so shipping them makes cold start ≈ cache-deserialization time.
        shipped = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "data", "xlacache")
        if os.path.isdir(shipped):
            import shutil

            have = set(os.listdir(cache))
            for f in os.listdir(shipped):
                if f.endswith("-cache") and f not in have:
                    shutil.copy(os.path.join(shipped, f), cache)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


class HeadlessRenderer:
    def __init__(self, cfg, scene, seed=0, quiet=False):
        enable_compile_cache()
        # Traversal backend auto-selection: the Pallas VMEM kernel on real
        # TPU, the portable XLA path elsewhere (unless explicitly set).
        import dataclasses

        if not cfg.use_pallas_dda and jax.default_backend() not in ("cpu", "gpu"):
            cfg = dataclasses.replace(cfg, use_pallas_dda=True)
        # voxel_edges is consumed as a traced param (RenderParams) so scenes
        # that differ only in edge width share one accumulate compilation;
        # normalize it out of the static config used for jit keys.
        self._voxel_edges = float(cfg.voxel_edges)
        self._exposure = float(cfg.exposure)
        cfg = dataclasses.replace(cfg, voxel_edges=0.0, exposure=0.0)
        self.cfg = cfg
        self.scene = scene
        self.quiet = quiet
        self.mats = MaterialList()
        self.key = jax.random.PRNGKey(seed)
        self.state = None
        self.scene_data = None
        self._frame = 0
        self._rng = np.random.default_rng(seed ^ 0x5EED)
        self._prev = None  # (proj, view, camera_pos) of previous frame

    # -- precompute (renderer/pathtracer.py:314-323) -----------------------

    def prepare_data(self):
        import dataclasses

        # Bake the static set of material ids reachable at runtime (voxel
        # grid + floor + air/default/light built-ins) so fetch_material
        # compiles to a select chain instead of a 128-wide one-hot matmul.
        ids = set(int(i) for i in np.unique(self.scene.world.material))
        ids |= {0, 1, 2, int(self.scene._floor_material)}
        # Feature flags over the reachable palette rows: a feature that is
        # zero for every reachable material lets ops.bsdf drop that lobe's
        # math at trace time (see MatFeatures).
        rows = self.mats.params_np[sorted(ids)]
        feats = tuple(
            bool(np.any(rows[:, c] != 0.0)) for c in (3, 4, 8, 9, 11)
        )  # subsurface, metallic, anisotropic, sheen, clearcoat
        self.cfg = dataclasses.replace(
            self.cfg, material_ids=tuple(sorted(ids)), material_features=feats
        )
        arrays = self.scene.world.device_arrays()
        sky = None
        if self.cfg.use_physical_sky:
            from voxelrt.sky.atmos import prepare_sky

            sky = prepare_sky(
                self.cfg,
                np.asarray(self.scene._light_direction, np.float32),
                np.asarray(self.scene._light_color, np.float32)
                * self.cfg.light_weight,
                float(self.scene._light_cone_cos_theta_max),
                quiet=self.quiet,
                cloud_tex=getattr(self.scene, "_cloud_texture", None),
            )
        tables = None
        if self.cfg.use_pallas_dda:
            from voxelrt.ops.accel import add_sun_open_table, build_pallas_tables

            tables = build_pallas_tables(
                self.scene.world.material,
                arrays["voxels_np"],
                self.cfg.grid_res,
            )
            if self.cfg.use_directional_light:
                # Sun-visibility certificate for NEE shadow rays; the light
                # direction is a scene constant (scene.py:127,153-154) so
                # one bake covers the whole render.
                tables = add_sun_open_table(
                    tables,
                    self.scene.world.material,
                    np.asarray(self.scene._light_direction, np.float64),
                    float(self.scene._light_cone_cos_theta_max),
                )
            # Sun-openness statistic: the fraction of LOD2 cells whose
            # whole NEE cone provably escapes. Gates two scene-class
            # policies below; enclosed interiors measure ~0, open terrain
            # scenes ~0.3+.
            open_frac = 0.0
            if (self.cfg.use_directional_light
                    and tables.sun_open_words is not None):
                w = np.asarray(tables.sun_open_words).astype(np.uint32)
                n_cells = (self.cfg.grid_res // 4) ** 3
                open_frac = float(np.unpackbits(
                    w.view(np.uint8)).sum()) / max(n_cells, 1)
            if self.cfg.dda_nee_src_open == "auto":
                # Conversion-time sun-open NEE retirement pays only when a
                # meaningful share of shadow-ray origin cells carries the
                # certificate; enclosed interiors (example9: ~0% open)
                # would pay the per-refill gather for nothing.
                self.cfg = dataclasses.replace(
                    self.cfg,
                    dda_nee_src_open="on" if open_frac >= 0.15 else "off")
            if self.cfg.dda_march_unroll == "auto":
                # Open scenes amortize the per-iteration queue/refill cost
                # over 3 advances; enclosed scenes are fetch-round-bound
                # and prefer the fetch opportunity every 2nd advance (see
                # config.dda_march_unroll for the measurements). Scenes
                # without a sun certificate resolve to the open-scene
                # value.
                u = 3
                if (self.cfg.use_directional_light
                        and tables.sun_open_words is not None
                        and open_frac < 0.15):
                    u = 2
                self.cfg = dataclasses.replace(self.cfg, dda_march_unroll=u)
        self.scene_data = SceneData(
            occ_words=arrays["occ_words"],
            voxels=arrays["voxels"],
            mat_params=self.mats.params,
            sky=sky,
            tables=tables,
        )
        self.state = pipeline.init_state(self.cfg)
        self._frame = 0
        self._prev = None

    # -- per-frame params ---------------------------------------------------

    def _params(self, max_accum_frames):
        sc = self.scene
        proj, view = sc.camera.matrices(
            sc._fov, self.cfg.aspect_ratio, self.cfg.z_near, self.cfg.z_far
        )
        if self._prev is None:
            self._prev = (proj, view, np.asarray(sc.camera.position, np.float32))
        prev_proj, prev_view, prev_pos = self._prev
        jitter = (self._rng.random(2) * 2.0 - 1.0) / np.asarray(
            self.cfg.image_res, np.float64
        )
        p = RenderParams(
            camera_pos=jnp.asarray(sc.camera.position, jnp.float32),
            proj=jnp.asarray(proj),
            proj_inv=jnp.asarray(np.linalg.inv(proj)),
            view=jnp.asarray(view),
            view_inv=jnp.asarray(np.linalg.inv(view)),
            prev_proj=jnp.asarray(prev_proj),
            prev_view=jnp.asarray(prev_view),
            prev_camera_pos=jnp.asarray(prev_pos),
            light_direction=jnp.asarray(sc._light_direction, jnp.float32),
            light_cone_cos_theta_max=jnp.float32(sc._light_cone_cos_theta_max),
            light_color=jnp.asarray(sc._light_color, jnp.float32),
            floor_height=jnp.float32(sc._floor_height),
            floor_color=jnp.asarray(sc._floor_color, jnp.float32),
            floor_material=jnp.int32(sc._floor_material),
            background_color=jnp.asarray(sc._background_color, jnp.float32),
            max_accum_frames=jnp.float32(max_accum_frames),
            taa_jitter=jnp.asarray(jitter, jnp.float32),
            frame_idx=jnp.int32(self._frame),
            voxel_edges=jnp.float32(self._voxel_edges),
        )
        self._copy_prev = (proj, view, np.asarray(sc.camera.position, np.float32))
        return p

    def copy_prev_matrices(self):
        """renderer/pathtracer.py:283-287 (host-side)."""
        self._prev = self._copy_prev

    # -- static-camera progressive render ------------------------------------

    def render(self, spp=512, chunk=None, log_every=128,
               checkpoint_every=None, checkpoint_path=None, resume_from=None,
               stats=None):
        """Accumulate ``spp`` samples with the camera fixed; returns the
        tonemapped (W, H, 3) float image.

        ``chunk`` samples run inside one dispatch; keep it modest — a single
        multi-minute device call can trip the TPU worker watchdog (the same
        failure mode the reference dodges by slicing its skybox work,
        scene.py:203).

        Checkpoint/resume (utils/checkpoint.py): ``checkpoint_path`` +
        ``checkpoint_every`` save the full accumulation pytree + RNG key +
        frame/spp counters after chunks; ``resume_from`` restores one and
        continues toward ``spp`` total samples. A resumed render reproduces
        the uninterrupted image exactly when both runs use the same ``chunk``
        (sample keys are derived per chunk from (key, frame)).

        ``stats``: optional :class:`voxelrt.utils.profiling.FrameStats`
        receiving one row per dispatched chunk.
        """
        chunk = chunk or max(1, min(spp, self.cfg.samples_per_launch * 8))
        params = self._params(max_accum_frames=999999999.0)
        done = 0
        if resume_from is not None:
            from voxelrt.utils.checkpoint import load_render_state

            self.state, self.key, self._frame, extra = load_render_state(
                resume_from, self.state
            )
            done = int(extra.get("done", self._frame))
            if not self.quiet:
                print(f"  resumed at {done}/{spp} spp from {resume_from}")
        last_saved = done
        n_pixels = self.cfg.image_res[0] * self.cfg.image_res[1]
        t0 = time.perf_counter()
        while done < spp:
            n = min(chunk, spp - done)
            tc0 = time.perf_counter()
            self.state = pipeline.accumulate_n(
                self.cfg, self.scene_data, params, self.state,
                jax.random.fold_in(self.key, self._frame),
                False, 1.0, n,
            )
            self._frame += n
            done += n
            if stats is not None:
                from voxelrt.utils.profiling import sync

                sync(self.state.color)
                wall_ms = (time.perf_counter() - tc0) * 1e3
                # ≥2 traces (primary + NEE shadow) per bounce-capable sample
                stats.record(self._frame, done, wall_ms,
                             n_rays=n * n_pixels * 2 * self.cfg.max_ray_depth,
                             quiet=self.quiet)
            if checkpoint_path and checkpoint_every and done < spp and (
                done - last_saved >= checkpoint_every
            ):
                from voxelrt.utils.checkpoint import save_render_state

                save_render_state(checkpoint_path, self.state, self.key,
                                  self._frame, extra={"done": done})
                last_saved = done
            if not self.quiet and (done % log_every == 0 or done == spp):
                from voxelrt.utils.profiling import sync

                sync(self.state.color)  # block_until_ready is a no-op here
                print(f"  {done}/{spp} spp  ({time.perf_counter() - t0:.2f}s)")
        self.copy_prev_matrices()
        return self.fetch_image(render_scale=1.0)

    def fetch_image(self, render_scale=1.0):
        img = pipeline.fetch_image(
            self.cfg, self.state, jnp.float32(self._exposure), render_scale
        )
        return np.asarray(jax.device_get(img))

    # -- interactive-equivalent loop -----------------------------------------

    def run_frames(self, frames, spp_per_frame=1, on_frame=None, stats=None,
                   fetch_final=True, sync_lag=0):
        """Scripted camera-path loop with the reference's motion policy
        (scene.py:206-256): while moving → render_scale 0.5, history cap 50;
        transitions reset the framebuffer. ``stats``: optional
        :class:`voxelrt.utils.profiling.FrameStats` receiving one row per
        frame (the structured replacement for the reference's per-frame
        prints, scene.py:257,274-278). ``fetch_final=False`` skips the
        final full-image device_get (pipelined throughput benches sync on a
        scalar instead; the display fetch is a transport cost, not a render
        one).

        ``sync_lag=N`` (with ``stats``) syncs frame ``i-N`` after
        dispatching frame ``i`` — classic double buffering (N=1): the
        display is one frame behind while the tunnel round-trip of the
        sync overlaps the next frame's compute. Recorded ``wall_ms`` is
        then the time BETWEEN successive frame completions (sustained
        latency), not dispatch-to-sync. Ignored when ``on_frame`` forces a
        per-frame image fetch."""
        camera_is_moving = False
        img = None
        last_t = time.perf_counter()
        pending = []  # (frame_idx, spp, n_rays, moving, probe)
        last_sync_t = time.perf_counter()

        def _drain(to_len):
            nonlocal last_sync_t
            import numpy as _np

            while len(pending) > to_len:
                fidx, n_spp, n_rays, mov, probe = pending.pop(0)
                _np.asarray(jax.device_get(probe))
                now = time.perf_counter()
                stats.record(fidx, n_spp, (now - last_sync_t) * 1e3,
                             n_rays=n_rays, quiet=self.quiet, moving=mov)
                last_sync_t = now

        for i, frame in enumerate(frames):
            dt = frame.get("dt")
            if dt is None:
                now = time.perf_counter()
                dt = now - last_t
                last_t = now
            moved = False
            if frame.get("move_keys"):
                moved |= self.scene.camera.translate(frame["move_keys"], dt)
            if frame.get("orbit"):
                moved |= self.scene.camera.orbit(*frame["orbit"])

            should_reset = moved != camera_is_moving
            camera_is_moving = moved
            max_accum = 50.0 if moved else 999999999.0
            render_scale = 0.5 if moved else 1.0

            if should_reset:
                self.state = pipeline.reset_framebuffer(self.state)

            params = self._params(max_accum_frames=max_accum)
            tf0 = time.perf_counter()
            self.state = pipeline.accumulate_n(
                self.cfg, self.scene_data, params, self.state,
                jax.random.fold_in(self.key, self._frame),
                camera_is_moving, render_scale, spp_per_frame,
            )
            self._frame += spp_per_frame
            self.copy_prev_matrices()
            if stats is not None:
                w, h = self.cfg.image_res
                n_pix = int(w * render_scale) * int(h * render_scale)
                n_rays = spp_per_frame * n_pix * 2 * self.cfg.max_ray_depth
                if sync_lag > 0 and on_frame is None:
                    # Probe = a fresh tiny array derived from this frame's
                    # color (completes when the frame does). The state
                    # buffers themselves are DONATED to the next dispatch,
                    # so holding them across frames would sync a deleted
                    # array.
                    pending.append((self._frame, spp_per_frame, n_rays,
                                    camera_is_moving,
                                    self.state.color.ravel()[0]))
                    _drain(sync_lag)
                else:
                    from voxelrt.utils.profiling import sync

                    sync(self.state.color)
                    stats.record(
                        self._frame, spp_per_frame,
                        (time.perf_counter() - tf0) * 1e3,
                        n_rays=n_rays, quiet=self.quiet,
                        moving=camera_is_moving,
                    )
            if on_frame is not None:
                img = self.fetch_image(render_scale)
                on_frame(i, img)
        if stats is not None and pending:
            _drain(0)
        if on_frame is None and fetch_final:
            img = self.fetch_image(1.0 if not camera_is_moving else 0.5)
        return img
