"""Static render configuration.

The reference scatters configuration across three tiers: module constants
(``USE_RESTIR_PT``, ``MAX_RAY_DEPTH``, ``RADIANCE_CLAMP`` at
renderer/pathtracer.py:15-20; ``SCREEN_RES``/``VOXEL_DX`` at scene.py:11-12),
constructor arguments (``voxel_edges``, ``exposure``, scene.py:113) and 0-D
runtime fields (the Scene setter methods, scene.py:139-169).

Here everything that is *static at jit-trace time* lives in one frozen
dataclass; per-frame runtime values (camera, light, floor, flags that do not
change traced code shape) live in the :class:`voxelrt.render.pipeline.RenderParams`
pytree instead.
"""

from __future__ import annotations

import dataclasses
import math
import os


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Trace-time-static renderer configuration."""

    # Image / screen (reference fixes 1920x1080 at scene.py:12; we default to
    # the 720p benchmark resolution and make it configurable).
    image_res: tuple[int, int] = (1280, 720)

    # Voxel grid (scene.py:11, renderer/voxel_world.py:13-14).
    grid_res: int = 128
    voxel_dx: float = 1.0 / 64.0

    # Scene constructor args (scene.py:113).
    voxel_edges: float = 0.06
    exposure: float = 3.0

    # Path tracing constants (renderer/pathtracer.py:15-24).
    max_ray_depth: int = 4
    use_directional_light: bool = True
    use_restir_pt: bool = False
    radiance_clamp: float = 300.0

    # ReSTIR spatial GRIS pass parameters (renderer/pathtracer.py:1312-1314).
    restir_radius: float = 24.0
    restir_taps: int = 32

    # NEE sun transmittance: the reference fetches the skybox transmittance
    # per cone-sampled light direction at every depth
    # (renderer/pathtracer.py:465-466). Across the NEE cone (example6:
    # half-angle 0.72°) the transmittance varies < 0.7% (max) / 0.2% (mean),
    # so the default evaluates it ONCE per launch at the cone centre —
    # removing a full-wavefront texture fetch per depth. 'per_ray' restores
    # the reference-exact behavior.
    nee_transmittance: str = "center"  # 'center' | 'per_ray'

    # IN-KERNEL NEE: the traversal kernel converts a retired primary/bounce
    # ray in place into its sun-cone shadow ray (sharing the queue slot and
    # VMEM working set) instead of the renderer issuing a separate any-hit
    # shadow dispatch per depth (ops/dda_pallas.py, ``nee=``). Equality with
    # the two-dispatch formulation is tested; applies on the unsorted Pallas
    # path with a directional light and no ReSTIR (those keep the explicit
    # dispatch).
    # Default ON since the march-unroll kernel: wall-neutral pre-unroll,
    # −9 ms/spp with it (the conversion/refill machinery amortizes over the
    # unrolled advances and the fused dispatch drops the shadow-wavefront
    # staging buffers; bench.py A/B 86.3 → 77.1 ms/spp on example6 @720p).
    nee_in_kernel: bool = True

    # Traversal bound (renderer/raytracer.py:103).
    max_dda_advances: int = 512

    # Traversal backend: the Pallas VMEM kernel (ops/dda_pallas.py) or the
    # portable XLA implementation (ops/dda.py). Auto-selected by the app
    # shell: Pallas on TPU, portable elsewhere. `pallas_interpret` runs the
    # kernel in interpreter mode (CPU tests of the production path).
    use_pallas_dda: bool = False
    pallas_interpret: bool = False

    # Static set of material ids that can occur at runtime (voxel grid +
    # floor + built-ins), baked by HeadlessRenderer.prepare_data. A small
    # set turns the (N, 128) one-hot palette matmul in fetch_material into
    # an exact per-field select chain (see voxelrt/materials.py).
    material_ids: tuple = ()
    # Which Disney features the ids in material_ids actually use
    # (ops.bsdf.MatFeatures fields); features that are zero across the whole
    # palette subset let the BSDF drop exactly-zero lobes at trace time.
    # () = unknown -> evaluate everything.
    material_features: tuple = ()

    # Sort incoherent (bounce/shadow) rays by origin-cell morton code before
    # dispatching the Pallas kernel: terminated lanes compact to the back
    # (whole blocks exit after one iteration) and live blocks become
    # spatially tight. Default OFF since block_rows=24: the kernel now
    # absorbs tile-ordered wavefronts well enough that the four 7.4M-lane
    # multi-payload route/unroute sorts per depth cost more than they save
    # (measured 188.7 vs 204.0 ms/spp on example6 @720p x8 samples,
    # PERF_NOTES.md round-2 frame dissection).
    sort_rays: bool = False

    # Sublane rows of rays per traversal-kernel block (multiple of 8). The
    # kernel's iteration is a serial vector dependency chain; R rows per
    # block interleave R independent chains on the VPU (latency hiding) at
    # the cost of straggler coupling. Tuned on v5e (tools/trace_bench.py,
    # example6 scene): 8→16→24 is +42%/+13% on sorted bounce rays and
    # +64%/+9% on primary; 32 plateaus (bounce regresses) and roughly
    # doubles the Mosaic compile time again. The env override exists for
    # the CPU-interpret test suite, where wide blocks only pad tiny ray
    # sets (tests/conftest.py pins 8).
    dda_block_rows: int = int(os.environ.get("VOXELRT_DDA_BLOCK_ROWS", "24"))

    # (The v4 kernel's dda_mask_group_words knob is gone: the v5 kernel's
    # mask fetch is one full static scan over the rank-compressed mixed-cell
    # table — see ops/accel.py — with no grouping machinery to tune.)

    # QUEUED WAVEFRONT (kernel v6): each (row, lane) slot of an INCOHERENT
    # dispatch (bounce/shadow) holds a queue of this many rays and reloads
    # in place as rays retire, amortizing lock-step straggler pacing
    # (example6 bounce rays: mean 10.7 advances vs 82.6 block max). Tuned on
    # v5e: depth 16 + refill cadence 3 lifts tile-order bounce 44.6 → 78.8
    # Mrays/s and sun shadow ~85 → ~125 (tools/trace_bench.py --queue);
    # depth 32 adds ~2% frame (bounce 81.2) and ships. The queue also
    # MONETIZES the sun-open NEE certificate (wall-neutral pre-queue):
    # early-retired shadow rays now free their slot for a refill —
    # measured +13% on the sun-shadow load. Coherent primary rays bypass
    # the queue (no straggler spread to hide). 1 disables.
    dda_queue_depth: int = int(os.environ.get("VOXELRT_DDA_QUEUE", "32"))
    # Refill cadence 2 since the single-region refill (round 5): with the
    # write+carry chains merged and the NEE conversion deduplicated, more
    # frequent refills (less retired-slot idling) win — full 512-spp runs
    # read 15.86 / 16.00 / 16.36 s at cadence 2 / 3 / 4 on example6 @720p.
    dda_refill_every: int = 2

    # Grid advances per kernel loop iteration (march unroll): extra
    # march-only segments re-gather occupancy and advance again within one
    # iteration, amortizing the per-iteration fixed cost (scalar liveness
    # reduce, state pack/unpack, fetch-branch dispatch, refill
    # select-chains) over several grid steps. Per-ray results are bitwise
    # identical (rays at occupied cells just stall until the next fetch
    # round). Tuned on v5e (tools/trace_bench.py --unroll, example6):
    # 1→2 lifts tile-order bounce 91.9 → 107.2 Mrays/s and primary
    # 110 → 143. Since refill cadence 2 (round 5) the sweet spot is
    # SCENE-CLASS dependent: open sun-lit scenes read 30.5 / 31.0 / 30.9
    # ms/spp at unroll 3 / 2 / 4 (example6, two confirming full runs
    # each for 2 and 3) but the enclosed example9 interior prefers 2
    # (65.3 vs 67.0 at 3 — interiors are fetch-round-bound, and unroll 3
    # defers fetch opportunities to every third advance). 'auto' (the
    # default) resolves by the same sun-openness statistic that gates
    # dda_nee_src_open (app/headless.prepare_data): ≥15% sun-open cells ⇒
    # 3, else 2; callers that construct RenderConfig directly without the
    # app shell resolve 'auto' to 3 (the open-scene value) at trace time.
    dda_march_unroll: object = "auto"  # 'auto' | int ≥ 1
    dda_fetch_cadence: int = 1

    # In-kernel-NEE sun-open early-out cadence: 'all' consults the
    # per-cell sun-escape certificate on every advance (the LOD2 gather
    # becomes a dual-table scan), 'half' only on the unrolled march
    # segments (halves the dual-gather cost; a certified shadow ray
    # retires ≤1 advance later — outputs identical), 'off' disables the
    # early-out. Pure scheduling knob; per-ray results are unchanged.
    # Measured on example6 @720p: half 33.35 / off 33.41 / all 33.90
    # ms/spp — the certificate still pays, at half its gather cost.
    dda_sun_mode: str = "half"  # 'all' | 'half' | 'off'

    # In-cell DDA unroll length per fetch round (9 = the longest monotone
    # voxel path through a 4³ cell resolves in one fetch; shorter unrolls
    # run fewer mask tests per fetch but re-fetch rays that cross a cell
    # in more steps — the resolve is resumable either way, results exact).
    dda_resolve_steps: int = 9

    # Conversion-time sun-open retirement for in-kernel NEE shadow rays: a
    # converted shadow ray whose entry cell carries the sun-open
    # certificate (or whose AABB clip misses the grid) can be verdicted
    # 'visible' AT the refill itself — the slot loads its next queued ray
    # instead of marching the shadow for refill_every+ iterations. Bitwise
    # identical (the certificate guarantees the march could only end
    # 'visible'; equality test in tests/test_dda_pallas.py). 'auto'
    # resolves by the scene's sun-open cell fraction at setup (open scenes
    # on, enclosed interiors off — the extra per-refill gather has nothing
    # to retire there).
    dda_nee_src_open: str = "auto"  # 'auto' | 'on' | 'off'

    # Escape-sky fetch estimator: 'stochastic' picks ONE bilinear corner
    # per sample with probability equal to its bilinear weight — unbiased
    # (the fetch is linear in texel values) and the same per-sample dither
    # role as the reference's random direction jitter, which at the
    # default 1024² skybox already spans ~1.75 texels. The route sort then
    # carries texel ids only, the Pallas fetch reads one corner instead of
    # four, and the unroute carries the packed texel words losslessly.
    # 'bilinear' restores the reference's jittered 4-corner interpolation.
    sky_fetch: str = "stochastic"  # 'stochastic' | 'bilinear'

    # Per-sample uniform draws: 'pcg3d' derives each draw slot by hashing
    # (pixel key lo, pixel key hi, slot) with PCG3D (Jarzynski & Olano,
    # JCGT 2020) — fully fused into consumers, no (n_draws, N) table in
    # HBM. 'table' restores the vmapped-threefry draw table (the per-pixel
    # BASE key stays threefry fold_in(sample key, pixel id) either way, so
    # both modes are shard-invariant counter-based RNG; the reference's
    # ti.random() is a per-thread LCG, a weaker generator than either).
    rng_draws: str = "pcg3d"  # 'pcg3d' | 'table'

    # Deferred-escape skybox fetch routing: True sorts the wavefront's
    # escape texel ids so each (8,128) fetch-kernel block touches few VMEM
    # slabs (two multi-payload 7.4M-lane lax.sorts); False dispatches the
    # fetch in ray order and lets the kernel's slab loop absorb the
    # scatter. Identical results — purely a routing choice; see
    # PERF_NOTES.md for the measured tradeoff.
    sky_route_sort: bool = True

    # Slice the escape-sky route/unroute sorts per sample: the deferred
    # wavefront is sample-major (samples_per_launch contiguous slices,
    # pipeline.py), so sorting it as (k, n/k) rows costs log2(n/k)-squared
    # bitonic passes instead of log2(n)-squared (~30% fewer at k=16) with
    # bitwise-identical output (exact per-lane fetch; per-slice unroute is
    # a permutation). Measured on v5e (PERF_NOTES round-4 session 3): a
    # small LOSS at 720p×spl16 (14.7M lanes — the fetch kernel's coarser
    # per-slice texel clustering costs more slab rounds than the shorter
    # sorts save) but a WIN at 1080p×spl16 (33M lanes: 75.4 → 74.3 ms/spp)
    # and at spl=32. 'auto' (default) slices when the wavefront exceeds
    # 24M lanes; True/'on' and False/'off' force it.
    sky_sort_sliced: object = "auto"  # 'auto' | True/'on' | False/'off'

    # Motion-phase reprojection backend: 'pallas' fuses the current-color
    # bilinear + gated history taps into one VMEM-resident kernel
    # (ops/resample.py — replaces ~30 full-image XLA gathers per moving
    # frame); 'xla' keeps the plain gather formulation (also the automatic
    # fallback when the active-res tables exceed the kernel's VMEM budget).
    # The Pallas path stores motion-phase sources as bf16 (≈0.4%%): motion
    # history caps at 50 frames and resets on stop, so converged stills are
    # unaffected.
    motion_resample: str = "pallas"  # 'pallas' | 'xla'

    # Vignette (renderer/pathtracer.py:32-34).
    vignette_strength: float = 0.9
    vignette_radius: float = 0.0
    vignette_center: tuple[float, float] = (0.5, 0.5)

    # Default vertical FOV in radians (renderer/pathtracer.py:89).
    fov: float = math.radians(50.0)

    # Camera near/far planes (scene.py:190-191).
    z_near: float = 0.01
    z_far: float = 10.0

    # Physical sky: static toggles — the reference stores them in 0-D fields
    # (scene.py:159-169) but they gate whole pipelines, so they are
    # trace-static here. The skybox resolution is 3840 in the reference
    # (renderer/atmos.py:66-67); it is configurable here because the TPU
    # build can trade precompute time/memory for fidelity.
    use_physical_sky: bool = False
    use_clouds: bool = False
    skybox_res: int = 1024
    trans_lut_res: tuple[int, int] = (256, 128)
    sky_steps: int = 64
    sky_sun_samples: int = 8
    sky_ms_samples: int = 8
    sky_ms_steps: int = 5
    cloud_steps: int = 32
    cloud_sun_samples: int = 8
    cloud_shadow_steps: int = 8
    cloud_accum_passes: int = 32

    # Reprojected-history tap filter while the camera moves: 'catmullrom'
    # (the reference's 4×4, renderer/pathtracer.py:1092-1183) or 'bilinear'
    # (2×2). With the fused Pallas resample kernel (ops/resample.py) the
    # reference filter fits the interactive budget (87 ms/frame moving at
    # 720p on v5e vs 80 for bilinear), so it is the default again; the
    # round-2 bilinear downgrade only existed because each tap was a
    # full-image XLA gather. Converged still images are identical either
    # way (motion history caps at 50 and resets on stop).
    motion_filter: str = "catmullrom"

    # Number of path samples traced per accumulate() call per pixel.
    samples_per_launch: int = 1

    # Light brightness multiplier (renderer/pathtracer.py:144).
    light_weight: float = 3.0

    @property
    def n_lods(self) -> int:
        return int(math.log2(self.grid_res))

    @property
    def aspect_ratio(self) -> float:
        return self.image_res[0] / self.image_res[1]

    @property
    def voxel_inv_dx(self) -> float:
        return 1.0 / self.voxel_dx

    @property
    def grid_offset(self) -> int:
        # renderer/voxel_world.py:14 — grid centered at the origin.
        return -(self.grid_res // 2)


DEFAULT_CONFIG = RenderConfig()
