"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.9 — no collectives of any
kind exist upstream); the TPU-native scale-out design is:

  * **dp axis** — shard the image over pixel rows. The scene (occupancy
    pyramid + packed voxels + palette + skybox, ~10-40 MB) is replicated:
    at 128³ it is thousands of times smaller than the per-pixel state, so
    image-space sharding with a replicated world is the right layout; the
    collectives ride ICI only for halo exchange in the temporal window
    filters (GSPMD inserts those automatically).
  * **sp axis** — shard progressive samples: each sp-slice traces its own
    sample subset with decorrelated keys, then a `psum`/mean over 'sp'
    merges them. This is the "samples-per-pixel" scale axis called out in
    SURVEY.md §5.

Two entry points:
  * :func:`sharded_accumulate_n` — the FULL progressive step (render +
    temporal pipeline) jitted with pixel sharding; XLA/GSPMD partitions it.
  * :func:`parallel_render` — explicit shard_map over a ('dp', 'sp') mesh
    doing plain-average rendering with a psum over 'sp' (no temporal
    filtering; used for throughput scaling + the multi-chip dryrun).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from voxelrt.ops import v3
from voxelrt.ops.v3 import V3
from voxelrt.render import pipeline
from voxelrt.render.pathtracer import trace_sample


def make_mesh(devices=None, dp=None, sp=1):
    """Build a ('dp', 'sp') mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, (dp, sp, n)
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def shard_state(state: pipeline.RenderState, mesh: Mesh) -> pipeline.RenderState:
    """Place every (W, H, ...) buffer with rows sharded over 'dp'."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            spec = P("dp", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def sharded_accumulate_n(cfg, scene, params, state, key, camera_is_moving,
                         render_scale, n_samples, mesh):
    """Full progressive step with the image sharded over 'dp' (GSPMD).

    MOVING frames run fully REPLICATED instead (every device computes the
    whole reduced-res frame; zero per-frame collectives). Rationale: with
    the image dp-sharded, camera motion reprojects history from arbitrary
    pixel rows and GSPMD exchanges the full history/motion tables every
    step (measured 120 collectives / 833 MB per moving step at 720p,
    PARALLEL.md round 4). A moving frame is latency-bound (0.5× render
    scale, 1 spp, ≤50-frame history) — sharding it buys little, and the
    motion policy resets history on move/stop transitions
    (app/headless.py, mirroring scene.py:220-226), so no accumulated
    content ever crosses between the replicated moving phase and the
    dp-sharded still phase. The one-time cost is an all-gather of the
    state at the still→moving transition (the device_put below; ~MBs);
    per-frame traffic while moving is zero.
    """
    scene = replicate(scene, mesh)
    params = replicate(params, mesh)
    if camera_is_moving:
        state = replicate(state, mesh)
    else:
        state = shard_state(state, mesh)
    trace_fn = None
    if cfg.use_pallas_dda and not camera_is_moving:
        # The Pallas traversal kernel is an opaque custom call: GSPMD can
        # only all-gather its operands and run it replicated (measured 105
        # collectives / 11.6 MB per 256×144 sample, PARALLEL.md round 5).
        # Substituting a shard_map-wrapped trace runs the kernel
        # shard-local over the wavefront's lane axis — per-lane outputs
        # are bitwise identical (counter-based RNG keyed on global pixel
        # ids; the deferred-sky route sorts are shard-internal
        # permutations) — while the gather-based temporal pipeline stays
        # GSPMD (it needs the partitioner's automatic halo exchanges).
        trace_fn = make_sharded_trace(mesh)
    return pipeline.accumulate_n(
        cfg, scene, params, state, key, camera_is_moving, render_scale,
        n_samples, trace_fn=trace_fn,
    )


_SHARDED_TRACE_CACHE = {}


def make_sharded_trace(mesh: Mesh):
    """A drop-in for render.pathtracer.trace_sample that runs shard-local
    over every mesh axis (flat wavefront lanes split into contiguous
    chunks). Falls back to the plain trace when the lane count does not
    divide the mesh. Cached per mesh so accumulate_n's static trace_fn
    argument hashes stably across calls."""
    cached = _SHARDED_TRACE_CACHE.get(mesh)
    if cached is not None:
        return cached

    from voxelrt.render.pathtracer import trace_sample

    axes = tuple(mesh.axis_names)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    lane_spec = P(axes)

    def trace_fn(cfg, scene, params, key, u, v, camera_is_moving,
                 render_scale, sample_keys=None, jitter_u=None):
        if u.shape[0] % n_shards:
            return trace_sample(cfg, scene, params, key, u, v,
                                camera_is_moving, render_scale,
                                sample_keys=sample_keys, jitter_u=jitter_u)
        has_sk = sample_keys is not None
        has_ju = jitter_u is not None

        def inner(scene, params, key, u, v, *rest):
            it = iter(rest)
            sk = next(it) if has_sk else None
            ju = (next(it), next(it)) if has_ju else None
            return trace_sample(cfg, scene, params, key, u, v,
                                camera_is_moving, render_scale,
                                sample_keys=sk, jitter_u=ju)

        rest = []
        rest_specs = []
        if has_sk:
            rest.append(sample_keys)
            rest_specs.append(lane_spec)
        if has_ju:
            rest.extend([jitter_u[0], jitter_u[1]])
            rest_specs.extend([lane_spec, lane_spec])
        fn = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(), P(), lane_spec, lane_spec, *rest_specs),
            out_specs=lane_spec,
            # pallas_call outputs carry no varying-mesh-axes annotation
            # (same waiver as parallel_render).
            check_vma=False,
        )
        return fn(scene, params, key, u, v, *rest)

    _SHARDED_TRACE_CACHE[mesh] = trace_fn
    return trace_fn


def parallel_render(cfg, scene, params, key, spp, mesh,
                    camera_is_moving=False, render_scale=1.0):
    """Plain-average render of ``spp`` samples over the ('dp', 'sp') mesh.

    Each (dp, sp) shard traces its pixel rows for spp/|sp| samples;
    a mean over 'sp' merges sample subsets. Returns the (W, H, 3) HDR image
    (diffuse + specular), sharded over rows.
    """
    w, h = cfg.image_res
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert w % dp == 0, (w, dp)
    assert spp % sp == 0, (spp, sp)
    local_spp = spp // sp

    u = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[:, None], (w, h))
    v = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :], (w, h))
    u = jax.device_put(u, NamedSharding(mesh, P("dp", None)))
    v = jax.device_put(v, NamedSharding(mesh, P("dp", None)))
    key = jax.device_put(key, NamedSharding(mesh, P()))

    def shard_fn(scene, params, u, v, key):
        sp_idx = jax.lax.axis_index("sp")
        uf = u.reshape(-1)
        vf = v.reshape(-1)

        def body(i, acc):
            k = jax.random.fold_in(jax.random.fold_in(key, sp_idx), i)
            out = trace_sample(cfg, scene, params, k, uf, vf,
                               camera_is_moving, render_scale)
            return acc + out["diffuse"] + out["specular"]

        # init must be varying over BOTH mesh axes (shard_map scan-vma rule):
        # dp via the pixel coords, sp via the axis index.
        acc_c = (
            jnp.zeros((uf.shape[0],), jnp.float32)
            + uf * 0.0
            + sp_idx.astype(jnp.float32) * 0.0
        )
        acc = jax.lax.fori_loop(0, local_spp, body, V3(acc_c, acc_c, acc_c))
        acc = jax.lax.pmean(acc / local_spp, axis_name="sp")
        return v3.stack(acc).reshape(u.shape + (3,))

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("dp", None), P("dp", None), P()),
        out_specs=P("dp", None, None),
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # per-shard traversal kernel is replicated code on sharded rays, so
        # the static vma check is disabled rather than threaded through it.
        check_vma=False,
    )
    return fn(replicate(scene, mesh), replicate(params, mesh), u, v, key)
