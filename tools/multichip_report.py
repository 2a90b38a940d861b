"""Full-resolution multi-chip validation + ICI traffic report.

Runs the GSPMD full progressive step (render + temporal pipeline) at the
flagship 1280x720 resolution on an 8-virtual-device host mesh, asserts the
dp-sharded image equals the single-device image, and quantifies the
communication the partitioner inserted: every collective op in the
optimized HLO with its shape, byte volume per step, and the per-device
FLOP split. Writes the numbers into PARALLEL.md.

Usage: python tools/multichip_report.py  (CPU-only; sets its own flags)
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import re  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from voxelrt.app.testing import (make_params, make_scene_data,  # noqa: E402
                                 production_test_config, tiny_config)
from voxelrt.parallel import sharding  # noqa: E402
from voxelrt.render import pipeline  # noqa: E402

RES = (1280, 720)
DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "u8": 1, "s8": 1, "f64": 8, "u64": 8, "s64": 8}


def collective_inventory(hlo_text):
    """Parse collectives out of optimized HLO: [(op, shape, bytes)]."""
    out = []
    pat = re.compile(
        r"^\s*%?\S+ = (\S+) (all-reduce|all-gather|reduce-scatter|"
        r"collective-permute|all-to-all)\(", re.M)
    for m in pat.finditer(hlo_text):
        shape = m.group(1)
        kind = m.group(2)
        # shape like f32[720,3]{1,0} or (f32[..], f32[..])
        nbytes = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES.get(dt, 4)
        out.append((kind, shape, nbytes))
    return out


def main():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, devs
    cfg = tiny_config(image_res=RES, grid_res=128)
    scene = make_scene_data(cfg)
    params = make_params(cfg)
    key = jax.random.PRNGKey(3)
    n_samples = 2

    # --- single device -----------------------------------------------------
    t0 = time.perf_counter()
    s1 = pipeline.accumulate_n(cfg, scene, params, pipeline.init_state(cfg),
                               key, False, 1.0, n_samples)
    c1 = np.asarray(s1.color)
    t_single = time.perf_counter() - t0

    # --- dp8 GSPMD full step ------------------------------------------------
    mesh8 = sharding.make_mesh(devs[:8], dp=8, sp=1)
    scene_r = sharding.replicate(scene, mesh8)
    params_r = sharding.replicate(params, mesh8)
    state_s = sharding.shard_state(pipeline.init_state(cfg), mesh8)

    lowered = pipeline.accumulate_n.lower(
        cfg, scene_r, params_r, state_s, key, False, 1.0, n_samples)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    coll = collective_inventory(hlo)

    t0 = time.perf_counter()
    s8 = compiled(scene_r, params_r, state_s, key)
    c8 = np.asarray(jax.device_get(s8.color))
    t_dp8 = time.perf_counter() - t0

    np.testing.assert_allclose(c8, c1, rtol=2e-5, atol=2e-5)
    print(f"dp8 == single-device at {RES[0]}x{RES[1]}: "
          f"max abs diff {np.abs(c8 - c1).max():.2e}")

    # --- moving frame --------------------------------------------------------
    # OLD policy (kept dp-sharded): GSPMD exchanges history/motion tables.
    mv_lowered = pipeline.accumulate_n.lower(
        cfg, scene_r, params_r, s8, key, True, 0.5, 1)
    mv_hlo = mv_lowered.compile().as_text()
    mv_coll = collective_inventory(mv_hlo)
    # NEW policy (sharding.sharded_accumulate_n): moving frames run
    # replicated — lower the same step with the state replicated.
    s8_r = sharding.replicate(s8, mesh8)
    mvr_lowered = pipeline.accumulate_n.lower(
        cfg, scene_r, params_r, s8_r, key, True, 0.5, 1)
    mvr_hlo = mvr_lowered.compile().as_text()
    mvr_coll = collective_inventory(mvr_hlo)

    # --- per-device cost ----------------------------------------------------
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")

    total_bytes = sum(b for _, _, b in coll)
    mv_bytes = sum(b for _, _, b in mv_coll)

    lines = []
    lines.append("## Full-resolution GSPMD validation (round 5, "
                 "8-device host mesh)\n")
    lines.append(f"`tools/multichip_report.py` — full progressive step "
                 f"(render + temporal pipeline) at {RES[0]}x{RES[1]}, "
                 f"{n_samples} samples, mesh dp8:\n")
    lines.append(f"- **Equality**: dp8-sharded final color == single-device "
                 f"to {np.abs(c8 - c1).max():.1e} max abs diff "
                 f"(pixel rows re-partitioned only; counter-based RNG makes "
                 f"draws shard-invariant).")
    lines.append(f"- **Collectives in the optimized still-frame step**: "
                 f"{len(coll)} ops, {total_bytes / 1e3:.1f} KB total per "
                 f"step ({total_bytes / n_samples / 1e3:.1f} KB/sample).")
    for kind, shape, b in coll[:12]:
        lines.append(f"    - {kind}  {shape}  ({b / 1e3:.1f} KB)")
    if len(coll) > 12:
        lines.append(f"    - ... {len(coll) - 12} more")
    mvr_bytes = sum(b for _, _, b in mvr_coll)
    lines.append(f"- **Moving-frame step**: dp-sharded (the round-4 "
                 f"pathology) {len(mv_coll)} collectives / "
                 f"{mv_bytes / 1e6:.0f} MB per step — camera motion "
                 f"reprojects history from arbitrary rows, so GSPMD "
                 f"exchanges the history/motion tables across shards. "
                 f"**Shipped policy** (sharding.sharded_accumulate_n runs "
                 f"moving frames REPLICATED; history resets on move/stop "
                 f"transitions so nothing crosses phases): "
                 f"{len(mvr_coll)} collectives / {mvr_bytes / 1e3:.1f} KB "
                 f"per moving step, plus a one-time state all-gather at "
                 f"the still→moving transition.")
    lines.append(f"- **Per-device FLOPs** (XLA cost model, whole step): "
                 f"{flops / 1e9:.2f} GF total; the render is "
                 f"embarrassingly parallel over pixel rows.")
    lines.append(f"- Wall (8 virtual CPU devices, informational only): "
                 f"single {t_single:.1f} s, dp8 {t_dp8:.1f} s for "
                 f"{n_samples} samples at 720p.")

    # --- PRODUCTION configuration (Pallas kernel + physical sky) -----------
    # The full-res run above uses the portable DDA (a 720p interpret-mode
    # Pallas trace on a CPU host takes hours); this section lowers the REAL
    # pipeline — queued Pallas traversal kernel (interpret), in-kernel NEE,
    # physical sky + clouds — at a reduced resolution and inventories the
    # collectives GSPMD inserts for it. Equality for this config is gated in
    # tests/test_multichip_fullres.py::test_production_config_sharded.
    pcfg = production_test_config(image_res=(256, 144), grid_res=128)
    pscene = make_scene_data(pcfg)
    pparams = make_params(pcfg)
    pscene_r = sharding.replicate(pscene, mesh8)
    pparams_r = sharding.replicate(pparams, mesh8)
    pstate_s = sharding.shard_state(pipeline.init_state(pcfg), mesh8)
    naive_lowered = pipeline.accumulate_n.lower(
        pcfg, pscene_r, pparams_r, pstate_s, key, False, 1.0, 1)
    naive_coll = collective_inventory(naive_lowered.compile().as_text())
    naive_bytes = sum(b for _, _, b in naive_coll)
    p_lowered = pipeline.accumulate_n.lower(
        pcfg, pscene_r, pparams_r, pstate_s, key, False, 1.0, 1,
        trace_fn=sharding.make_sharded_trace(mesh8))
    p_hlo = p_lowered.compile().as_text()
    p_coll = collective_inventory(p_hlo)
    p_bytes = sum(b for _, _, b in p_coll)
    lines.append(f"- **Production config** (Pallas traversal kernel + "
                 f"in-kernel NEE + physical sky/clouds, 256x144 "
                 f"interpret-mode lowering). Naive GSPMD cannot partition "
                 f"the kernel's custom call — it all-gathers the ray "
                 f"blocks and runs the traversal replicated "
                 f"({len(naive_coll)} collectives / {naive_bytes / 1e3:.0f}"
                 f" KB per still sample). The shipped path "
                 f"(sharding.make_sharded_trace: the trace runs under "
                 f"shard_map, shard-local over wavefront lanes, while the "
                 f"gather-based temporal pipeline stays GSPMD) lowers to "
                 f"{len(p_coll)} collectives / {p_bytes / 1e3:.1f} KB per "
                 f"still sample:")
    for kind, shape, b in p_coll[:8]:
        lines.append(f"    - {kind}  {shape}  ({b / 1e3:.1f} KB)")
    if len(p_coll) > 8:
        lines.append(f"    - ... {len(p_coll) - 8} more")
    report = "\n".join(lines) + "\n"
    print(report)

    md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARALLEL.md")
    existing = open(md).read() if os.path.exists(md) else (
        "# Multi-chip design + measurements\n\n"
        "Design: voxelrt/parallel/sharding.py (replicated scene, "
        "image-row dp sharding, sp sample sharding; SURVEY.md §2.9).\n\n")
    marker = "## Full-resolution GSPMD validation"
    if marker in existing:
        existing = existing[: existing.index(marker)]
    open(md, "w").write(existing + report)
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
