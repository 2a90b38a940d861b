"""Golden-image regression gate over ALL 11 reference example scenes.

The reference's de-facto test suite is its example scenes (SURVEY.md §4);
here every one renders headlessly at 128×72 / fixed seed / 16 spp and must
match a captured golden within RMSE 0.015 — a ~1% shading regression in any
scene (sky, BSDF, traversal, emissive handling) fails the gate.

Physical-sky scenes (example6/7/10) run with a reduced sky configuration so
the precompute stays test-sized; the result is disk-cached under .skycache/.

Regenerate after intentional image changes:

    python tests/test_examples_golden.py --regen [scene ...]
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden", "examples"
)
RES = (128, 72)
SPP = 16
RMSE_TOL = 0.015

# "example2_restir" gates the ReSTIR-PT spatial GRIS pipeline end to end
# (same scene, use_restir_pt=True) — it exists so the default-off feature
# cannot rot silently.
SCENES = ["main"] + [f"example{i}" for i in range(1, 11)] + ["example2_restir"]

TINY_SKY = dict(
    skybox_res=128,
    sky_steps=8,
    sky_sun_samples=2,
    sky_ms_samples=2,
    sky_ms_steps=2,
    cloud_steps=8,
    cloud_sun_samples=2,
    cloud_shadow_steps=2,
    cloud_accum_passes=2,
)


def build_example(name):
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    restir = name.endswith("_restir")
    scene = bench.build_scene(name.removesuffix("_restir"), RES)
    # NB: the Scene API keeps the sky toggle outside config until the
    # renderer materializes (scene.set_use_physical_sky) — checking
    # scene.config here would miss every sky scene and silently run the
    # full-size sky precompute on CPU.
    over = dict(TINY_SKY) if scene._use_physical_sky else {}
    if restir:
        over.update(use_restir_pt=True, restir_taps=8, restir_radius=6.0)
    if over:
        scene.config = scene.config.__class__(
            **{**scene.config.__dict__, **over}
        )
    return scene


def render_example(name):
    scene = build_example(name)
    return np.asarray(scene.finish(spp=SPP, save=False))


@pytest.mark.parametrize("name", SCENES)
def test_example_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} missing — run tests/test_examples_golden.py --regen")
    from voxelrt.utils.image import read_png

    golden = read_png(path)
    img = render_example(name)
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert rmse < RMSE_TOL, f"{name}: RMSE {rmse:.4f} >= {RMSE_TOL}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")  # goldens are CPU renders
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from voxelrt.utils.image import write_png

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or SCENES
        for name in wanted:
            img = render_example(name)
            write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
            print("wrote", name, flush=True)
