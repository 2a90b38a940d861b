"""voxelrt — a TPU-native voxel path-tracing framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
taichi-dev/voxel-rt2 (see SURVEY.md): the 8-method Scene API, dense 128³
voxel world, hierarchical-DDA traversal, Disney BSDF materials, NEE+MIS path
tracing, physical sky + volumetric clouds, temporal accumulation/filtering,
and optional ReSTIR-PT spatial reuse — architected as a wavefront renderer
for TPU instead of the reference's per-pixel Taichi megakernel.
"""

__version__ = "0.1.0"
__all__ = ["Scene", "RenderConfig"]


def __getattr__(name):  # lazy imports keep `import voxelrt.world` light
    if name == "Scene":
        from voxelrt.scene import Scene

        return Scene
    if name == "RenderConfig":
        from voxelrt.config import RenderConfig

        return RenderConfig
    raise AttributeError(f"module 'voxelrt' has no attribute {name!r}")
