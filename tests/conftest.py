"""Test configuration: force a hermetic 8-device CPU mesh.

Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count) since only one real TPU chip is
available in CI; the driver's dryrun separately exercises the same code.

On hosts with a TPU PJRT plugin baked into sitecustomize (the axon tunnel),
the plugin pins itself as the default platform at interpreter start — the
JAX_PLATFORMS env var alone does NOT win. `jax.config.update` after import
does, and keeps the test suite off the (single, easily-wedged) TPU tunnel.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Narrow traversal-kernel blocks: in CPU interpret mode the production
# 24-row blocks only pad the tests' tiny ray sets 3x (voxelrt/config.py).
os.environ.setdefault("VOXELRT_DDA_BLOCK_ROWS", "8")
# Shallow ray queues for the same reason (production 16 would pad a tiny
# wavefront 16x; the queued path itself is covered by test_dda_pallas).
os.environ.setdefault("VOXELRT_DDA_QUEUE", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
