"""Checkpoint/resume for progressive renders (SURVEY.md §5).

The reference has no checkpointing; its closest analogue is the resettable
accumulation state (renderer/pathtracer.py:664-668). Long headless renders
on TPU deserve a real one: the full RenderState pytree + RNG key + frame
counter round-trip through one npz, so a 512-spp render can be split across
sessions/preemptions with bitwise-identical results.
"""

from __future__ import annotations

import io
import os

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif hasattr(tree, "_asdict"):
        items = tree._asdict().items()
    elif isinstance(tree, (tuple, list)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("."): tree}
    for k, v in items:
        if v is None:
            out[f"{prefix}{k}.__none__"] = np.zeros(0)
        else:
            out.update(_flatten(v, f"{prefix}{k}."))
    return out


def save_render_state(path, state, key, frame: int, extra=None):
    import jax

    arrays = {k: np.asarray(jax.device_get(v))
              for k, v in _flatten(state, "state.").items()}
    arrays["rng.key"] = np.asarray(jax.device_get(key))
    arrays["meta.frame"] = np.asarray(frame)
    if extra:
        for k, v in extra.items():
            arrays[f"extra.{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **arrays)


def load_render_state(path, template):
    """Restore (state, key, frame, extra) using ``template`` (an init_state
    pytree) for structure; shapes must match. ``extra`` returns whatever dict
    was passed to :func:`save_render_state` (e.g. the spp counter)."""
    import jax
    import jax.numpy as jnp

    z = np.load(path)

    def rebuild(tree, prefix):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}.") for k, v in tree.items()}
        if hasattr(tree, "_asdict"):
            d = {k: rebuild(v, f"{prefix}{k}.") for k, v in tree._asdict().items()}
            return type(tree)(**d)
        if isinstance(tree, tuple):
            return tuple(rebuild(v, f"{prefix}{i}.") for i, v in enumerate(tree))
        if tree is None:
            return None
        key = prefix.rstrip(".")
        arr = z[key]
        return jnp.asarray(arr)

    state = rebuild(template, "state.")
    key = jnp.asarray(z["rng.key"])
    frame = int(z["meta.frame"])
    extra = {k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")}
    return state, key, frame, extra
