"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference persists nothing (SURVEY.md §5.4 — accumulation state lives
only in the RGBA32F texture and dies on reset); checkpointing is new,
framework-grade surface required for the inverse-rendering loop: state =
(scene pytree, optimizer state, accumulation buffer, frame index, RNG key).

Format: a single .npz with flattened pytree leaves + a tiny JSON treedef
header — dependency-free, works for any registered pytree (TracerScene,
optax states, raw arrays).  `save/load_pytree` round-trips arbitrary
pytrees; `save/load_render_state` adds the progressive-renderer fields.
"""
from __future__ import annotations

import json

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, str(treedef)


def _savable(x):
    """npz-compatible view of a leaf.  Exotic ml_dtypes floats (bfloat16,
    fp8 — numpy kind 'V') round-trip through .npz as raw void and can't be
    cast back, so widen them to float32 on disk; load_pytree casts back to
    the reference leaf's dtype."""
    a = np.asarray(x)
    return a.astype(np.float32) if a.dtype.kind == "V" else a


def save_pytree(path: str, tree, extra: dict | None = None) -> None:
    """Save any jax pytree to `path` (.npz)."""
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i}": _savable(x) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"n": len(leaves), "extra": extra or {}}).encode(),
        dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree back into the structure of `like`.
    Returns (tree, extra_dict)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["n"])]
    treedef = jax.tree.structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, structure expects "
            f"{treedef.num_leaves}")
    ref_leaves = jax.tree.leaves(like)
    cast = [np.asarray(a).astype(np.asarray(r).dtype)
            for a, r in zip(leaves, ref_leaves)]
    return jax.tree.unflatten(treedef, cast), meta["extra"]


def save_render_state(path: str, accum, frame_index: int,
                      scene=None, opt_state=None, rng_key=None) -> None:
    """Checkpoint a progressive render / optimization step."""
    state = {"accum": accum}
    if scene is not None:
        state["scene"] = scene
    if opt_state is not None:
        state["opt"] = opt_state
    if rng_key is not None:
        state["key"] = rng_key
    save_pytree(path, state, extra={"frame_index": int(frame_index),
                                    "keys": sorted(state.keys())})


def load_render_state(path: str, like: dict):
    """Restore a checkpoint written by save_render_state.  `like` must have
    the same keys/structures.  Returns (state_dict, frame_index)."""
    state, extra = load_pytree(path, like)
    return state, extra["frame_index"]
