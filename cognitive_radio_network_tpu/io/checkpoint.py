"""Parameter/state checkpointing (npz core, orbax-compatible trees).

The classifier's weights and optimizer state snapshot/restore — what the
reference could not do (its weights are compile-time constants,
CE_Predictive_Node.cpp:78-120).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_radio_network_tpu.signal.mlp import MLPParams

__all__ = ["save_mlp", "load_mlp", "load_mlp_with_meta", "save_state", "load_state"]


def save_mlp(
    path: str | Path, params: MLPParams, *, feature_transform: str = "none"
) -> None:
    """feature_transform records the input transform the weights were
    trained with ("none" | "log1p") so inference applies the same one."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        w1=np.asarray(params.w1),
        b1=np.asarray(params.b1),
        w2=np.asarray(params.w2),
        b2=np.asarray(params.b2),
        feature_transform=np.asarray(feature_transform),
    )


def load_mlp(path: str | Path, dtype=jnp.float32) -> MLPParams:
    return load_mlp_with_meta(path, dtype)[0]


def load_mlp_with_meta(
    path: str | Path, dtype=jnp.float32
) -> tuple[MLPParams, dict]:
    d = np.load(path)
    params = MLPParams(
        jnp.asarray(d["w1"], dtype),
        jnp.asarray(d["b1"], dtype),
        jnp.asarray(d["w2"], dtype),
        jnp.asarray(d["b2"], dtype),
    )
    meta = {
        "feature_transform": (
            str(d["feature_transform"]) if "feature_transform" in d else "none"
        )
    }
    return params, meta


def save_state(path: str | Path, tree) -> None:
    """Arbitrary pytree snapshot as a flat npz (keys are tree paths)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for keypath, leaf in flat:
        key = "/".join(str(k) for k in keypath)
        arrays[key] = np.asarray(leaf)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_state(path: str | Path, like):
    """Restore into the structure of ``like`` (a template pytree)."""
    d = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(k) for k in keypath)
        arr = d[key]
        leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", arr.dtype)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves
    )
