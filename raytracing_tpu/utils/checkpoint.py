"""Checkpoint / resume for inverse-rendering runs.

The reference has no persistence at all — all state is rebuilt at startup
and frames are display-only (SURVEY.md §5). Long-running distributed fits
need restartability: this module snapshots the parameter pytree + optimizer
state + step counter to a single .npz with a JSON treedef manifest, and
restores them bit-exactly. (orbax is available in the image and slots in
behind the same API if multi-host async checkpointing is needed; the .npz
path has zero dependencies and is host-local.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save(path: str, params: Any, opt_state: Any = None, step: int = 0,
         metadata: Optional[dict] = None) -> None:
    """Serialize (params, opt_state, step) to `path` (.npz)."""
    payload = {"params": params, "opt_state": opt_state}
    leaves, treedef = jax.tree_util.tree_flatten(payload)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    manifest = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "step": step,
        "metadata": metadata or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"  # atomic write: savez keeps the .npz suffix
    np.savez(tmp, __manifest__=json.dumps(manifest), **arrays)
    os.replace(tmp, path)


def load(path: str, like_params: Any, like_opt_state: Any = None
         ) -> Tuple[Any, Any, int, dict]:
    """Restore a checkpoint. `like_*` provide the pytree structure (shapes
    are validated against the stored leaves)."""
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        leaves = [z[f"leaf_{i}"] for i in range(manifest["n_leaves"])]
    like = {"params": like_params, "opt_state": like_opt_state}
    treedef = jax.tree_util.tree_structure(like)
    restored = jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(l) for l in leaves]
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(like)
    ):
        if hasattr(want, "shape") and got.shape != want.shape:
            raise ValueError(
                f"checkpoint leaf shape {got.shape} != expected {want.shape}"
            )
    return (restored["params"], restored["opt_state"], manifest["step"],
            manifest["metadata"])
