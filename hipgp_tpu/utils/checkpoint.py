"""Checkpoint / restore and artifact IO.

The reference only *saves* (torch.save of state_dict per epoch,
`ziggy/misc/experiment_util.py:762-765`) and never restores for resume.
This rebuild provides true checkpoint/resume of the full training state
(model state + optimizer state + step counter) via numpy-archived pytrees,
plus prediction archives matching the reference's predictions.pkl content.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_checkpoint",
    "restore_checkpoint",
    "save_predictions",
    "load_predictions",
]


def save_pytree(path: str, tree: Any) -> None:
    """Persist a pytree as an .npz of leaves + a json treedef sidecar."""
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(path, *[np.asarray(l) for l in leaves])
    with open(path + ".treedef.json", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves)}, f)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree`, using ``like`` (a tree
    of the same structure, e.g. a freshly-initialized state) as template."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves = [data[k] for k in data.files]
    like_leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has {len(like_leaves)}"
        )
    import jax.numpy as jnp

    leaves = [jnp.asarray(l, lk.dtype) for l, lk in zip(leaves, like_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def save_checkpoint(
    odir: str,
    state: Any,
    opt_state: Any = None,
    step: int = 0,
    extra: Optional[Dict] = None,
) -> None:
    os.makedirs(odir, exist_ok=True)
    save_pytree(os.path.join(odir, "state.npz"), state)
    if opt_state is not None:
        save_pytree(os.path.join(odir, "opt_state.npz"), opt_state)
    meta = {"step": step, **(extra or {})}
    with open(os.path.join(odir, "meta.json"), "w") as f:
        json.dump(meta, f, default=float)


def restore_checkpoint(
    odir: str, state_like: Any, opt_state_like: Any = None
) -> Tuple[Any, Any, int]:
    """(state, opt_state or None, step) — resume where save_checkpoint left."""
    state = load_pytree(os.path.join(odir, "state.npz"), state_like)
    opt_state = None
    opt_path = os.path.join(odir, "opt_state.npz")
    if opt_state_like is not None and os.path.exists(opt_path):
        opt_state = load_pytree(opt_path, opt_state_like)
    step = 0
    meta_path = os.path.join(odir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            step = int(json.load(f).get("step", 0))
    return state, opt_state, step


def save_predictions(path: str, pdict: Dict[str, Optional[np.ndarray]]) -> None:
    """Prediction archive (reference's predictions.pkl content,
    `experiment_util.py:896-903`), as .npz; None values skipped."""
    np.savez(path, **{k: np.asarray(v) for k, v in pdict.items() if v is not None})


def load_predictions(path: str) -> Dict[str, np.ndarray]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    return {k: data[k] for k in data.files}
