"""Checkpoint save/restore: full TrainState + host scheduler counters.

Equivalent of `exp_runner.py:1109-1144, 1414-1442`: every field/pose/
optimizer array plus iter_step, current_image, current_pose_mlp_index,
pro_iteration, prev_pose.  Stored as a flattened-npz + structure pickle
(no torch / no orbax dependency needed for single-host; the arrays are
small — <10 MB).  Grad-freezing state needs no re-application on load:
freezing is stateless masking (see train/optim.py).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _leaf_to_numpy(x):
    """Typed PRNG keys are stored as their raw uint32 data (the caller
    re-wraps, see Runner.load_checkpoint)."""
    try:
        import jax.dtypes
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
    except (TypeError, AttributeError):
        pass
    return np.asarray(x)


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(_leaf_to_numpy, tree)


def save_checkpoint(path: str, state_tree: Any, host_meta: Dict[str, Any]):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(state_tree))
    payload = {
        "leaves": leaves,
        "treedef": pickle.dumps(treedef),
        "host_meta": host_meta,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    treedef = pickle.loads(payload["treedef"])
    state_tree = jax.tree_util.tree_unflatten(treedef, payload["leaves"])
    return state_tree, payload["host_meta"]


def latest_checkpoint(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return None
    names = sorted(n for n in os.listdir(ckpt_dir) if n.endswith(".ckpt"))
    return os.path.join(ckpt_dir, names[-1]) if names else None
