"""Checkpointing: save/resume/warm-start/best tracking via Orbax.

Behavior mirror of the reference (reference train.py:86-123, 182-186,
244-263): checkpoints are ``checkpoint_{iteration}`` directories under the
output dir carrying {step, params, bn_state, opt_state, val_loss,
learning_rate}; on startup the newest checkpoint is auto-discovered and
resumed (including optimizer state and learning rate); ``checkpoint_best``
tracks the minimum validation loss; warm start loads params only, skipping
``ignore_layers`` (default: the embeddings, reference hparams.py:24).

Divergence (documented): the reference lets the auto-scan OVERWRITE an
explicitly passed ``-c`` checkpoint path (train.py:248) — here an explicit
path wins.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from tacotron2_subword_tpu import train_lib as T


def checkpoint_path(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint_{step}")


def scan_checkpoint(output_dir: str,
                    prefix: str = "checkpoint_") -> Optional[str]:
    """Newest checkpoint dir by step number (reference train.py:182-186)."""
    pattern = os.path.join(os.path.abspath(output_dir), prefix + "*")
    candidates = []
    for p in glob.glob(pattern):
        m = re.match(rf".*{prefix}(\d+)$", p)
        if m and os.path.isdir(p):
            candidates.append((int(m.group(1)), p))
    if not candidates:
        return None
    return max(candidates)[1]


def save_checkpoint(state: T.TrainState, output_dir: str, *,
                    val_loss: float = float("inf"),
                    learning_rate: float = 0.0,
                    name: Optional[str] = None) -> str:
    step = int(state.step)
    path = (os.path.join(os.path.abspath(output_dir), name)
            if name else checkpoint_path(output_dir, step))
    ckptr = ocp.PyTreeCheckpointer()
    tree = {"step": np.int64(step),
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "bn_state": jax.tree_util.tree_map(np.asarray, state.bn_state),
            "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state)}
    ckptr.save(path, tree, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"iteration": step, "val_loss": float(val_loss),
                   "learning_rate": float(learning_rate)}, f)
    return path


def load_checkpoint(path: str, state: T.TrainState
                    ) -> Tuple[T.TrainState, Dict[str, Any]]:
    """Restore a full train state (optimizer + step included, reference
    train.py:100-113).  ``state`` provides the pytree structure."""
    path = os.path.abspath(path)  # orbax rejects relative paths
    ckptr = ocp.PyTreeCheckpointer()
    template = {"step": np.int64(0),
                "params": jax.tree_util.tree_map(np.asarray, state.params),
                "bn_state": jax.tree_util.tree_map(np.asarray,
                                                   state.bn_state),
                "opt_state": jax.tree_util.tree_map(np.asarray,
                                                    state.opt_state)}
    tree = ckptr.restore(path, item=template)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    import jax.numpy as jnp
    new_state = T.TrainState(
        step=jnp.asarray(int(tree["step"]), jnp.int32),
        params=jax.tree_util.tree_map(jnp.asarray, tree["params"]),
        bn_state=jax.tree_util.tree_map(jnp.asarray, tree["bn_state"]),
        opt_state=jax.tree_util.tree_map(
            lambda t, old: jnp.asarray(t) if hasattr(t, "dtype") else old,
            tree["opt_state"], state.opt_state),
    )
    return new_state, meta


def warm_start(path: str, state: T.TrainState,
               ignore_layers: Tuple[str, ...] = ("embedding",)
               ) -> T.TrainState:
    """Load params only, keeping the current values for any top-level key in
    ``ignore_layers`` (reference train.py:86-98 with
    ignore_layers=['embedding.weight'])."""
    path = os.path.abspath(path)  # orbax rejects relative paths
    ckptr = ocp.PyTreeCheckpointer()
    template = {"step": np.int64(0),
                "params": jax.tree_util.tree_map(np.asarray, state.params),
                "bn_state": jax.tree_util.tree_map(np.asarray,
                                                   state.bn_state),
                "opt_state": jax.tree_util.tree_map(np.asarray,
                                                    state.opt_state)}
    tree = ckptr.restore(path, item=template)
    import jax.numpy as jnp
    new_params = dict(jax.tree_util.tree_map(jnp.asarray, tree["params"]))
    for layer in ignore_layers:
        if layer in new_params:
            new_params[layer] = state.params[layer]
    return state._replace(
        params=new_params,
        bn_state=jax.tree_util.tree_map(jnp.asarray, tree["bn_state"]))


class BestTracker:
    """checkpoint_best bookkeeping (reference train.py:366-368)."""

    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        self.best = float("inf")
        best_meta = os.path.join(self.output_dir, "checkpoint_best",
                                 "meta.json")
        if os.path.exists(best_meta):
            with open(best_meta) as f:
                self.best = json.load(f).get("val_loss", float("inf"))

    def update(self, state: T.TrainState, val_loss: float,
               learning_rate: float) -> bool:
        if val_loss < self.best:
            self.best = val_loss
            save_checkpoint(state, self.output_dir, val_loss=val_loss,
                            learning_rate=learning_rate,
                            name="checkpoint_best")
            return True
        return False
