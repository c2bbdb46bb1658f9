"""Checkpoint read/write (Orbax) — save_last + best-by-val-loss semantics.

Replaces the reference's Lightning `ModelCheckpoint(monitor="val/loss",
save_top_k=1, save_last=True)` (`cli.py:29-37`) and the bare-weights
extraction bridge (`scripts/extract_model_weights.py:30-47`): here
"extracting model weights" is just saving one sub-tree of the state
pytree, no key-name surgery needed.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mod_extraction_tpu.paths import ensure_dir


class CheckpointManager:
    def __init__(self, ckpt_dir: str) -> None:
        self.ckpt_dir = ensure_dir(os.path.abspath(ckpt_dir))
        self.meta_path = os.path.join(self.ckpt_dir, "meta.json")
        self.best_val = float("inf")
        if os.path.isfile(self.meta_path):
            with open(self.meta_path) as f:
                self.best_val = json.load(f).get("best_val", float("inf"))

    def _save(self, name: str, state: Any, meta: dict) -> None:
        path = os.path.join(self.ckpt_dir, name)
        ckptr = ocp.StandardCheckpointer()
        host_state = jax.tree.map(np.asarray, state)
        ckptr.save(path, host_state, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(self.ckpt_dir, f"{name}.json"), "w") as f:
            json.dump(meta, f)

    def save_last(self, state: Any, epoch: int, step: int) -> None:
        self._save("last", state, {"epoch": epoch, "step": step})

    def maybe_save_best(
        self, state: Any, val_loss: float, epoch: int, step: int
    ) -> bool:
        if val_loss < self.best_val:
            self.best_val = float(val_loss)
            self._save(
                "best", state, {"epoch": epoch, "step": step, "val_loss": val_loss}
            )
            with open(self.meta_path, "w") as f:
                json.dump({"best_val": self.best_val}, f)
            return True
        return False

    def restore(self, name: str, target: Any) -> Optional[Any]:
        path = os.path.join(self.ckpt_dir, name)
        if not os.path.isdir(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        host_target = jax.tree.map(np.asarray, target)
        return ckptr.restore(path, target=host_target)


def save_weights(path: str, params: Any) -> None:
    """Bare-weights export (the reference's `.pt` analog): a flat .npz."""
    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("", params)
    np.savez(path, **flat)


def load_weights(path: str) -> dict:
    """Inverse of `save_weights` — rebuilds the nested params dict."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
