"""Orbax checkpointing: best/last snapshots with full training state.

Replaces PL ``ModelCheckpoint(monitor="f1_score", mode="max", save_last=True)``
and ``resume_from_checkpoint`` (reference ``main.py:70, 110``; SURVEY.md §5.4).
A checkpoint directory holds the complete resumable state: params, BN stats,
optimizer state, step/epoch counters, best-F1 tracking, and the serialized
config (the reference rode hyperparameters into checkpoints via
``save_hyperparameters``, ``plt.py:23``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from xview2_tpu.config import Config


def _tree_dir(path: str) -> str:
    return os.path.join(os.path.abspath(path), "tree")


def save_checkpoint(path: str, state, *, epoch: int, best_f1: float,
                    best_epoch: int, cfg: Config) -> None:
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        ckptr.save(_tree_dir(path), payload, force=True)
    meta = {"epoch": epoch, "best_f1": float(best_f1), "best_epoch": int(best_epoch),
            "config": json.loads(cfg.to_json())}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_metadata(path: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(path), "meta.json")) as f:
        return json.load(f)


def load_config(path: str) -> Config:
    return Config(**load_metadata(path)["config"])


def restore_checkpoint(path: str, abstract_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``abstract_state`` (a TrainState template
    or shape-dtype pytree).  Returns ``(state_payload, metadata)``."""
    path = os.path.abspath(path)
    target = {
        "params": abstract_state.params,
        "batch_stats": abstract_state.batch_stats,
        "opt_state": abstract_state.opt_state,
        "step": abstract_state.step,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(_tree_dir(path), item=jax.tree.map(np.asarray, target))
    return restored, load_metadata(path)


def restore_raw(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Restore without a target structure (for eval / transplant)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(_tree_dir(path))
    return restored, load_metadata(path)


def checkpoint_exists(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(os.path.join(os.path.abspath(path), "meta.json"))
