"""Checkpoint save/load with stage-partial restore.

Equivalent of the reference's checkpoint utilities
(tools/train_utils/train_utils.py:60-111): full state dicts
``{epoch, it, model_state, optimizer_state}`` plus ``load_part_ckpt``-style
partial restore for the RPN -> RCNN stage hand-off.  Orbax handles the
(sharded-)array serialisation.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(root: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(root), f"checkpoint_epoch_{epoch}")


def save_checkpoint(ckpt_root: str, state, epoch: int, it: int) -> str:
    path = _ckpt_dir(ckpt_root, epoch)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"epoch": np.asarray(epoch, np.int32), "it": np.asarray(it, np.int32)},
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state):
    """Restore a full train state; returns (state, epoch, it)."""
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"epoch": np.asarray(0, np.int32), "it": np.asarray(0, np.int32)},
    }
    restored = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, int(restored["meta"]["epoch"]), int(restored["meta"]["it"])


def load_params_partial(path: str, params, batch_stats, subtrees=("rpn",)):
    """Restore only matching subtrees (e.g. RPN weights into a joint model),
    like the reference's load_part_ckpt key-intersection
    (train_utils.py:95-111).  Returns (params, batch_stats)."""
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    params = dict(params)
    batch_stats = dict(batch_stats) if batch_stats else {}
    src_params = restored["params"]
    src_stats = restored.get("batch_stats", {})
    for key in subtrees:
        if key in src_params:
            params[key] = jax.tree_util.tree_map(np.asarray, src_params[key])
        if src_stats and key in src_stats:
            batch_stats[key] = jax.tree_util.tree_map(np.asarray, src_stats[key])
    return params, batch_stats


def epoch_from_path(path: str) -> int | None:
    """Extract the epoch id from a ``checkpoint_epoch_N`` path (the
    reference's filename-epoch convention, eval_rcnn.py:741-744)."""
    m = re.search(r"checkpoint_epoch_(\d+)", os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else None


def latest_checkpoint(ckpt_root: str) -> str | None:
    if not os.path.isdir(ckpt_root):
        return None
    best = None
    best_epoch = -1
    for name in os.listdir(ckpt_root):
        m = re.match(r"checkpoint_epoch_(\d+)$", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(ckpt_root, name)
    return best


def list_checkpoints(ckpt_root: str) -> list[tuple[int, str]]:
    out = []
    if not os.path.isdir(ckpt_root):
        return out
    for name in os.listdir(ckpt_root):
        m = re.match(r"checkpoint_epoch_(\d+)$", name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckpt_root, name)))
    return sorted(out)
