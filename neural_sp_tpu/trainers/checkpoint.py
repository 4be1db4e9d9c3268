"""Checkpoint save/load + top-k retention + checkpoint averaging.

Reference: per-epoch ``model.epoch-N`` files with model+scheduler+optimizer
state and top-k GC (``lr_scheduler.py:189-225``); checkpoint averaging
("model soup") at eval (``eval_utils.py:33-78``).

Storage: orbax PyTree checkpointing under <save_dir>/ckpt.epoch-N; the
EpochController state and metadata ride along as a pytree leaf.
"""
from __future__ import annotations

import os
import re
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(save_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(save_dir), f"ckpt.epoch-{epoch}")


def save_checkpoint(save_dir: str, epoch: int, params, opt_state=None,
                    controller_state: dict | None = None,
                    keep_epochs: list[int] | None = None):
    """Save and optionally GC checkpoints not in ``keep_epochs``."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if controller_state is not None:
        payload["controller"] = controller_state
    path = _path(save_dir, epoch)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    if keep_epochs is not None:
        for d in os.listdir(save_dir):
            m = re.match(r"ckpt\.epoch-(\d+)$", d)
            if m and int(m.group(1)) not in keep_epochs and \
                    int(m.group(1)) != epoch:
                shutil.rmtree(os.path.join(save_dir, d))
    return path


def load_checkpoint(path: str) -> dict:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_like(template, restored):
    """Rebuild ``restored`` (orbax turns tuples into lists / namedtuples into
    dicts) with the exact pytree structure of ``template``."""
    t_leaves, treedef = jax.tree.flatten(template)
    r_leaves = jax.tree.leaves(restored)
    assert len(t_leaves) == len(r_leaves), \
        f"checkpoint has {len(r_leaves)} leaves, expected {len(t_leaves)}"
    return jax.tree.unflatten(treedef, r_leaves)


def latest_epoch(save_dir: str) -> int | None:
    if not os.path.isdir(save_dir):
        return None
    epochs = [int(m.group(1)) for d in os.listdir(save_dir)
              if (m := re.match(r"ckpt\.epoch-(\d+)$", d))]
    return max(epochs) if epochs else None


def average_checkpoints(save_dir: str, epochs: list[int]):
    """Uniform parameter average over epochs (reference eval_utils.py:33-78)."""
    assert epochs, "no epochs to average"
    acc = None
    for e in epochs:
        params = load_checkpoint(_path(save_dir, e))["params"]
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        else:
            acc = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64),
                               acc, params)
    n = len(epochs)
    return jax.tree.map(lambda a: (a / n).astype(np.float32), acc)
