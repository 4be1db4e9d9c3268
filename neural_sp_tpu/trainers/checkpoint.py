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
                    keep_epochs: list[int] | None = None,
                    sub_step: int | None = None):
    """Save and optionally GC checkpoints not in ``keep_epochs``.
    ``sub_step``: sub-epoch checkpoint suffix (MBR training,
    reference train.py:489-504)."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if controller_state is not None:
        payload["controller"] = controller_state
    if sub_step is not None:
        path = os.path.join(save_dir, f"ckpt.epoch-{epoch}-step-{sub_step}")
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, payload)
        return
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


def restore_like(template, restored, _path=""):
    """Rebuild ``restored`` (orbax turns tuples into lists / namedtuples into
    dicts) with the exact pytree structure of ``template``.

    Structure-aware: namedtuple fields are matched to the restored dict's
    keys BY NAME (orbax flattens dicts in sorted-key order, which silently
    permutes leaves of any namedtuple whose fields are not alphabetical —
    e.g. optax.MultiStepsState), and every leaf is shape-checked against
    the template."""
    # leafless subtrees (e.g. optax.EmptyState) come back from orbax as None
    if restored is None and not jax.tree.leaves(template):
        return template
    # namedtuple template restored as a dict: match fields by name
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        if isinstance(restored, dict):
            return type(template)(*[
                restore_like(getattr(template, f), restored[f],
                             f"{_path}.{f}")
                for f in template._fields])
        restored = tuple(restored)
        return type(template)(*[
            restore_like(t, r, f"{_path}.{f}") for t, r, f in
            zip(template, restored, template._fields)])
    if isinstance(template, dict):
        assert isinstance(restored, dict), f"{_path}: expected dict"
        return {k: restore_like(v, restored[k], f"{_path}.{k}")
                for k, v in template.items()}
    if isinstance(template, (tuple, list)):
        assert len(template) == len(restored), \
            f"{_path}: {len(restored)} entries, expected {len(template)}"
        out = [restore_like(t, r, f"{_path}[{i}]")
               for i, (t, r) in enumerate(zip(template, restored))]
        return type(template)(out) if isinstance(template, tuple) else out
    if template is None:
        return None
    # leaf: validate shape (dtype may legitimately differ, e.g. f64 avg)
    t_shape = np.shape(template)
    r_shape = np.shape(restored)
    assert t_shape == r_shape, \
        f"{_path}: restored shape {r_shape} != template {t_shape}"
    return restored


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
