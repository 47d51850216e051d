"""Orbax-based checkpointing with the reference's filename contract.

Mirrors the reference's checkpoint lifecycle (reference:
AvatarGen/AppearanceGen/main.py:601-632): ``checkpoints/ckpt_{iter:06d}`` saved
every ``save_freq`` iters holding networks + optimizer + iter_step; ``--is_continue``
resumes from the newest checkpoint <= end_iter; ``load_pretrain`` loads network
weights only (no optimizer/iter — main.py:612-619).
"""

from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"ckpt_(\d+)$")


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(base_dir: str, iter_step: int, tree) -> str:
    ckpt_dir = os.path.abspath(os.path.join(base_dir, "checkpoints"))
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{iter_step:06d}")
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(base_dir: str, end_iter: int | None = None) -> str | None:
    ckpt_dir = os.path.join(base_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_it = None, -1
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if not m:
            continue
        it = int(m.group(1))
        if end_iter is not None and it > end_iter:
            continue
        if it > best_it:
            best, best_it = os.path.join(ckpt_dir, name), it
    return best


def restore_checkpoint(path: str, target):
    """Restore with the target's pytree structure (keeps optax namedtuples)."""
    ckptr = _checkpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(os.path.abspath(path), abstract)
