"""Pytree flatten/unflatten and npz persistence used across checkpointing and
weight conversion."""

from __future__ import annotations

import numpy as np


def tree_flatten_paths(tree, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_flatten_paths(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(tree_flatten_paths(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def tree_unflatten_paths(flat: dict):
    root: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def save_pytree_npz(path: str, tree) -> None:
    np.savez_compressed(path, **tree_flatten_paths(tree))


def load_pytree_npz(path: str, as_jax: bool = True):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    if as_jax:
        import jax.numpy as jnp

        flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return tree_unflatten_paths(flat)
