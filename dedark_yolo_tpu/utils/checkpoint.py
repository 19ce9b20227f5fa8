"""Checkpoint save/load: params / EMA / optimizer state / train args.

Counterpart of the reference's torch.save checkpoint dict (engine/trainer.py:408-433
{epoch, best_fitness, model, ema, updates, optimizer, train_args, date, version})
using a framework-neutral npz + json container instead of pickled nn.Modules —
no legacy-module remapping needed (tasks.py:592-630 exists only because of pickle).
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

import jax
import numpy as np


def tree_to_npz_dict(tree, prefix):
    flat = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = prefix + "/" + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                      for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path, *, params=None, batch_stats=None, ema_params=None,
                    ema_batch_stats=None, opt_state=None, epoch=0,
                    best_fitness=0.0, updates=0, train_args=None,
                    model_yaml=None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    sections = (("params", params), ("batch_stats", batch_stats),
                ("ema", ema_params), ("ema_bs", ema_batch_stats),
                ("opt", opt_state))
    flat = {}
    for name, tree in sections:
        if tree is not None:
            flat.update(tree_to_npz_dict(tree, name))
    meta = {
        "epoch": int(epoch),
        "best_fitness": float(best_fitness),
        "updates": int(updates),
        "train_args": dict(train_args or {}),
        "model_yaml": model_yaml,
        "date": datetime.now().isoformat(),
        "version": "0.1.0",
        "has": [k for k, v in sections if v is not None],
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **flat)
    return path


def load_checkpoint(path):
    """Returns (meta dict, flat dict of arrays keyed 'section/path...')."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    flat = {k: z[k] for k in z.files if k != "__meta__"}
    return meta, flat


def transfer_tree(src_tree, dst_tree):
    """Copy leaves from src into dst wherever the path exists AND the shape
    matches; return (merged_tree, n_transferred, n_total). The pytree
    analogue of the reference's intersect_dicts weight transfer
    (torch_utils.py intersect_dicts + BaseModel.load, tasks.py:168-178):
    fine-tuning on a dataset with a different nc keeps every backbone/neck
    weight and re-initializes only the mismatched head leaves."""
    src_flat = {tuple(str(getattr(p, "key", getattr(p, "idx", p)))
                      for p in path): leaf
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(src_tree)[0]}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(dst_tree)[0]
    out, n = [], 0
    for path, dst_leaf in leaves_with_path:
        key = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        src_leaf = src_flat.get(key)
        if src_leaf is not None and \
                tuple(src_leaf.shape) == tuple(dst_leaf.shape):
            out.append(np.asarray(src_leaf, dtype=dst_leaf.dtype))
            n += 1
        else:
            out.append(dst_leaf)
    merged = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(dst_tree), out)
    return merged, n, len(leaves_with_path)


def restore_tree(flat, prefix, example_tree):
    """Rebuild a pytree with example_tree's structure from flat npz keys."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(example_tree)[0]
    leaves = []
    for path, example in leaves_with_path:
        key = prefix + "/" + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                      for p in path)
        arr = flat[key]
        assert arr.shape == tuple(example.shape), (
            f"shape mismatch for {key}: ckpt {arr.shape} vs model {example.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(example_tree), leaves)
