"""Checkpoint/resume for long scenario sweeps.

The reference has NO checkpointing (SURVEY.md §5: controllers are stateless
beyond warm starts rebuilt per tick, ``QuatMpc.cpp:218,250-253``); a batched
fleet running hours of domain-randomized rollouts needs it. Any pytree of
arrays (fleet carries, estimator states, gait states, RNG keys) round-trips
through a plain compressed-npz file plus a pickled treedef. Prefer passing
``like=`` to `restore` — it rebuilds the structure from your example pytree
and never touches the pickle.

Checkpoints are host-side snapshots: call at sweep boundaries, never inside
the jitted step (a device->host pull inside the hot loop would serialize
dispatch — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import pathlib
import pickle
from typing import Any

import jax
import numpy as np


def _paths_and_leaves(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [np.asarray(v) for _, v in flat]
    return keys, leaves, treedef


def save(path, tree: Any, metadata: dict | None = None) -> pathlib.Path:
    """Write `tree` to `<path>.npz` (+ treedef pickle). Returns the path."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    keys, leaves, treedef = _paths_and_leaves(tree)
    arrays = {f"leaf_{i}": a for i, a in enumerate(leaves)}
    np.savez_compressed(path.with_suffix(".npz"), **arrays)
    meta = {
        "keys": keys,
        "metadata": metadata or {},
        "n_leaves": len(leaves),
    }
    path.with_suffix(".json").write_text(json.dumps(meta, indent=1))
    path.with_suffix(".treedef").write_bytes(
        pickle.dumps(jax.tree_util.tree_structure(tree))
    )
    return path.with_suffix(".npz")


def restore(path, like: Any | None = None) -> Any:
    """Load a checkpoint back into a pytree.

    like: optional example pytree — when given, its structure is used and
    leaves are cast to the example's dtypes (robust across jax versions);
    otherwise the pickled treedef from save() is used. TRUST NOTE: the
    treedef path unpickles `<path>.treedef`, which can execute arbitrary
    code — only restore checkpoints you wrote yourself, or pass `like=`
    (which never reads the pickle).
    """
    path = pathlib.Path(path)
    with np.load(path.with_suffix(".npz")) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        ex_leaves = jax.tree_util.tree_leaves(like)
        leaves = [
            np.asarray(a, dtype=np.asarray(e).dtype) for a, e in zip(leaves, ex_leaves)
        ]
    else:
        treedef = pickle.loads(path.with_suffix(".treedef").read_bytes())
    return jax.tree_util.tree_unflatten(treedef, leaves)


def metadata(path) -> dict:
    path = pathlib.Path(path)
    return json.loads(path.with_suffix(".json").read_text())["metadata"]
