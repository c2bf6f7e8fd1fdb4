"""Checkpointing: latest/best roles with optimizer + schedule + clip state
(role-parity with the reference single-file .pt checkpoints,
``TrainUtil.py:69-209``), stored via orbax.

Also loads reference torch ``.pt`` checkpoints transparently through the
weight converter so reference-trained models run directly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state, best_params=None, extra: Optional[Dict] = None):
    """Save train state (params, opt state, clip buffer, step) + best params."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = {
        "params": state.params,
        "opt_state": state.opt_state,
        "clip_buffer": state.clip_state.buffer,
        "clip_count": state.clip_state.count,
        "step": state.step,
    }
    if best_params is not None:
        ckpt["best_params"] = best_params
    if extra:
        ckpt["extra"] = extra
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def load_checkpoint(path: str, to_host: bool = True) -> Dict[str, Any]:
    """Restore a checkpoint tree.

    ``to_host=True`` restores every leaf as a host ``np.ndarray`` instead of
    letting orbax place arrays straight onto ``jax.devices()[0]``: over a
    tunneled TPU a device-target restore can stall indefinitely on a flaky
    link (observed: a trainer resume hung inside restore while a fresh
    process could reach the chip fine).  Callers feed the leaves into a
    jitted step / ``device_put`` which commits them to the right sharding on
    first use, so restoring to host costs one extra host→device copy and
    removes the device from the restore critical path.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if not to_host:
            return ckptr.restore(path)
        meta = ckptr.metadata(path)
        meta = getattr(meta, "item_metadata", meta)
        meta = getattr(meta, "tree", meta)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
        )
        return ckptr.restore(path, restore_args=restore_args)


def restore_opt_state(restored, template):
    """Rebuild an optax state NamedTuple structure from an orbax-restored
    plain-dict tree (leaf order is preserved by the checkpoint layout)."""
    import jax

    leaves = jax.tree.leaves(restored)
    structure = jax.tree.structure(template)
    assert structure.num_leaves == len(leaves), (structure.num_leaves, len(leaves))
    return jax.tree.unflatten(structure, leaves)


def merge_params_tolerant(target, source):
    """Overwrite leaves of ``target`` with same-path, same-shape leaves from
    ``source`` (the reference's tolerant partial restore,
    ``TrainUtil.py:58-66``)."""
    import jax

    flat_t = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    merged = {
        path: (
            flat_s[path]
            if path in flat_s and np.shape(flat_s[path]) == np.shape(leaf)
            else leaf
        )
        for path, leaf in flat_t.items()
    }
    treedef = jax.tree_util.tree_structure(target)
    order = jax.tree_util.tree_flatten_with_path(target)[0]
    return jax.tree_util.tree_unflatten(treedef, [merged[p] for p, _ in order])


def load_params(path: str, conf, prefer_best: bool = True):
    """Load model params from either an orbax directory or a reference torch
    ``.pt`` file (ref ``transcribe.py:49-62`` semantics: best preferred)."""
    if os.path.isfile(path) and path.endswith(".pt"):
        from ..utils.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path, conf, prefer_best=prefer_best)
    ckpt = load_checkpoint(path)
    if prefer_best and "best_params" in ckpt:
        return ckpt["best_params"]
    return ckpt["params"]
