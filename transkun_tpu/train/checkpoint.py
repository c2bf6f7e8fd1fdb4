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
    """Save train state (params, opt state, clip buffer, step) + best params.

    Crash-safe overwrite: orbax's ``save(force=True)`` DELETES the existing
    checkpoint before the new one is durable, so a crash mid-save (observed:
    the host OOM-killer during a long run) loses both the old and the new
    state.  Instead the new checkpoint is written to ``path + ".new"`` and
    swapped in with atomic renames; at every instant either ``path``,
    ``path + ".new"`` (complete, mid-swap) or ``path + ".old"`` (pre-swap
    copy) holds a complete checkpoint, and ``load_checkpoint`` falls back in
    that order.
    """
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path.rstrip("/"))
    new_path, old_path = path + ".new", path + ".old"
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
    if os.path.exists(new_path):  # stale leftover from a crashed save
        shutil.rmtree(new_path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(new_path, ckpt)
    # swap: the old checkpoint survives (as .old) until the rename completes
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    if os.path.exists(path):
        os.rename(path, old_path)
    os.rename(new_path, path)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)


def checkpoint_exists(path: str) -> bool:
    """True if ``path`` or one of its crash-recovery siblings holds a
    checkpoint (use instead of ``os.path.exists`` for resume decisions)."""
    path = os.path.abspath(path.rstrip("/"))
    return any(
        os.path.isdir(p) for p in (path, path + ".new", path + ".old")
    )


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

    path = os.path.abspath(path.rstrip("/"))
    # crash-recovery order (see save_checkpoint): ``path.new`` exists only
    # when a save crashed between writing it and completing the rename swap,
    # and in that window it is ALWAYS newer than ``path`` — so a readable
    # ``.new`` is preferred over ``path`` (ADVICE r4: preferring ``path``
    # silently resumed from the older state).  An INCOMPLETE ``.new`` (crash
    # mid-write) fails its restore and the loop falls through to ``path``;
    # ``path.old`` (the pre-save state) is the last resort.
    candidates = [path + ".new", path, path + ".old"]
    existing = [p for p in candidates if os.path.isdir(p)]
    if not existing:
        raise FileNotFoundError(f"Checkpoint at {path} not found.")
    last_err = None
    for cand in existing:
        try:
            with ocp.PyTreeCheckpointer() as ckptr:
                if not to_host:
                    return ckptr.restore(cand)
                meta = ckptr.metadata(cand)
                meta = getattr(meta, "item_metadata", meta)
                meta = getattr(meta, "tree", meta)
                # only array leaves get the host-ndarray target; scalars and
                # strings (e.g. extra.warmstart_from) restore as themselves —
                # forcing np.ndarray on a string leaf makes orbax look for a
                # zarr array that was never written
                restore_args = jax.tree.map(
                    lambda m: (
                        ocp.RestoreArgs(restore_type=np.ndarray)
                        if getattr(m, "shape", None) is not None
                        else ocp.RestoreArgs()
                    ),
                    meta,
                )
                return ckptr.restore(cand, restore_args=restore_args)
        except Exception as e:  # partial write from the pre-atomic format
            last_err = e
            if cand != path:
                print(f"checkpoint fallback: {cand} unreadable ({e})")
    raise last_err


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
