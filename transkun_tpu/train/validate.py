"""Validation pass (counterpart of ``doValidation``, ``TrainUtil.py:231-272``):
mean NLL per audio second + note+offset precision/recall/F1 over a validation
loader.

Distribution strategy (the reference shards validation across workers and
all_reduces a 5-vector, ``TrainUtil.py:254-263`` / ``train.py:319-351``):

* within one process, one thread per local device pulls batches from the
  shared loader stream (parameters replicated once per device, each device
  running its own log_prob/decode programs; wall time scales ~1/n_devices
  and the split never materializes in host RAM);
* across processes, each rank validates its own loader shard
  (``BatchLoader(rank=, world_size=)``) and the aggregate 5-vector is summed
  with ``aggregate_across_processes`` before deriving metrics.

Per-batch results are accumulated on the host in batch-index order, so the
multi-device aggregate is bit-identical to the serial path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import numpy as np

AGG_KEYS = ("logProb", "length", "nGT", "nEst", "nCorrect")


def compute_metrics(model, params, audio_batch, notes_batch) -> Dict[str, float]:
    logp = model.log_prob(params, audio_batch, notes_batch)
    logp = float(np.asarray(logp).sum(-1).mean())
    stats = model.compute_stats_mireval(params, audio_batch, notes_batch)
    return {
        "logProb": logp,
        "length": audio_batch.shape[1],
        "nGT": stats["nGT"],
        "nEst": stats["nEst"],
        "nCorrect": stats["nCorrect"],
    }


def _metrics_from_agg(agg: Dict[str, float]) -> Dict[str, float]:
    precision = agg["nCorrect"] / max(agg["nEst"], 1e-8)
    recall = agg["nCorrect"] / max(agg["nGT"], 1e-8)
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)
    return {
        "meanNLL": -agg["logProb"] / max(agg["length"], 1e-8),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def validation_counts(
    model, params, loader, fs: int, devices: Optional[Sequence] = None
) -> Dict[str, float]:
    """The raw 5-vector of this process's validation shard.

    Batches STREAM from the loader (its prefetch pipeline keeps load and
    compute overlapped; a full validation split never materializes in host
    RAM).  With more than one device, one thread per device pulls the next
    batch from the shared iterator — dynamic balancing, wall time ~1/n."""
    results: Dict[int, Dict[str, float]] = {}

    if devices is not None and len(devices) > 1:
        import threading

        import jax

        per_dev_params = [jax.device_put(params, d) for d in devices]
        it = enumerate(iter(loader))
        lock = threading.Lock()

        def run_worker(d_idx: int) -> None:
            while True:
                with lock:
                    nxt = next(it, None)
                if nxt is None:
                    return
                i, b = nxt
                results[i] = compute_metrics(
                    model, per_dev_params[d_idx], b["audioSlices"], b["notes"]
                )

        with ThreadPoolExecutor(max_workers=len(devices)) as ex:
            list(ex.map(run_worker, range(len(devices))))
    else:
        for i, b in enumerate(loader):
            results[i] = compute_metrics(model, params, b["audioSlices"], b["notes"])

    agg = dict.fromkeys(AGG_KEYS, 0.0)
    for i in sorted(results):  # batch-index order: identical to serial sum
        r = results[i]
        agg["logProb"] += r["logProb"]
        agg["length"] += r["length"] / fs
        for k in ("nGT", "nEst", "nCorrect"):
            agg[k] += r[k]
    return agg


def aggregate_across_processes(agg: Dict[str, float]) -> Dict[str, float]:
    """Sum the validation 5-vector over all processes (the reference's
    ``dist.all_reduce(tensor)``, ``TrainUtil.py:257-258``).  No-op for a
    single-process runtime."""
    import jax

    if jax.process_count() == 1:
        return agg
    from jax.experimental import multihost_utils

    vec = np.asarray([agg[k] for k in AGG_KEYS], np.float64)
    all_vecs = np.asarray(multihost_utils.process_allgather(vec))
    total = all_vecs.sum(axis=0)
    return dict(zip(AGG_KEYS, (float(x) for x in total)))


def do_validation(
    model, params, loader, fs: int, devices: Optional[Sequence] = None
) -> Dict[str, float]:
    """Single-process entry: validate the whole loader (optionally over all
    local devices) and derive metrics."""
    return _metrics_from_agg(validation_counts(model, params, loader, fs, devices))
