"""Validation pass (counterpart of ``doValidation``/``computeMetrics``,
``transkun/TrainUtil.py:212-272``): mean NLL per audio second + note+offset
precision/recall/F1 over a validation loader."""

from __future__ import annotations

from typing import Dict

import numpy as np


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


def do_validation(model, params, loader, fs: int) -> Dict[str, float]:
    agg = {"logProb": 0.0, "length": 0.0, "nGT": 0.0, "nEst": 0.0, "nCorrect": 0.0}
    for batch in loader:
        notes_batch = batch["notes"]
        audio = batch["audioSlices"]
        r = compute_metrics(model, params, audio, notes_batch)
        agg["logProb"] += r["logProb"]
        agg["length"] += r["length"] / fs
        for k in ("nGT", "nEst", "nCorrect"):
            agg[k] += r[k]
    precision = agg["nCorrect"] / max(agg["nEst"], 1e-8)
    recall = agg["nCorrect"] / max(agg["nGT"], 1e-8)
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)
    return {
        "meanNLL": -agg["logProb"] / max(agg["length"], 1e-8),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
