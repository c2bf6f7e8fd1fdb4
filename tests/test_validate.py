"""Distributed validation: the multi-device sharded pass must aggregate to
EXACTLY the serial result (VERDICT round-2 item 5; ref doValidation +
all_reduce, ``TrainUtil.py:231-272``)."""

import jax
import numpy as np
import pytest

from transkun_tpu.data.note import Note
from transkun_tpu.models import TransKun
from transkun_tpu.models.config import ModelConfig
from transkun_tpu.train.validate import (
    AGG_KEYS,
    aggregate_across_processes,
    do_validation,
    validation_counts,
)

TINY = dict(
    f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256, fs=4000,
    nExtraWins=2, baseSize=8, nHead=2, nLayers=1, scoringExpansionFactor=2,
    segmentSizeInSecond=1.0, segmentHopSizeInSecond=0.5,
)


def _loader(rng, n_batches=5):
    batches = []
    for i in range(n_batches):
        audio = (rng.normal(size=(2, 4000, 1)) * 0.05).astype(np.float32)
        notes = [
            [Note(0.1, 0.4, 60 + i, 80), Note(0.5, 0.8, 64, 90)],
            [Note(0.2, 0.7, 72, 70)],
        ]
        batches.append({"audioSlices": audio, "notes": notes})
    return batches


def test_multi_device_counts_equal_serial(rng):
    model = TransKun(ModelConfig.from_dict(TINY))
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    batches = _loader(rng)

    serial = validation_counts(model, params, batches, TINY["fs"])
    sharded = validation_counts(
        model, params, batches, TINY["fs"], devices=jax.devices()
    )
    assert len(jax.devices()) >= 2
    for k in AGG_KEYS:
        assert serial[k] == sharded[k], (k, serial[k], sharded[k])

    m_serial = do_validation(model, params, batches, TINY["fs"])
    m_sharded = do_validation(
        model, params, batches, TINY["fs"], devices=jax.devices()
    )
    assert m_serial == m_sharded
    assert np.isfinite(m_serial["meanNLL"])


@pytest.mark.quick
@pytest.mark.quick
def test_aggregate_across_processes_single_process_noop():
    agg = dict(zip(AGG_KEYS, [1.0, 2.0, 3.0, 4.0, 5.0]))
    assert aggregate_across_processes(agg) == agg
