"""V1 (ablation) training-path tests: train-mode BatchNorm with mutated
running stats, SyncBN parity with the reference formulas, and end-to-end
V1 training through the shared train step (the reference trains either model
generation through one train.py, ``transkun/train.py:47-49``)."""

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from transkun_tpu.data.labels import encode_batch
from transkun_tpu.data.note import Note
from transkun_tpu.models.ablation import (
    AblationConfig,
    SyncBatchNorm,
    TransKunAblation,
    log_prob_padded,
)
from transkun_tpu.ops import frontend
from transkun_tpu.parallel import make_mesh
from transkun_tpu.train import init_train_state, make_optimizer, make_train_step

TINY_V1 = dict(
    f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256, fs=4000,
    nExtraWins=2,
    preConvSpec=[
        {"outputSize": 8, "hiddenSize": 8, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
        {"outputSize": 8, "hiddenSize": 8, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
    ],
    ctxSize=32, nLayersCtx=1, rnnHiddenSize=16, pitchEmbedSize=16,
    scoreDropoutProb=0.0, contextDropoutProb=0.0, velocityDropoutProb=0.0,
    refinedOFDropoutProb=0.0,
    segmentSizeInSecond=1.0, segmentHopSizeInSecond=0.5,
)


def _v1_model():
    conf = AblationConfig.from_dict(TINY_V1)
    return TransKunAblation(conf)


def _batch(n, rng):
    audio = (rng.normal(size=(n, 4000, 1)) * 0.1).astype(np.float32)
    notes = [[Note(0.1, 0.4, 60, 80), Note(0.5, 0.8, 64, 90)] for _ in range(n)]
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, 64, 256)
    labels = encode_batch(notes, 64 / 4000, [-64, -67] + list(range(21, 109)), 8)
    return frames, tuple(jnp.asarray(a) for a in labels.astuple())


def test_syncbn_matches_reference_formulas(rng):
    """SyncBatchNorm over 2 shards == the reference SyncBN math on the
    pooled batch (``SyncBN.py:112-143``): biased global var for
    normalization, running stats with momentum 0.01 and
    uvar = ssum/(n-1) - mean^2."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    x = rng.normal(size=(4, 6, 5, 3)).astype(np.float32) * 2.0 + 1.0
    bn = SyncBatchNorm(use_running_average=False, axis_name="dp")
    # init outside the mesh with the axis-free twin (same variable structure)
    variables = SyncBatchNorm(use_running_average=False, axis_name=None).init(
        jax.random.PRNGKey(0), jnp.asarray(x[:2])
    )
    # seed running stats away from the identity to see the update rule
    variables = {
        "params": variables["params"],
        "batch_stats": {
            "mean": jnp.asarray([0.5, -0.2, 0.1]),
            "var": jnp.asarray([2.0, 0.5, 1.5]),
        },
    }

    mesh = make_mesh(2)

    # the normalized output is batch-sharded; the synchronized stats are
    # identical on every shard (returned replicated)
    @jax.jit
    @partial(
        shard_map, mesh=mesh, in_specs=(P(), P("dp")),
        out_specs=(P("dp"), P()), check_vma=False,
    )
    def run2(vs, xs):
        y, mut = bn.apply(vs, xs, mutable=["batch_stats"])
        return y, jax.lax.pmean(mut, "dp")

    y, mut = run2(variables, jnp.asarray(x))

    # numpy replay of the reference math on the FULL batch
    c = x.shape[-1]
    flat = x.reshape(-1, c).astype(np.float64)
    n = flat.shape[0]
    s, ss = flat.sum(0), (flat**2).sum(0)
    mean = s / n
    var = ss / n - mean**2
    expected_y = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected_y, rtol=2e-4, atol=1e-5)

    uvar = ss / (n - 1) - mean**2
    m = 0.01
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        (1 - m) * np.array([0.5, -0.2, 0.1]) + m * mean,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        (1 - m) * np.array([2.0, 0.5, 1.5]) + m * uvar,
        rtol=1e-5,
    )


def test_v1_loss_decreases_and_bn_stats_update(rng):
    model = _v1_model()
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    assert "batch_stats" in params, "V1 variables must carry BN running stats"
    opt = make_optimizer(params["params"], max_lr=2e-3, n_iter=1000, warmup_cutoff=0)
    step = make_train_step(
        None, opt, loss_fn=model.make_train_loss(axis_name=None)
    )
    state = init_train_state(params, opt)
    frames, labels = _batch(2, rng)
    losses = []
    for i in range(20):
        state, metrics = step(state, frames, labels, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    # running stats must have moved off their init values
    init_bs = jax.tree.leaves(params["batch_stats"])
    new_bs = jax.tree.leaves(state.params["batch_stats"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(init_bs, new_bs)
    )
    assert moved, "BatchNorm running stats never updated in train mode"


def test_v1_dp_syncbn_matches_single_device_stats(rng):
    """The 8-shard SyncBN train step must produce the SAME BatchNorm running
    stats as a single-device step over the full batch — the definition of
    synchronized batch normalization."""
    model = _v1_model()
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=1e-3, n_iter=1000)
    frames, labels = _batch(8, rng)

    step1 = make_train_step(
        None, opt, loss_fn=model.make_train_loss(axis_name=None)
    )
    s1 = init_train_state(params, opt)
    s1, m1 = step1(s1, frames, labels, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    step8 = make_train_step(
        None, opt, mesh=mesh, loss_fn=model.make_train_loss(axis_name="dp")
    )
    s8 = init_train_state(params, opt)
    s8, m8 = step8(s8, frames, labels, jax.random.PRNGKey(0))

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1.params["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(s8.params["batch_stats"])[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)


def test_v1_log_prob_padded_eval_matches_host_log_prob(rng):
    """The padded training objective in eval mode must agree with the host
    ``log_prob`` API (they share the kernels but thread different code)."""
    model = _v1_model()
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    audio = (rng.normal(size=(2, 4000, 1)) * 0.1).astype(np.float32)
    notes = [[Note(0.1, 0.4, 60, 80)], [Note(0.2, 0.6, 72, 100)]]
    host = np.asarray(model.log_prob(params, audio, notes, max_events=8))

    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, 64, 256)
    labels = encode_batch(notes, 64 / 4000, model.targetMIDIPitch, 8)
    logp, mut = log_prob_padded(
        model.module, params, frames,
        tuple(jnp.asarray(a) for a in labels.astuple()),
        deterministic=True, train=False,
    )
    assert mut == {}
    np.testing.assert_allclose(np.asarray(logp), host, rtol=1e-4, atol=1e-4)
