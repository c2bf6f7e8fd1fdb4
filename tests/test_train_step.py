"""Training-step tests: loss decreases, DP sharding over the 8-device CPU
mesh matches single-device results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transkun_tpu.data.labels import encode_batch
from transkun_tpu.data.note import Note
from transkun_tpu.models import ModelConfig, TransKun
from transkun_tpu.ops import frontend
from transkun_tpu.parallel import make_mesh
from transkun_tpu.train import init_train_state, make_optimizer, make_train_step

TINY = dict(
    f_min=30, f_max=1900, n_mels=32, hopSize=64, windowSize=256, fs=4000,
    nExtraWins=2, baseSize=8, nHead=2, nLayers=1, scoringExpansionFactor=2,
    segmentSizeInSecond=1.0, segmentHopSizeInSecond=0.5,
    scoreDropoutProb=0.0, contextDropoutProb=0.0, velocityDropoutProb=0.0,
    refinedOFDropoutProb=0.0,
)


def _batch(n, rng):
    audio = (rng.normal(size=(n, 4000, 1)) * 0.1).astype(np.float32)
    notes = [
        [Note(0.1, 0.4, 60, 80), Note(0.5, 0.8, 64, 90)] for _ in range(n)
    ]
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, 64, 256)
    labels = encode_batch(notes, 64 / 4000, [-64, -67] + list(range(21, 109)), 8)
    return frames, tuple(jnp.asarray(a) for a in labels.astuple())


@pytest.mark.quick
def test_loss_decreases(rng):
    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=2e-3, n_iter=1000, warmup_cutoff=0)
    step = make_train_step(model.module, opt)
    state = init_train_state(params, opt)
    frames, labels = _batch(2, rng)
    losses = []
    for i in range(30):
        state, metrics = step(state, frames, labels, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_dp_grad_sum_semantics(rng):
    """The psum'd DP gradient must equal the SUM of per-shard gradients
    computed independently (reference grad-SUM, ``TrainUtil.py:36-56``), and
    the resulting update must match a manual single-device replay."""
    import optax

    from transkun_tpu.models.transkun import log_prob_padded
    from transkun_tpu.train.optim import quantile_clip, quantile_clip_init

    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=1e-3, n_iter=1000)

    frames, labels = _batch(8, rng)

    mesh = make_mesh(8)
    step8 = make_train_step(model.module, opt, mesh=mesh)
    s8 = init_train_state(params, opt)
    key = jax.random.PRNGKey(0)
    s8, m8 = step8(s8, frames, labels, key)

    # independently recompute each shard's gradient with the same fold_in
    # keys the step uses, and sum them
    def shard_loss(p, shard_frames, shard_labels, shard_key):
        logp = log_prob_padded(
            model.module, {"params": p}, shard_frames, shard_labels,
            rngs={"dropout": shard_key}, deterministic=False,
        )
        return -logp.sum(-1).mean() / 50.0

    grad_fn = jax.jit(jax.grad(shard_loss))
    grads_sum = None
    for i in range(8):
        gi = grad_fn(
            params["params"],
            frames[i : i + 1],
            tuple(a[i : i + 1] for a in labels),
            jax.random.fold_in(key, i),
        )
        grads_sum = gi if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, gi
        )

    # the step's reported grad norm is the norm of the psum'd (summed) grads
    manual_norm = float(
        jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads_sum))
        )
    )
    np.testing.assert_allclose(float(m8["grad_norm"]), manual_norm, rtol=1e-4)

    # replay clip + optimizer on the manual grad sum; params AND optimizer
    # moments (which depend directly on the clipped grads) must match
    clipped, _, _, _ = quantile_clip(grads_sum, quantile_clip_init(), 0.8)
    updates, expected_opt_state = opt.update(
        clipped, opt.init(params["params"]), params["params"]
    )
    expected = optax.apply_updates(params["params"], updates)

    def assert_trees_close(t_a, t_b, rtol=1e-4, atol=1e-7):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(t_a)[0],
            jax.tree_util.tree_flatten_with_path(t_b)[0],
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=rtol, atol=atol, err_msg=jax.tree_util.keystr(pa),
            )

    assert_trees_close(expected, s8.params["params"])
    assert_trees_close(expected_opt_state, s8.opt_state)


def test_dp_params_stay_replicated(rng):
    """After several DP steps every device must hold bitwise-identical
    parameters (the reference guarantees this via a single all_reduce'd grad;
    here via psum + replicated out_specs)."""
    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=1e-3, n_iter=1000)
    mesh = make_mesh(8)
    step8 = make_train_step(model.module, opt, mesh=mesh)
    s8 = init_train_state(params, opt)
    frames, labels = _batch(8, rng)
    for i in range(3):
        s8, _ = step8(s8, frames, labels, jax.random.PRNGKey(i))

    checked = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(s8.params)[0]:
        shards = list(leaf.addressable_shards)
        if len(shards) > 1:
            ref = np.asarray(shards[0].data)
            for sh in shards[1:]:
                assert np.array_equal(ref, np.asarray(sh.data)), (
                    jax.tree_util.keystr(path)
                )
            checked += 1
    assert checked > 0, "no multi-shard leaves found — replication unverified"


def test_quantile_clip_matches_reference_movingbuffer(rng):
    """Clip values for the first 100 steps must equal a python MovingBuffer
    trace (ref ``TrainUtil.py:12-25``: deque grown from one seed entry of
    40, quantile BEFORE appending the observed norm)."""
    from collections import deque

    from transkun_tpu.train.optim import quantile_clip, quantile_clip_init

    state = quantile_clip_init(init_value=40.0, maxlen=50)
    values = deque(maxlen=50)
    values.append(40.0)

    norms = rng.uniform(0.1, 80.0, size=100)
    clip_jit = jax.jit(lambda g, s: quantile_clip(g, s, 0.8))
    for v in norms:
        grads = {"w": jnp.asarray([float(v)])}  # norm == v
        clipped, state, gnorm, clip_value = clip_jit(grads, state)
        expected_clip = float(np.quantile(values, 0.8))
        np.testing.assert_allclose(float(clip_value), expected_clip, rtol=1e-6)
        np.testing.assert_allclose(float(gnorm), v, rtol=1e-6)
        expected_scale = min(1.0, expected_clip / (v + 1e-6))
        np.testing.assert_allclose(
            float(clipped["w"][0]), v * expected_scale, rtol=1e-5
        )
        values.append(float(v))


@pytest.mark.parametrize("n_frames", [64, 61])  # 61: T % Pallas block != 0
def test_fused_log_prob_matches_unfused(rng, n_frames):
    """The fused training path (alpha-layout padded score emission +
    pre-padded logZ) must equal the unfused einsum+transpose path, value and
    parameter gradients — including at frame counts that need padding."""
    from transkun_tpu.models.transkun import log_prob_padded

    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    frames, labels = _batch(2, rng)
    frames = frames[:, :, :n_frames]

    def loss(p, fused):
        logp = log_prob_padded(
            model.module, p, frames, labels, deterministic=True, fused=fused
        )
        return logp.sum(), logp

    (lf, logp_f), gf = jax.value_and_grad(loss, has_aux=True)(params, True)
    (lu, logp_u), gu = jax.value_and_grad(loss, has_aux=True)(params, False)
    np.testing.assert_allclose(np.asarray(logp_f), np.asarray(logp_u), atol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(gf)[0],
        jax.tree_util.tree_flatten_with_path(gu)[0],
    ):
        assert pa == pb
        # padded einsum entries change f32 reduction order: observed
        # grad diffs are ~1e-7 RELATIVE on magnitude-1e3 leaves
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_weight_decay_mask():
    from transkun_tpu.train import weight_decay_mask

    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)["params"]
    mask = weight_decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    decayed = {jax.tree_util.keystr(p): v for p, v in flat}
    assert not any(
        v for k, v in decayed.items() if "posEmbedBuilder" in k
    ), "pos embeds must not decay"
    assert not any(v for k, v in decayed.items() if k.endswith("['bias']"))
    assert any(v for k, v in decayed.items() if "mha" in k and "kernel" in k)


def test_nonfinite_step_skips_update(rng):
    """A NaN batch must leave params/opt/clip state untouched (device-side
    guard in apply_update) and flag metrics["finite"]=False; the next good
    batch must then train normally."""
    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=2e-3, n_iter=1000, warmup_cutoff=0)
    step = make_train_step(model.module, opt)
    state = init_train_state(params, opt)
    frames, labels = _batch(2, rng)

    state, m = step(state, frames, labels, jax.random.PRNGKey(0))
    assert bool(m["finite"])
    snap = jax.device_get(state)

    bad = frames.at[0, 0, 0, 0].set(jnp.nan)
    state, m = step(state, bad, labels, jax.random.PRNGKey(1))
    assert not bool(m["finite"])
    after = jax.device_get(state)
    for a, b in zip(jax.tree.leaves(snap.params), jax.tree.leaves(after.params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(snap.opt_state), jax.tree.leaves(after.opt_state)
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(snap.clip_state), jax.tree.leaves(after.clip_state)
    ):
        np.testing.assert_array_equal(a, b)
    assert int(after.step) == int(snap.step) + 1  # step counter still advances

    state, m = step(state, frames, labels, jax.random.PRNGKey(2))
    assert bool(m["finite"]) and np.isfinite(float(m["loss"]))


def test_dense_chunk_auto_grows_and_trains(rng):
    """A pedal-storm chunk (> max_events on one track) must not kill the run:
    encode_batch buckets K up to the next multiple of 16 and the train step
    accepts the grown shapes (ref behavior: crash-free on real MAESTRO)."""
    import warnings

    conf = ModelConfig.from_dict(TINY)
    model = TransKun(conf)
    params = model.init(jax.random.PRNGKey(0), n_frames=64)
    opt = make_optimizer(params["params"], max_lr=2e-3, n_iter=1000, warmup_cutoff=0)
    step = make_train_step(model.module, opt)
    state = init_train_state(params, opt)

    # 20 pedal events in 1 s on the sustain track (-64) > max_events=8
    storm = [Note(i * 0.05, i * 0.05 + 0.02, -64, 127) for i in range(20)]
    notes = [storm + [Note(0.1, 0.4, 60, 80)], [Note(0.2, 0.5, 64, 90)]]
    audio = (rng.normal(size=(2, 4000, 1)) * 0.1).astype(np.float32)
    x = jnp.swapaxes(jnp.asarray(audio), -1, -2)
    frames = frontend.make_frame(x, 64, 256)
    pitches = [-64, -67] + list(range(21, 109))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = encode_batch(notes, 64 / 4000, pitches, 8)
    assert any("growing K" in str(w.message) for w in caught)
    assert labels.begins.shape[2] == 32  # 20 -> next multiple of 16 is 32
    assert labels.mask[0, 0].sum() == 20

    state, m = step(
        state, frames, tuple(jnp.asarray(a) for a in labels.astuple()),
        jax.random.PRNGKey(0),
    )
    assert bool(m["finite"]) and np.isfinite(float(m["loss"]))
