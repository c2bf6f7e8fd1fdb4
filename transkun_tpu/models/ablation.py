"""V1 ablation model (NeurIPS-2021 system): CNN + BiGRU + pairwise-feature
scorer.  Counterpart of ``transkun/Model_ablation.py`` + ``Layers_ablation.py``.

Kept for capability parity with the reference, where either model generation
can be instantiated from a conf file.  TPU notes: BatchNorm becomes flax
BatchNorm with an optional mesh axis name — synchronized batch statistics
across data-parallel shards are a ``psum`` inside the train step (the
reference needs a hand-written autograd SyncBN for this, ``SyncBN.py:12-143``);
the pairwise scorer evaluates the full lower triangle in row blocks under
rematerialization instead of gathering tril indices in chunks.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import frontend
from .config import ModelConfig as _BaseConfig
from .transkun import MelFrontend, target_midi_pitches

Array = jax.Array


class AblationConfig:
    """Mirrors the reference V1 ``ModelConfig`` (``Model_ablation.py:16-62``)."""

    def __init__(self):
        self.f_min = 30
        self.f_max = 8000
        self.n_mels = 229
        self.hopSize = 1024
        self.windowSize = 4096
        self.fs = 44100
        self.nExtraWins = 5
        self.preConvSpec = [
            {"outputSize": 48, "hiddenSize": 48, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
            {"outputSize": 64, "hiddenSize": 64, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
            {"outputSize": 92, "hiddenSize": 92, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
            {"outputSize": 128, "hiddenSize": 128, "kernelSize": 3, "stride": (1, 2), "dropoutProb": 0.0},
        ]
        self.ctxSize = 512
        self.nLayersCtx = 2
        self.rnnHiddenSize = 256
        self.lengthScaling = True
        self.postConv = True
        self.disableUnitary = False
        self.pitchEmbedSize = 256
        self.scoreDropoutProb = 0.1
        self.contextDropoutProb = 0.1
        self.velocityDropoutProb = 0.1
        self.refinedOFDropoutProb = 0.1
        # segment processing defaults (shared conventions with V2)
        self.segmentHopSizeInSecond = 8
        self.segmentSizeInSecond = 16

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "AblationConfig":
        conf = cls()
        for k, v in d.items():
            setattr(conf, k, v)
        return conf

    def __repr__(self):
        return repr(self.__dict__)


Config = AblationConfig


class SyncBatchNorm(nn.Module):
    """BatchNorm whose train-mode batch statistics are globally summed across
    the ``axis_name`` mesh axis — the TPU-native counterpart of the
    reference's autograd-enabled all_reduce SyncBN (``SyncBN.py:112-143``).

    Exact reference semantics: normalization uses the globally-pooled BIASED
    variance ``E[x^2]-E[x]^2``; running stats update with momentum 0.01 and
    the reference's ``uvar = ssum/(n-1) - mean^2`` (``SyncBN.py:131-136`` —
    note this differs from the textbook unbiased variance by a factor
    ``n/(n-1)`` on the mean^2 term; reproduced as-is for parity).  The psum
    of (sum, ssum) differentiates through, like the reference's
    ``AllReduce_autograd_enabled``.  Variable names (params scale/bias,
    batch_stats mean/var) match flax BatchNorm so converted torch
    checkpoints load unchanged.
    """

    momentum: float = 0.01
    eps: float = 1e-5
    axis_name: Optional[str] = None
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            s = jnp.sum(xf, axis=red)
            ss = jnp.sum(xf * xf, axis=red)
            n = jnp.float32(xf.size // c)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
                n = jax.lax.psum(n, self.axis_name)
            mean = s / n
            var = ss / n - mean * mean
            if not self.is_initializing():
                uvar = ss / (n - 1.0) - mean * mean
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * uvar
        inv_std = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv_std * scale + bias
        return y.astype(x.dtype)


class ConvBlock(nn.Module):
    """Conv-BN-GELU x2 + average-pool downsample
    (ref ``ConvBlock_ablation``, ``Layers_ablation.py:11-71``)."""

    output_size: int
    hidden_size: int
    kernel_size: int = 3
    stride: Tuple[int, int] = (1, 1)
    dropout: float = 0.0
    bn_axis_name: Optional[str] = None  # set to the mesh axis for SyncBN

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # x: [N, T, F, C]
        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        bn = lambda name: SyncBatchNorm(
            use_running_average=not train,
            axis_name=self.bn_axis_name if train else None,
            name=name,
        )
        z = nn.Conv(self.hidden_size, (k, k), padding=pad, name="conv1")(x)
        z = bn("bn1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Conv(self.output_size, (k, k), padding=pad, name="conv2")(z)
        z = bn("bn2")(z)
        z = nn.gelu(z, approximate=False)
        if tuple(self.stride) != (1, 1):
            z = nn.avg_pool(z, tuple(self.stride), strides=tuple(self.stride))
        return z


class BiGRU(nn.Module):
    """2-layer bidirectional GRU + output projection
    (ref ``SimpleRNN``, ``Layers_ablation.py:73-91``)."""

    hidden_size: int
    output_size: int
    n_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # x: [N, T, C] (batch-major; the reference runs time-major)
        h = x
        for layer in range(self.n_layers):
            # cells are named explicitly: RNN is a transparent wrapper, so
            # cell params land directly in this module's scope
            fwd = nn.RNN(nn.GRUCell(self.hidden_size, name=f"gru{layer}_fwd"))(h)
            bwd = nn.RNN(
                nn.GRUCell(self.hidden_size, name=f"gru{layer}_bwd"),
                reverse=True, keep_order=True,
            )(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
            if layer < self.n_layers - 1:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.output_size, name="outProj")(h)


class ScoreMatrixPostProcessor(nn.Module):
    """2-D conv over the [T, T] score image (ref ``Layers_ablation.py:94-114``)."""

    n_target: int
    n_hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, s: Array, deterministic: bool = True) -> Array:
        # s: [nEnd, nBegin, N, P] -> image [N, nEnd, nBegin, P]
        img = jnp.transpose(s, (2, 0, 1, 3))
        img = nn.Conv(self.n_hidden, (3, 3), padding=((2, 2), (2, 2)), name="conv1")(img)
        img = nn.gelu(img, approximate=False)
        img = nn.Dropout(self.dropout)(img, deterministic=deterministic)
        img = nn.Conv(self.n_target, (3, 3), padding="VALID", name="conv2")(img)
        return jnp.transpose(img, (1, 2, 0, 3))


class PairwiseFeatureBatch(nn.Module):
    """Score every (begin, end) pair from endpoint features + span moment
    statistics through a 3-layer MLP (ref ``Layers_ablation.py:116-241``).

    Runs the full lower triangle in row blocks under remat — regular compute
    that the MXU tiles, instead of the reference's chunked index gathers.
    """

    input_size: int
    output_size: int
    dropout: float = 0.0
    length_scaling: bool = True
    post_conv: bool = True
    disable_unitary: bool = False
    hidden_size: Optional[int] = None
    row_block: int = 16

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Tuple[Array, Array]:
        # x: [T, N, C] (time-major like the reference)
        t, n, c = x.shape
        hidden = self.hidden_size or self.output_size * 4

        def mlp(name):
            layers = (
                nn.Dense(hidden, name=f"{name}_0"),
                nn.Dense(hidden, name=f"{name}_1"),
                nn.Dense(self.output_size, name=f"{name}_2"),
            )
            drop = nn.Dropout(self.dropout, name=f"{name}_d")

            def f(inp):
                h = layers[0](inp)
                h = nn.gelu(h, approximate=False)
                h = drop(h, deterministic=deterministic)
                h = layers[1](h)
                h = nn.gelu(h, approximate=False)
                h = drop(h, deterministic=deterministic)
                return layers[2](h)

            return f

        score_map = mlp("scoreMap")
        skip_map = mlp("scoreMapSkip")

        pad = jnp.zeros((1, n, c), x.dtype)
        x_cum = jnp.cumsum(jnp.concatenate([pad, x], 0), axis=0)
        x2_cum = jnp.cumsum(jnp.concatenate([pad, x**2], 0), axis=0)
        x3_cum = jnp.cumsum(jnp.concatenate([pad, x**3], 0), axis=0)

        idx_b = jnp.arange(t)

        def row_block(a0):
            # rows of ends [a0, a0+K): features for all begins
            idx_a = a0 + jnp.arange(self.row_block)[:, None]  # [K, 1]
            idx_a = jnp.minimum(idx_a, t - 1)
            cur_a = x[idx_a[:, 0]][:, None]  # [K, 1, N, C]
            cur_b = x[None, :, :, :]  # [1, T, N, C]
            # upper-triangle (b > a) spans are masked out below, but their
            # length must stay positive: a 0/negative divisor makes inf/NaN
            # that the tril-where cannot stop in the BACKWARD pass
            length = (idx_a - idx_b[None, :] + 1).astype(x.dtype)[:, :, None, None]
            length = jnp.maximum(length, 1.0)
            m1 = (x_cum[idx_a[:, 0] + 1][:, None] - x_cum[None, :t]) / length
            m2 = (x2_cum[idx_a[:, 0] + 1][:, None] - x2_cum[None, :t]) / length
            m3 = (x3_cum[idx_a[:, 0] + 1][:, None] - x3_cum[None, :t]) / length
            inp = jnp.concatenate(
                [
                    jnp.broadcast_to(cur_a, (self.row_block, t, n, c)),
                    jnp.broadcast_to(cur_b, (self.row_block, t, n, c)),
                    cur_a * cur_b,
                    m1,
                    m2,
                    m3,
                ],
                axis=-1,
            )
            return score_map(inp)  # [K, T, N, P]

        n_blocks = -(-t // self.row_block)
        blocks = []
        for b in range(n_blocks):
            # NOTE: rematerialization is handled at the encoder level for the
            # V2 model; here plain blocks keep linen initialization legal
            blocks.append(row_block(b * self.row_block))
        s = jnp.concatenate(blocks, axis=0)[:t]  # [T(end), T(begin), N, P]
        tril = jnp.tril(jnp.ones((t, t), bool))[:, :, None, None]
        s = jnp.where(tril, s, 0.0)

        if self.post_conv:
            s = ScoreMatrixPostProcessor(
                self.output_size, self.output_size * 3, self.dropout, name="post"
            )(s, deterministic)

        if self.length_scaling:
            len_ba = jnp.clip(
                jnp.abs(idx_b[:, None] - idx_b[None, :]).astype(s.dtype), 1, None
            )
            s = len_ba[:, :, None, None] * s

        skip_inp = jnp.concatenate([x[:-1], x[1:], x[:-1] * x[1:]], axis=-1)
        s_skip = skip_map(skip_inp)  # [T-1, N, P]
        if self.disable_unitary:
            s_skip = s_skip * 0
        return s, s_skip


class TransKunAblationModule(nn.Module):
    """On-device part of the V1 model (ref ``Model_ablation.py:118-269``)."""

    conf: Any
    compute_dtype: Any = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        conf = self.conf
        self.frontend = MelFrontend(conf, self.compute_dtype)
        self.preLayers = [
            ConvBlock(
                output_size=s["outputSize"],
                hidden_size=s["hiddenSize"],
                kernel_size=s["kernelSize"],
                stride=tuple(s["stride"]) if not isinstance(s["stride"], int) else (s["stride"],) * 2,
                dropout=s.get("dropoutProb", 0.0),
                bn_axis_name=self.bn_axis_name,
                name=f"preLayer_{i}",
            )
            for i, s in enumerate(conf.preConvSpec)
        ]
        n_entry_out = conf.n_mels
        for s in conf.preConvSpec:
            st = s["stride"]
            st = (st, st) if isinstance(st, int) else st
            n_entry_out = n_entry_out // st[1]
        self.inputProj = nn.Dense(conf.ctxSize, name="inputProj")
        self.contextModel = BiGRU(
            conf.rnnHiddenSize, conf.ctxSize, conf.nLayersCtx,
            conf.contextDropoutProb,
        )
        self.pairwiseScore = PairwiseFeatureBatch(
            conf.ctxSize,
            len(target_midi_pitches()),
            dropout=conf.scoreDropoutProb,
            length_scaling=getattr(conf, "lengthScaling", True),
            post_conv=conf.postConv,
            disable_unitary=getattr(conf, "disableUnitary", False),
        )
        self.pitchEmbedding = nn.Embed(
            len(target_midi_pitches()), conf.pitchEmbedSize
        )

        def head(name, out, drop, hidden2):
            return _Head3(out_size=out, dropout=drop, hidden2=hidden2, name=name)

        self.velocityPredictor = head("velocityPredictor", 128, conf.velocityDropoutProb, 512)
        self.refinedOFPredictor = head("refinedOFPredictor", 2, conf.refinedOFDropoutProb, 128)

    def process_frames(self, frames: Array, deterministic: bool = True, train: bool = False):
        features = self.frontend(frames)  # [N, T, M, nWin]
        h = features
        for layer in self.preLayers:
            h = layer(h, train=train)
        n, t = h.shape[0], h.shape[1]
        # flatten (channel, freq) in that order (ref ``Model_ablation.py:239``
        # flattens the NCHW layout's [C, F] trailing axes)
        h = jnp.swapaxes(h, -1, -2).reshape(n, t, -1)
        ctx = self.inputProj(h)
        ctx = self.contextModel(ctx, deterministic)  # [N, T, ctxSize]
        s, s_skip = self.pairwiseScore(
            jnp.swapaxes(ctx, 0, 1), deterministic
        )  # [T,T,N,P], [T-1,N,P]
        s = s.reshape(t, t, -1)
        s_skip = s_skip.reshape(t - 1, -1)
        return s, s_skip, ctx

    def attributes(self, ctx_a: Array, ctx_b: Array, deterministic: bool = True):
        # ctx_*: [N, P, K, D]; V1 appends a learned pitch embedding and has a
        # 2-logit refined-OF head (no presence flags, ref ``:170-178,319-324``)
        p = ctx_a.shape[1]
        pe = self.pitchEmbedding(jnp.arange(p))[None, :, None, :]
        pe = jnp.broadcast_to(pe, ctx_a.shape[:3] + (pe.shape[-1],))
        x = jnp.concatenate([ctx_a, ctx_b, ctx_a * ctx_b, pe], axis=-1)
        vel = self.velocityPredictor(x, deterministic)
        of_value = self.refinedOFPredictor(x, deterministic)
        return vel, of_value

    def __call__(self, frames: Array, deterministic: bool = True):
        s, s_skip, ctx = self.process_frames(frames, deterministic)
        ctx4 = ctx[:, None, :1, :].repeat(len(target_midi_pitches()), axis=1)
        vel, ofv = self.attributes(ctx4, ctx4, deterministic)
        return s, s_skip, ctx, vel, ofv


class _Head3(nn.Module):
    """3-layer MLP head (ref ``Model_ablation.py:159-178``)."""

    out_size: int
    dropout: float
    hidden2: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(512, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden2, name="lin2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out_size, name="lin3")(x)


def log_prob_padded(
    module: "TransKunAblationModule",
    variables,
    frames: Array,
    labels: Tuple[Array, ...],
    rngs=None,
    deterministic: bool = True,
    train: bool = False,
) -> Tuple[Array, Any]:
    """V1 training objective: per-track log-probability [N, P] plus the
    mutated BatchNorm running stats (ref ``log_prob``,
    ``Model_ablation.py:271-364``), fully static-shaped.

    labels = (begins, ends, mask, velocity, refine, presence); V1 has no
    presence term (2-logit refined-OF head, ``Model_ablation.py:170-178``).
    With ``train=True`` BatchNorm uses batch statistics and returns updated
    running stats in the second element (the reference's SyncBN train mode,
    ``SyncBN.py:12-143``); otherwise the second element is ``{}``.
    """
    from ..data.labels import encode_batch  # noqa: F401  (doc parity)
    from ..ops import distributions as dist
    from ..ops import semicrf

    begins, ends, mask, velocity, refine, _presence = labels
    n, p, k = begins.shape
    if train:
        (s, s_skip, ctx), mut = module.apply(
            variables,
            frames,
            deterministic,
            True,
            method=TransKunAblationModule.process_frames,
            rngs=rngs,
            mutable=["batch_stats"],
        )
    else:
        s, s_skip, ctx = module.apply(
            variables,
            frames,
            deterministic,
            False,
            method=TransKunAblationModule.process_frames,
            rngs=rngs,
        )
        mut = {}
    path = semicrf.eval_path_padded(
        s, s_skip,
        begins.reshape(n * p, k), ends.reshape(n * p, k), mask.reshape(n * p, k),
    )
    logz = semicrf.log_z_best(s, s_skip)
    logp = (path - logz).reshape(n, p)

    # gather endpoint context without materializing [N,P,T,D]
    ctx_a = jnp.take_along_axis(ctx[:, None], begins[..., None], axis=2)
    ctx_b = jnp.take_along_axis(ctx[:, None], ends[..., None], axis=2)
    vel_logits, of_value = module.apply(
        variables, ctx_a, ctx_b, deterministic,
        method=TransKunAblationModule.attributes, rngs=rngs,
    )
    logp_vel = jnp.take_along_axis(
        jax.nn.log_softmax(vel_logits, axis=-1), velocity[..., None], axis=-1
    )[..., 0]
    refined = refine * 0.99 + 0.5
    logp_of = dist.continuous_bernoulli_log_prob(of_value, refined).sum(-1)
    attr = jnp.where(mask, logp_vel + logp_of, 0.0).sum(-1)
    return logp + attr, mut


class TransKunAblation:
    """Host-facing V1 model: log_prob / transcribe with the same segmentwise
    streaming machinery as V2 minus presence handling."""

    Config = AblationConfig

    def __init__(self, conf, compute_dtype=None):
        self.conf = conf
        self.fs = conf.fs
        self.hopSize = conf.hopSize
        self.windowSize = conf.windowSize
        self.segmentSizeInSecond = conf.segmentSizeInSecond
        self.segmentHopSizeInSecond = conf.segmentHopSizeInSecond
        self.targetMIDIPitch = target_midi_pitches()
        self.module = TransKunAblationModule(conf, compute_dtype)
        self._fns = {}

    def init(self, rng, n_frames: int = 44, n_channel: int = 1):
        frames = jnp.zeros((1, n_channel, n_frames, self.conf.windowSize))
        return self.module.init(
            {"params": rng, "dropout": jax.random.PRNGKey(0)}, frames, True
        )

    def param_count(self, params) -> float:
        return sum(x.size for x in jax.tree.leaves(params)) / 1e6

    def make_train_loss(self, axis_name: Optional[str] = None):
        """Loss for ``make_train_step``: V1 objective with train-mode
        BatchNorm.  ``axis_name`` names the dp mesh axis so batch statistics
        are pmean'd across shards inside the kernel — the TPU-native SyncBN
        (ref ``SyncBN.py:12-143``, engaged when distributed,
        ``Layers_ablation.py:22-27``)."""
        module = TransKunAblationModule(
            self.conf, self.module.compute_dtype, bn_axis_name=axis_name
        )

        def loss_fn(variables, frames, labels, key):
            return log_prob_padded(
                module, variables, frames, labels,
                rngs={"dropout": key}, deterministic=False, train=True,
            )

        return loss_fn

    def log_prob(self, params, audio_batch, notes_batch, max_events: int = 32,
                 rngs=None, deterministic: bool = True):
        from ..data.labels import encode_batch
        from ..ops import semicrf

        x = jnp.swapaxes(jnp.asarray(audio_batch), -1, -2)
        frames = frontend.make_frame(x, self.hopSize, self.windowSize)
        labels = encode_batch(
            notes_batch, self.hopSize / self.fs, self.targetMIDIPitch, max_events
        )
        begins, ends, mask, velocity, refine, presence = (
            jnp.asarray(a) for a in labels.astuple()
        )

        key = "logprob"
        if key not in self._fns:

            @jax.jit
            def fn(params, frames, begins, ends, mask, velocity, refine):
                n, p, k = begins.shape
                s, s_skip, ctx = self.module.apply(
                    params, frames, True, method=TransKunAblationModule.process_frames
                )
                path = semicrf.eval_path_padded(
                    s, s_skip,
                    begins.reshape(n * p, k), ends.reshape(n * p, k),
                    mask.reshape(n * p, k),
                )
                logz = semicrf.log_z_best(s, s_skip)
                logp = (path - logz).reshape(n, p)
                ctx4 = ctx[:, None, :, :].repeat(p, axis=1)
                ctx_a = jnp.take_along_axis(ctx4, begins[..., None], axis=2)
                ctx_b = jnp.take_along_axis(ctx4, ends[..., None], axis=2)
                vel_logits, of_value = self.module.apply(
                    params, ctx_a, ctx_b, True,
                    method=TransKunAblationModule.attributes,
                )
                from ..ops import distributions as dist

                logp_vel = jnp.take_along_axis(
                    jax.nn.log_softmax(vel_logits, axis=-1),
                    velocity[..., None], axis=-1,
                )[..., 0]
                refined = refine * 0.99 + 0.5
                logp_of = dist.continuous_bernoulli_log_prob(of_value, refined).sum(-1)
                attr = jnp.where(mask, logp_vel + logp_of, 0.0).sum(-1)
                return logp + attr

            self._fns[key] = fn
        return self._fns[key](params, frames, begins, ends, mask, velocity, refine)

    def transcribe_frames(self, params, frames, forced_start_pos=None,
                          velocity_criterion: str = "hamming",
                          onset_bound=None):
        """Segment decode, V1 semantics (ref ``Model_ablation.py:565-733``):
        no presence flags, lastP taken straight from the decoded path."""
        from ..data.note import Note
        from ..ops import distributions as dist
        from ..ops import semicrf

        n_batch = frames.shape[0]
        n_frame = frames.shape[-2]
        n_sym = len(self.targetMIDIPitch)

        key = "decode"
        if key not in self._fns:

            @jax.jit
            def fn(params, frames):
                s, s_skip, ctx = self.module.apply(
                    params, frames, True, method=TransKunAblationModule.process_frames
                )
                ptr, diag = semicrf.viterbi_backward_tables_best(s, s_skip)
                return ptr, diag, ctx

            self._fns[key] = fn
        ptr, diag, ctx = self._fns[key](params, frames)
        path = semicrf.backtrack_backward(
            np.asarray(ptr), np.asarray(diag), forced_start_pos
        )
        if onset_bound is not None:
            path = [[e for e in p if e[0] < onset_bound] for p in path]
        last_p = [p[-1][1] if p else 0 for p in path]
        intervals_batch = [path[i * n_sym : (i + 1) * n_sym] for i in range(n_batch)]
        if sum(len(p) for p in path) == 0:
            return [[] for _ in range(n_batch)], last_p

        kmax = max(len(p) for p in path)
        k = 8
        while k < kmax:
            k *= 2
        begins = np.zeros((n_batch, n_sym, k), np.int32)
        ends = np.zeros((n_batch, n_sym, k), np.int32)
        for i in range(n_batch):
            for j in range(n_sym):
                for e_idx, (b, e) in enumerate(intervals_batch[i][j]):
                    begins[i, j, e_idx] = b
                    ends[i, j, e_idx] = e

        akey = ("attr", k)
        if akey not in self._fns:

            @jax.jit
            def afn(params, ctx, begins, ends):
                p = begins.shape[1]
                ctx4 = ctx[:, None, :, :].repeat(p, axis=1)
                ctx_a = jnp.take_along_axis(ctx4, begins[..., None], axis=2)
                ctx_b = jnp.take_along_axis(ctx4, ends[..., None], axis=2)
                vel_logits, of_value = self.module.apply(
                    params, ctx_a, ctx_b, True,
                    method=TransKunAblationModule.attributes,
                )
                velocity = jnp.argmax(vel_logits, axis=-1)
                of = jnp.clip(
                    (dist.continuous_bernoulli_mean(of_value) - 0.5) / 0.99,
                    -0.5, 0.5,
                )
                return velocity, of

            self._fns[akey] = afn
        velocity, of_value = self._fns[akey](
            params, ctx, jnp.asarray(begins), jnp.asarray(ends)
        )
        velocity = np.asarray(velocity)
        of_value = np.asarray(of_value, np.float64)

        frame_dur = self.hopSize / self.fs
        notes = [[] for _ in range(n_batch)]
        for i in range(n_batch):
            for j, event_type in enumerate(self.targetMIDIPitch):
                last_end = 0.0
                for e_idx, interval in enumerate(intervals_batch[i][j]):
                    off = of_value[i, j, e_idx]
                    start = (interval[0] + off[0]) * frame_dur
                    end = (interval[1] + off[1]) * frame_dur
                    start = max(start, last_end)
                    end = max(end, start + 1e-8)
                    last_end = end
                    notes[i].append(
                        Note(start, end, event_type, int(velocity[i, j, e_idx]))
                    )
            notes[i].sort(key=lambda x: (x.start, x.end, x.pitch))
        return notes, last_p

    def compute_stats_mireval(self, params, audio_batch, notes_batch):
        """Note+offset counts via full decode (ref ``Model_ablation.py:366-412``)."""
        from ..eval.evaluation import compare_transcription

        x = jnp.swapaxes(jnp.asarray(audio_batch), -1, -2)
        frames = frontend.make_frame(x, self.hopSize, self.windowSize)
        notes_est, _ = self.transcribe_frames(params, frames)
        n_gt = n_est = n_correct = 0.0
        for est, gt in zip(notes_est, notes_batch):
            metrics = compare_transcription(est, gt)
            _, r, _, _ = metrics["note+offset"]
            n_gt += metrics["nGT"]
            n_est += metrics["nEst"]
            n_correct += r * metrics["nGT"]
        return {"nGT": n_gt, "nEst": n_est, "nCorrect": n_correct}

    def compute_stats(self, params, audio_batch, notes_batch):
        """Decode-vs-GT bracket and framewise counts (ref
        ``Model_ablation.py:420-...``, same structure as V2 minus the
        presence terms)."""
        from ..data.labels import prepare_intervals
        from ..eval.evaluation import compare_bracket, compare_framewise
        from ..ops import semicrf

        x = jnp.swapaxes(jnp.asarray(audio_batch), -1, -2)
        frames = frontend.make_frame(x, self.hopSize, self.windowSize)
        ptr, diag, _ = self._fns["decode"](params, frames)
        path = semicrf.backtrack_backward(np.asarray(ptr), np.asarray(diag))
        flat_gt = []
        for notes in notes_batch:
            data = prepare_intervals(
                notes, self.hopSize / self.fs, self.targetMIDIPitch
            )
            flat_gt.extend(data["intervals"])
        stats = [compare_bracket(a, b) for a, b in zip(path, flat_gt)]
        fw = [compare_framewise(a, b) for a, b in zip(path, flat_gt)]
        return {
            "nGT": sum(s[0] for s in stats),
            "nEst": sum(s[1] for s in stats),
            "nCorrect": sum(s[2] for s in stats),
            "nGTFramewise": sum(s[0] for s in fw),
            "nEstFramewise": sum(s[1] for s in fw),
            "nCorrectFramewise": sum(s[2] for s in fw),
            "seVelocityForced": 0.0,
            "seOFForced": 0.0,
        }

    def transcribe(self, params, x, step_in_second: float = 10,
                   segment_size_in_second: float = 20,
                   discard_second_half: bool = False):
        """V1 streaming transcription (ref ``Model_ablation.py:735-816``):
        segmentwise decode with forcedStartPos stitching, no event merging."""
        from ..data.note import resolve_overlapping

        x = np.asarray(x).T
        pad_time_begin = segment_size_in_second - step_in_second
        pad = math.ceil(pad_time_begin * self.fs)
        x = np.pad(x, ((0, 0), (pad, pad)))
        n_sample = x.shape[-1]

        events_all = []
        start_frame_idx = math.floor(pad_time_begin * self.fs / self.hopSize)
        start_pos = [start_frame_idx] * len(self.targetMIDIPitch)
        step_size = math.ceil(step_in_second * self.fs / self.hopSize) * self.hopSize
        segment_size = math.ceil(segment_size_in_second * self.fs)

        for i in range(0, n_sample, step_size):
            j = min(i + segment_size, n_sample)
            begin_time = i / self.fs - pad_time_begin
            # the reference decodes SHORTER final segments rather than
            # zero-padding them (``Model_ablation.py:763-766``): padding is
            # not equivalent — the backward DP values at real frames include
            # contributions from pad frames, which can change the decoded
            # path inside the real region.  jit re-specializes per tail
            # shape (at most segment/step distinct tail lengths per piece).
            cur = x[:, i:j]
            frames = frontend.make_frame(
                jnp.asarray(cur), self.hopSize, self.windowSize
            )[None]
            onset_bound = step_size if discard_second_half else None
            cur_events, last_p = self.transcribe_frames(
                params, frames, forced_start_pos=start_pos,
                velocity_criterion="hamming", onset_bound=onset_bound,
            )
            cur_events = cur_events[0]
            start_pos = [max(k - int(step_size / self.hopSize), 0) for k in last_p]
            for e in cur_events:
                e.start += begin_time
                e.end += begin_time
                e.start = max(e.start, 0)
                e.end = max(e.end, e.start + 1e-5)
            events_all.extend(cur_events)

        return resolve_overlapping(events_all)
