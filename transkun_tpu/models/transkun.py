"""TransKun V2: transformer + interval scorer + semi-CRF piano transcription.

TPU-first counterpart of the reference model (``transkun/ModelTransformer.py``).
Design: one pure flax module computes frames -> mel -> backbone -> scorer on
device; the semi-CRF loss/decode are pure functions from ``ops.semicrf``; all
training/inference device programs are static-shaped so each segment size
compiles exactly once.  Host Python only prepares labels, walks Viterbi
pointers and assembles MIDI events.
"""

from __future__ import annotations

import math
from collections import defaultdict
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.labels import PaddedLabels, encode_batch, prepare_intervals
from ..data.note import Note, resolve_overlapping
from ..ops import distributions as dist
from ..ops import frontend, semicrf
from .backbone import Backbone
from .config import ModelConfig
from .layers import ScaledInnerProductIntervalScorer

Array = jax.Array

Config = ModelConfig


def target_midi_pitches(_conf: ModelConfig = None) -> List[int]:
    """Event tracks: sustain (-64) and una-corda (-67) pedals + piano keys
    21..108 -> 90 tracks (ref ``ModelTransformer.py:97``)."""
    return [-64, -67] + list(range(21, 109))


class MelFrontend(nn.Module):
    """Gain-normalized multi-window log-mel features (GEMM-native DFT).

    Holds the learnable Gaussian window parameters; filterbank/DFT matrices
    are host constants folded into the compiled program.
    """

    conf: ModelConfig
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, frames: Array) -> Array:
        # frames: [N, C, T, W] -> [N, T, n_mels, nWins]
        conf = self.conf
        # gain normalization over everything but the batch axis
        # (ref ``ModelTransformer.py:159-161``; std is the unbiased estimator)
        mean = jnp.mean(frames, axis=(1, 2, 3), keepdims=True)
        n_el = frames.shape[1] * frames.shape[2] * frames.shape[3]
        var = jnp.sum((frames - mean) ** 2, axis=(1, 2, 3), keepdims=True) / max(
            n_el - 1, 1
        )
        frames = (frames - mean) / (jnp.sqrt(var) + 1e-8)

        init = frontend.gaussian_windows_init(conf.nExtraWins)
        sigma = self.param("win_sigma", lambda k: jnp.asarray(init["sigma"]))
        center = self.param("win_center", lambda k: jnp.asarray(init["center"]))
        wins = jnp.concatenate(
            [
                frontend.hann_window(conf.windowSize)[None],
                frontend.gaussian_windows(sigma, center, conf.windowSize),
            ],
            axis=0,
        )
        fbank = frontend.melscale_fbanks(
            conf.windowSize // 2 + 1, conf.f_min, conf.f_max, conf.n_mels, conf.fs
        )
        cos_m, sin_m, fb_band = frontend.dft_mel_matrices(conf.windowSize, fbank)
        mel = frontend.mel_spectrum_gemm(
            frames,
            wins,
            jnp.asarray(cos_m),
            jnp.asarray(sin_m),
            jnp.asarray(fb_band),
            log=True,
            to_mono=True,
            compute_dtype=self.compute_dtype,
        )  # [N, 1, T, M, nWins]
        return mel[:, 0]


class MLPHead(nn.Module):
    hidden: int
    out: int
    dropout: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dense(self.hidden, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out, name="lin2")(x)


class TransKunModule(nn.Module):
    """The pure on-device part of the model."""

    conf: ModelConfig
    compute_dtype: Any = None

    def setup(self):
        conf = self.conf
        self.frontend = MelFrontend(conf, self.compute_dtype)
        self.backbone = Backbone(
            input_size=conf.nExtraWins + 1,
            base_size=conf.baseSize,
            pos_embed_init_gamma=conf.posEmbedInitGamma,
            n_head=conf.nHead,
            hidden_factor=conf.hiddenFactor,
            hidden_factor_attn=conf.hiddenFactorAttn,
            expansion_factor=conf.scoringExpansionFactor,
            dropout=conf.contextDropoutProb,
            n_layers=conf.nLayers,
            enabled_attn=tuple(conf.enabledAttn),
            use_gradient_checkpoint=conf.useGradientCheckpoint,
            downsample_f=conf.downsampleF,
            upsample_proj_only=conf.upsampleProjOnly,
            dtype=self.compute_dtype,
        )
        if conf.useInnerProductScorer:
            self.scorer = ScaledInnerProductIntervalScorer(
                conf.baseSize * conf.scoringExpansionFactor,
                1,
                dropout=conf.scoreDropoutProb,
                score_dtype=self.compute_dtype,
            )
        else:
            # ablation fallback: project the stacked per-pitch contexts and
            # score with the V1 pairwise-MLP scorer (ref ``:107-109,207-211``)
            from .ablation import PairwiseFeatureBatch

            self.scorerProj = nn.Dense(512)
            self.scorer = PairwiseFeatureBatch(
                512, len(target_midi_pitches()), dropout=conf.scoreDropoutProb
            )
        self.velocityPredictor = MLPHead(
            conf.velocityPredictorHiddenSize, 128, conf.velocityDropoutProb
        )
        self.refinedOFPredictor = MLPHead(
            conf.refinedOFPredictorHiddenSize, 4, conf.refinedOFDropoutProb
        )

    # ---- sub-graphs -------------------------------------------------------

    def process_frames(
        self, frames: Array, deterministic: bool = True
    ) -> Tuple[Array, Array, Array]:
        """frames [N, C, T, W] -> (S [T,T,N*P], noise [T-1,N*P], ctx [N,P,T,D])
        (ref ``processFramesBatch``, ``ModelTransformer.py:151-225``)."""
        features = self.frontend(frames)  # [N, T, M, nWin]
        pitches = jnp.asarray(target_midi_pitches(), jnp.float32)
        ctx = self.backbone(features, pitches, deterministic)  # [N,P,T,D]
        if self.conf.useInnerProductScorer:
            s, noise = self.scorer(ctx)  # [T,T,N,P], [T-1,N,P]
        else:
            # [N,P,T,D] -> [T, N, P*D] -> projected pairwise scoring
            ctx_score = jnp.transpose(ctx, (2, 0, 1, 3)).reshape(
                ctx.shape[2], ctx.shape[0], -1
            )
            s, noise = self.scorer(self.scorerProj(ctx_score), deterministic)
        t = s.shape[0]
        s = s.reshape(t, t, -1)
        noise = noise.reshape(t - 1, -1)
        return s, noise, ctx

    def attributes(
        self, ctx_a: Array, ctx_b: Array, deterministic: bool = True
    ) -> Tuple[Array, Array, Array]:
        """Endpoint context pair -> (velocity logits [...,128],
        ofValue logits [...,2], ofPresence logits [...,2])."""
        x = jnp.concatenate([ctx_a, ctx_b, ctx_a * ctx_b], axis=-1)
        vel = self.velocityPredictor(x, deterministic)
        of = self.refinedOFPredictor(x, deterministic)
        of_value, of_presence = jnp.split(of, 2, axis=-1)
        return vel, of_value, of_presence

    def process_frames_decode(
        self, frames: Array, t_pad: int, p_pad: int, deterministic: bool = True
    ) -> Tuple[Array, Array, Array, Array]:
        """Decode-layout forward: (s_t [t_pad,t_pad,N*p_pad] transposed +
        NEG-padded for the Pallas Viterbi kernel, noise [t_pad, N*p_pad],
        diag [t_pad, N*p_pad] un-gated f32, ctx [N,P,T,D]).  Writes the score
        tensor exactly once (see ``ScaledInnerProductIntervalScorer.
        decode_scores``)."""
        features = self.frontend(frames)
        pitches = jnp.asarray(target_midi_pitches(), jnp.float32)
        ctx = self.backbone(features, pitches, deterministic)
        s_t, noise, diag = self.scorer.decode_scores(ctx, t_pad, p_pad)
        return s_t, noise, diag, ctx

    def process_frames_train(
        self, frames: Array, t_pad: int, p_pad: int, deterministic: bool = False
    ) -> Tuple[Array, Array, Array]:
        """Training-layout forward: (s_pad [t_pad,t_pad,N*p_pad] alpha-layout
        + NEG-padded for the Pallas logZ kernels, noise [t_pad, N*p_pad],
        ctx [N,P,T,D]).  Writes the score tensor exactly once (see
        ``ScaledInnerProductIntervalScorer.train_scores``)."""
        assert self.conf.useInnerProductScorer
        features = self.frontend(frames)
        pitches = jnp.asarray(target_midi_pitches(), jnp.float32)
        ctx = self.backbone(features, pitches, deterministic)
        s_pad, noise = self.scorer.train_scores(ctx, t_pad, p_pad)
        return s_pad, noise, ctx

    def boundary_offset_presence(self, ctx: Array, n_edge: int) -> Array:
        """Offset-presence bits for every interval ending in the last
        ``n_edge`` frames: [N, P, T, n_edge] bool, entry (b, j) = presence of
        an offset for interval (b, T-n_edge+j).

        Decoded on device so the host stitching chain (forcedStartPos /
        lastP, ref ``ModelTransformer.py:693-725``) never waits on a separate
        attribute round trip.  The first MLP layer is applied to the three
        input blocks separately so the [N,P,T,n_edge,3D] concatenation is
        never materialized."""
        d = ctx.shape[-1]
        ctx_e = ctx[:, :, ctx.shape[2] - n_edge :]  # [N, P, n_edge, D]
        head = self.variables["params"]["refinedOFPredictor"]
        k1, b1 = head["lin1"]["kernel"], head["lin1"]["bias"]
        k2, b2 = head["lin2"]["kernel"], head["lin2"]["bias"]
        ka, kb, kab = k1[:d], k1[d : 2 * d], k1[2 * d :]
        ha = ctx @ ka  # [N, P, T, H]
        hb = ctx_e @ kb  # [N, P, n_edge, H]
        outs = []
        for j in range(n_edge):
            h = ha + hb[:, :, j : j + 1] + (ctx * ctx_e[:, :, j : j + 1]) @ kab + b1
            h = jax.nn.gelu(h, approximate=False)
            of = h @ k2 + b2  # [N, P, T, 4]
            outs.append(of[..., 3] > 0)
        return jnp.stack(outs, axis=-1)  # [N, P, T, n_edge]

    def __call__(self, frames: Array, deterministic: bool = True):
        """Init path: touch every parameter."""
        s, noise, ctx = self.process_frames(frames, deterministic)
        vel, ofv, ofp = self.attributes(
            ctx[:, :, :1], ctx[:, :, :1], deterministic
        )
        return s, noise, ctx, vel, ofv, ofp


def _gather_ctx(ctx: Array, idx: Array) -> Array:
    """ctx [N,P,T,D], idx [N,P,K] -> [N,P,K,D]."""
    return jnp.take_along_axis(ctx, idx[..., None], axis=2)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _track_pad(n: int, p: int, lane: int = semicrf.PALLAS_LN) -> int:
    """Smallest p_pad >= p such that n * p_pad is a multiple of ``lane``
    (the Pallas kernels' lane-block size)."""
    step = lane // math.gcd(n, lane)
    return _pad_to(p, step)


def log_prob_padded(
    module: TransKunModule,
    params,
    frames: Array,
    labels: Tuple[Array, ...],
    rngs: Optional[dict] = None,
    deterministic: bool = True,
    fused: Optional[bool] = None,
) -> Array:
    """Training objective: per-track log-probability [N, P]
    (ref ``log_prob``, ``ModelTransformer.py:228-332``), fully static-shaped.

    labels = (begins, ends, mask, velocity, refine, presence), all [N, P, K*].

    With the inner-product scorer the score tensor is emitted directly in the
    padded alpha layout (``process_frames_train``) and fed to the pre-padded
    logZ path — one HBM write of the [T,T,NB] tensor instead of einsum +
    transpose + pad + flip-concat passes.  ``fused`` overrides the automatic
    routing (tests compare both paths).
    """
    begins, ends, mask, velocity, refine, presence = labels
    n, p, k = begins.shape
    if fused is None:
        fused = module.conf.useInnerProductScorer
    if fused:
        t = frames.shape[2]
        t_pad, p_pad = _pad_to(t, semicrf.PALLAS_KP), _track_pad(n, p)
        s_pad, noise_pad, ctx = module.apply(
            params,
            frames,
            t_pad,
            p_pad,
            deterministic,
            method=TransKunModule.process_frames_train,
            rngs=rngs,
        )
        pad_p = ((0, 0), (0, p_pad - p), (0, 0))
        b_p = jnp.pad(begins, pad_p).reshape(n * p_pad, k)
        e_p = jnp.pad(ends, pad_p).reshape(n * p_pad, k)
        m_p = jnp.pad(mask, pad_p).reshape(n * p_pad, k)
        path = semicrf.eval_path_padded(s_pad, noise_pad[:-1], b_p, e_p, m_p)
        logz = semicrf.log_z_padded_best(t, s_pad, noise_pad)
        logp = (path - logz).reshape(n, p_pad)[:, :p]
    else:
        s, noise, ctx = module.apply(
            params,
            frames,
            deterministic,
            method=TransKunModule.process_frames,
            rngs=rngs,
        )
        path = semicrf.eval_path_padded(
            s, noise, begins.reshape(n * p, k), ends.reshape(n * p, k),
            mask.reshape(n * p, k),
        )
        logz = semicrf.log_z_best(s, noise)
        logp = (path - logz).reshape(n, p)

    ctx_a = _gather_ctx(ctx, begins)
    ctx_b = _gather_ctx(ctx, ends)
    vel_logits, of_value, of_presence = module.apply(
        params,
        ctx_a,
        ctx_b,
        deterministic,
        method=TransKunModule.attributes,
        rngs=rngs,
    )
    logp_vel = jnp.take_along_axis(
        jax.nn.log_softmax(vel_logits, axis=-1), velocity[..., None], axis=-1
    )[..., 0]
    refined = refine * 0.99 + 0.5  # map [-0.5, 0.5] -> [0.005, 0.995]
    logp_of = dist.continuous_bernoulli_log_prob(of_value, refined).sum(-1)
    logp_presence = dist.bernoulli_log_prob(of_presence, presence).sum(-1)
    attr = jnp.where(mask, logp_vel + logp_of + logp_presence, 0.0).sum(-1)
    return logp + attr


def _quantize_link(
    x: np.ndarray, mode: Optional[bool], scale: float = 32768.0
) -> np.ndarray:
    """Pick the link dtype for a waveform ``[C, n]``: int16 when every sample
    is exactly int16/scale (halves link traffic, device dequantizes with the
    SAME scale for bit-exact reconstruction), else float32.  ``mode``:
    None = auto-detect, False = force f32, True = force (clipping) int16.

    ``scale`` is the normalization the float audio came from: 2^15 for
    ``read_audio`` (decode path, torchaudio convention), 32767 = iinfo.max
    for the training slicer (ref ``Data.py:416-419`` convention).

    The auto-detect runs as ONE blocked traversal (L2-resident blocks,
    early bailout): int16*scale roundtrips exactly in f32 for both scales,
    so rint(xs) == xs iff the block is int16-representable."""
    if x.dtype == np.int16:
        return x
    if mode is False:
        return x.astype(np.float32)
    if mode is True:
        return np.clip(
            np.round(x * x.dtype.type(scale)), -32768, 32767
        ).astype(np.int16)
    link16 = np.empty(x.shape, np.int16)
    blk = 1 << 19
    for lo in range(0, x.shape[-1], blk):
        xs = x[..., lo : lo + blk] * x.dtype.type(scale)
        xi = np.rint(xs)
        if (
            xi.max(initial=0.0) > 32767
            or xi.min(initial=0.0) < -32768  # -1.0 IS representable
            or not np.array_equal(xi, xs)
        ):
            return x.astype(np.float32)
        link16[..., lo : lo + blk] = xi
    return link16


class TransKun:
    """Host-facing model: owns the config and orchestrates device programs
    plus host decode/assembly.  Mirrors the reference class API."""

    Config = ModelConfig

    def __init__(self, conf: ModelConfig, compute_dtype: Any = None):
        self.conf = conf
        self.fs = conf.fs
        self.hopSize = conf.hopSize
        self.windowSize = conf.windowSize
        self.segmentSizeInSecond = conf.segmentSizeInSecond
        self.segmentHopSizeInSecond = conf.segmentHopSizeInSecond
        self.targetMIDIPitch = target_midi_pitches()
        self.module = TransKunModule(conf, compute_dtype)
        self._decode_fn = {}
        # strong refs to param trees closed over by cached decode programs:
        # keeps the id(params) cache key valid for the cache's lifetime
        self._bound_params = {}
        # per-device param replicas reused across transcribe_many calls
        self._replicated_params = {}
        self._zero_chunk = {}
        # streaming-decode capacities: per-track walk events and the
        # per-group compact transfer budget (overflow -> host-walk
        # fallback).  budget None = auto-scale with the group size.
        self.decode_k_max = 128
        self.decode_k_budget: Optional[int] = None
        # None = auto-detect int16-exact waveforms; False forces f32 link
        self.decode_link_int16: Optional[bool] = None
        # upload-chunk granularity in segment steps (must divide the group
        # size so the carve offset stays static); None = auto heuristic
        # balancing per-transfer link overhead against upload/compute overlap
        self.decode_chunk_steps: Optional[int] = None
        self._attr_fn = None
        self._logprob_fn = None

    # -- parameters ---------------------------------------------------------

    def init(self, rng: jax.Array, n_frames: int = 44, n_channel: int = 1):
        frames = jnp.zeros((1, n_channel, n_frames, self.conf.windowSize))
        return self.module.init(
            {"params": rng, "dropout": jax.random.PRNGKey(0)}, frames, True
        )

    def param_count(self, params) -> float:
        return sum(x.size for x in jax.tree.leaves(params)) / 1e6

    def make_train_loss(self, axis_name=None):
        """Loss for ``make_train_step`` (model-generic hook; V2 has no
        mutable collections, so ``axis_name`` is unused here — V1 uses it
        for SyncBN)."""

        def loss_fn(variables, frames, labels, key):
            logp = log_prob_padded(
                self.module, variables, frames, labels,
                rngs={"dropout": key}, deterministic=False,
            )
            return logp, {}

        return loss_fn

    # -- training -----------------------------------------------------------

    def log_prob(
        self,
        params,
        audio_batch: np.ndarray,
        notes_batch: Sequence[Sequence[Note]],
        max_events: int = 32,
        rngs: Optional[dict] = None,
        deterministic: bool = True,
    ) -> Array:
        """audio [N, nSample, C] + note lists -> per-track log-prob [N, P]."""
        x = jnp.swapaxes(jnp.asarray(audio_batch), -1, -2)  # [N, C, nSample]
        frames = frontend.make_frame(x, self.hopSize, self.windowSize)
        labels = encode_batch(
            notes_batch, self.hopSize / self.fs, self.targetMIDIPitch, max_events
        )
        if self._logprob_fn is None:
            self._logprob_fn = jax.jit(
                partial(log_prob_padded, self.module), static_argnames=("deterministic",)
            )
        return self._logprob_fn(
            params,
            frames,
            tuple(jnp.asarray(a) for a in labels.astuple()),
            rngs=rngs,
            deterministic=deterministic,
        )

    # -- training-time metrics ---------------------------------------------

    def compute_stats(self, params, audio_batch, notes_batch) -> Dict[str, float]:
        """Decode-vs-GT bracket + framewise counts and forced velocity/OF
        square errors (ref ``computeStats``, ``ModelTransformer.py:388-499``)."""
        from ..eval.evaluation import compare_bracket, compare_framewise

        x = jnp.swapaxes(jnp.asarray(audio_batch), -1, -2)
        frames = frontend.make_frame(x, self.hopSize, self.windowSize)
        n_batch = frames.shape[0]
        n_sym = len(self.targetMIDIPitch)

        ptr, diag, ctx = self._get_decode_fn()(params, frames)
        path = semicrf.backtrack_backward(np.asarray(ptr), np.asarray(diag))

        intervals_batch = []
        velocity_gt = []
        of_gt = []
        for notes in notes_batch:
            data = prepare_intervals(
                notes, self.hopSize / self.fs, self.targetMIDIPitch
            )
            intervals_batch.append(data["intervals"])
            velocity_gt.append([v for track in data["velocity"] for v in track])
            of_gt.append([r for track in data["endPointRefine"] for r in track])
        flat_gt = [t for b in intervals_batch for t in b]
        assert len(path) == len(flat_gt)

        stats_all = [compare_bracket(l1, l2) for l1, l2 in zip(path, flat_gt)]
        n_gt = sum(s[0] for s in stats_all)
        n_est = sum(s[1] for s in stats_all)
        n_correct = sum(s[2] for s in stats_all)
        fw = [compare_framewise(l1, l2) for l1, l2 in zip(path, flat_gt)]
        n_gt_fw = sum(s[0] for s in fw)
        n_est_fw = sum(s[1] for s in fw)
        n_correct_fw = sum(s[2] for s in fw)

        # forced attribute predictions on the GT intervals
        k = max(
            (len(t) for b in intervals_batch for t in b), default=1
        )
        k = max(k, 1)
        begins = np.zeros((n_batch, n_sym, k), np.int32)
        ends = np.zeros((n_batch, n_sym, k), np.int32)
        mask = np.zeros((n_batch, n_sym, k), bool)
        vel_arr = np.zeros((n_batch, n_sym, k), np.float64)
        of_arr = np.zeros((n_batch, n_sym, k, 2), np.float64)
        for i, b in enumerate(intervals_batch):
            vi = 0
            for j, track in enumerate(b):
                for e_idx, (bb, ee) in enumerate(track):
                    begins[i, j, e_idx] = bb
                    ends[i, j, e_idx] = ee
                    mask[i, j, e_idx] = True
                    vel_arr[i, j, e_idx] = velocity_gt[i][vi]
                    of_arr[i, j, e_idx] = of_gt[i][vi]
                    vi += 1
        velocity, of_value, _ = self._get_attr_fn()(
            params, ctx, jnp.asarray(begins), jnp.asarray(ends), criterion="mse"
        )
        velocity = np.asarray(velocity)
        of_value = np.asarray(of_value)
        se_velocity = float((((velocity - vel_arr) ** 2) * mask).sum())
        se_of = float((((of_value - of_arr) ** 2) * mask[..., None]).sum())

        return {
            "nGT": n_gt,
            "nEst": n_est,
            "nCorrect": n_correct,
            "nGTFramewise": n_gt_fw,
            "nEstFramewise": n_est_fw,
            "nCorrectFramewise": n_correct_fw,
            "seVelocityForced": se_velocity,
            "seOFForced": se_of,
        }

    def compute_stats_mireval(self, params, audio_batch, notes_batch):
        """Note+offset counts via full decode + matching (ref
        ``computeStatsMIREVAL``, ``ModelTransformer.py:334-380``)."""
        from ..eval.evaluation import compare_transcription

        x = jnp.swapaxes(jnp.asarray(audio_batch), -1, -2)
        frames = frontend.make_frame(x, self.hopSize, self.windowSize)
        notes_est, _ = self.transcribe_frames(params, frames)
        n_gt_total = n_est_total = n_correct_total = 0.0
        for est, gt in zip(notes_est, notes_batch):
            metrics = compare_transcription(est, gt)
            _, r, _, _ = metrics["note+offset"]
            n_gt_total += metrics["nGT"]
            n_est_total += metrics["nEst"]
            n_correct_total += r * metrics["nGT"]
        return {"nGT": n_gt_total, "nEst": n_est_total, "nCorrect": n_correct_total}

    # -- inference ----------------------------------------------------------

    def _get_decode_fn(self):
        """Fused per-segment program: frames -> Viterbi ptr tables + ctx.
        The [T,T,N*P] score tensor never leaves the device."""
        if "main" not in self._decode_fn:

            @jax.jit
            def fn(params, frames):
                s, noise, ctx = self.module.apply(
                    params, frames, True, method=TransKunModule.process_frames
                )
                ptr, diag = semicrf.viterbi_backward_tables_best(s, noise)
                return ptr, diag, ctx

            self._decode_fn["main"] = fn
        return self._decode_fn["main"]

    def _attr_readout(self, params, ctx, begins, ends, criterion):
        """Traceable attribute readout: gather endpoint contexts + heads +
        velocity criterion (ref ``transcribeFrames``, ``:590-645``)."""
        ctx_a = _gather_ctx(ctx, begins)
        ctx_b = _gather_ctx(ctx, ends)
        return self._attr_from_pairs(params, ctx_a, ctx_b, criterion)

    def _attr_from_pairs(self, params, ctx_a, ctx_b, criterion):
        """Attribute heads + velocity criterion on pre-gathered endpoint
        context pairs (any batch shape)."""
        vel_logits, of_value, of_presence = self.module.apply(
            params, ctx_a, ctx_b, True, method=TransKunModule.attributes
        )
        p_velocity = jax.nn.softmax(vel_logits, axis=-1)
        w = jnp.arange(128, dtype=p_velocity.dtype)
        if criterion == "mse":
            velocity = jnp.sum(p_velocity * w, axis=-1)
        elif criterion == "match":
            utility = (
                jnp.abs(w[:, None] - w[None, :]) < 0.1 * 128
            ).astype(p_velocity.dtype)
            velocity = jnp.argmax(p_velocity @ utility, axis=-1)
        elif criterion == "hamming":
            velocity = jnp.argmax(p_velocity, axis=-1)
        elif criterion == "mae":
            pcum = jnp.cumsum(p_velocity, axis=-1)
            w2 = jnp.arange(128, 0.0, -1.0)
            velocity = jnp.argmax(((pcum - 0.5) > 0) * w2, axis=-1)
        else:
            raise ValueError(f"Unrecognized criterion: {criterion}")
        of = jnp.clip(
            (dist.continuous_bernoulli_mean(of_value) - 0.5) / 0.99, -0.5, 0.5
        )
        return velocity, of, of_presence > 0

    def _get_attr_fn(self):
        """Jitted attribute readout; the velocity criterion runs on device so
        only [N,P,K]-sized results cross the host link."""
        if self._attr_fn is None:

            @partial(jax.jit, static_argnames=("criterion",))
            def fn(params, ctx, begins, ends, criterion="hamming"):
                return self._attr_readout(params, ctx, begins, ends, criterion)

            self._attr_fn = fn
        return self._attr_fn

    def transcribe_frames(
        self,
        params,
        frames: Array,
        forced_start_pos: Optional[Sequence[int]] = None,
        velocity_criterion: str = "hamming",
        onset_bound: Optional[int] = None,
        last_frame_idx: Optional[int] = None,
    ) -> Tuple[List[List[Note]], List[int]]:
        """Decode one batch of segments (ref ``transcribeFrames``,
        ``ModelTransformer.py:537-725``)."""
        n_batch = frames.shape[0]
        n_frame = frames.shape[-2]
        n_sym = len(self.targetMIDIPitch)
        if last_frame_idx is None:
            last_frame_idx = n_frame - 1

        ptr, diag, ctx = self._get_decode_fn()(params, frames)
        path = semicrf.backtrack_backward(
            np.asarray(ptr), np.asarray(diag), forced_start_pos
        )
        if onset_bound is not None:
            path = [[e for e in p if e[0] < onset_bound] for p in path]

        intervals_batch = [
            path[i * n_sym : (i + 1) * n_sym] for i in range(n_batch)
        ]
        return self._attr_and_assemble(
            params, ctx, intervals_batch, velocity_criterion, last_frame_idx
        )

    def _attr_and_assemble(
        self,
        params,
        ctx: Array,
        intervals_batch,
        velocity_criterion: str,
        last_frame_idx: int,
        after_attr_dispatch=None,
    ) -> Tuple[List[List[Note]], List[int]]:
        """Attribute readout + Note assembly for decoded interval tracks
        (the second half of ref ``transcribeFrames``).

        ``after_attr_dispatch`` runs right after the attribute program is
        enqueued but before its results are awaited — the streaming
        transcriber uses it to dispatch the NEXT group's decode so it queues
        behind the (tiny) attribute program instead of in front of it.
        """
        n_batch = len(intervals_batch)
        n_sym = len(self.targetMIDIPitch)
        n_intervals = sum(len(p) for b in intervals_batch for p in b)
        if n_intervals == 0:
            if after_attr_dispatch is not None:
                after_attr_dispatch()
            return [[] for _ in range(n_batch)], [0] * (n_batch * n_sym)

        # pad decoded intervals into [N, P, K] for the jitted attribute heads;
        # K is fixed (doubling only on overflow) so the head compiles once
        kmax = max(len(p) for b in intervals_batch for p in b)
        k = 64
        while k < kmax:
            k *= 2
        begins = np.zeros((n_batch, n_sym, k), np.int32)
        ends = np.zeros((n_batch, n_sym, k), np.int32)
        counts = np.zeros((n_batch, n_sym), np.int32)
        for i in range(n_batch):
            for j in range(n_sym):
                track = intervals_batch[i][j]
                counts[i, j] = len(track)
                for e_idx, (b, e) in enumerate(track):
                    begins[i, j, e_idx] = b
                    ends[i, j, e_idx] = e

        velocity, of_value, of_presence = self._get_attr_fn()(
            params, ctx, jnp.asarray(begins), jnp.asarray(ends),
            criterion=velocity_criterion,
        )
        if after_attr_dispatch is not None:
            after_attr_dispatch()
        for a in (velocity, of_value, of_presence):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        velocity = np.asarray(velocity)
        # float64 on host so tiny epsilons survive (the reference assembles
        # notes in Python floats)
        of_value = np.asarray(of_value, np.float64)
        of_presence = np.asarray(of_presence)
        mask = np.arange(k)[None, None, :] < counts[..., None]  # [N, P, K]
        return self._assemble_from_arrays(
            begins, ends, mask, velocity, of_value, of_presence, last_frame_idx
        )

    def _assemble_from_arrays(
        self,
        begins: np.ndarray,
        ends: np.ndarray,
        mask: np.ndarray,
        velocity: np.ndarray,
        of_value: np.ndarray,
        of_presence: np.ndarray,
        last_frame_idx: int,
        begin_times: Optional[np.ndarray] = None,
    ) -> Tuple[List[List[Note]], List[int]]:
        """Vectorized Note assembly from padded event arrays [N, P, K]
        (the tail of ref ``transcribeFrames``, ``:658-725``).  ``mask`` marks
        real events; masked slots must be prefix-shaped per track (walk
        order).  ``begin_times`` [N] additionally shifts each segment's
        events into piece coordinates (with the piece-level start>=0 /
        end>=start clamps of ref ``transcribe``) so the caller's per-event
        Python loop disappears."""
        n_batch, n_sym, k = begins.shape
        frame_dur = self.hopSize / self.fs
        kmax_used = int(mask.sum(axis=-1).max()) if mask.any() else 0
        start_raw = (begins.astype(np.float64) + of_value[..., 0]) * frame_dur
        end_raw = (ends.astype(np.float64) + of_value[..., 1]) * frame_dur
        # presence only disambiguates events touching the first/last frame of
        # the segment (ref ``:693-696``)
        has_onset = (begins > 0) | of_presence[..., 0]
        has_offset = (ends < last_frame_idx) | of_presence[..., 1]
        # monotonic clamps (ref ``:700-711``): start >= previous end,
        # end >= start + eps — a short K-length sweep of [N, P] vector ops
        # zeros (not empty): slots past kmax_used stay untouched and later
        # participate in whole-array arithmetic before masking
        start_c = np.zeros_like(start_raw)
        end_c = np.zeros_like(end_raw)
        last_end = np.zeros((n_batch, n_sym), np.float64)
        for e_idx in range(kmax_used):
            s = np.maximum(start_raw[..., e_idx], last_end)
            e = np.maximum(end_raw[..., e_idx], s + 1e-8)
            start_c[..., e_idx] = s
            end_c[..., e_idx] = e
            last_end = np.where(mask[..., e_idx], e, last_end)
        # lastP = end of the last offset-having event; decoded interval ends
        # are strictly increasing per track, so the max is the last
        last_p_arr = np.max(
            np.where(mask & has_offset, ends, 0), axis=-1, initial=0
        )
        if begin_times is not None:
            start_c = np.maximum(start_c + begin_times[:, None, None], 0.0)
            end_c = np.maximum(end_c + begin_times[:, None, None], start_c)

        pitches = np.asarray(self.targetMIDIPitch)
        notes: List[List[Note]] = []
        for i in range(n_batch):
            jj, kk = np.nonzero(mask[i])
            ss, ee = start_c[i][jj, kk], end_c[i][jj, kk]
            order = np.lexsort((pitches[jj], ee, ss))
            jj, kk = jj[order], kk[order]
            # column-wise tolist() then one zip: python-scalar conversion in
            # bulk, not one numpy scalar index per Note field
            notes.append(
                [
                    Note(start=s, end=e, pitch=p, velocity=v, hasOnset=on,
                         hasOffset=off)
                    for s, e, p, v, on, off in zip(
                        ss[order].tolist(),
                        ee[order].tolist(),
                        pitches[jj].tolist(),
                        # velocity stays int (argmax criteria) or float (mse
                        # expectation) as produced upstream
                        velocity[i][jj, kk].tolist(),
                        has_onset[i][jj, kk].tolist(),
                        has_offset[i][jj, kk].tolist(),
                    )
                ]
            )
        last_p = [int(v) for v in last_p_arr.reshape(-1)]
        return notes, last_p

    def _get_audio_decode_fn(self, last_frame_idx: int):
        """Fused per-group device program: raw segment audio -> frames -> mel
        -> backbone -> scorer -> Viterbi tables + boundary presence bits + ctx.
        Nothing larger than the audio itself crosses the host link."""
        key = ("audio_dec", last_frame_idx)
        if key not in self._decode_fn:

            @jax.jit
            def fn(params, seg_audio):  # [B, C, S]
                ptr, diag, bpres, ctx = self._decode_tables_traced(
                    params, seg_audio, last_frame_idx
                )
                # int16 halves the pointer-table transfer (values are frame
                # offsets in [-1, T), T << 32768)
                return ptr.astype(jnp.int16), diag, bpres, ctx

            self._decode_fn[key] = fn
        return self._decode_fn[key]

    def _decode_tables_traced(self, params, seg_audio, last_frame_idx: int):
        """Traceable: raw segment audio -> (ptr [t-1, N*P] i32, diag [t, N*P]
        bool, bpres [N,P,t,n_edge] bool, ctx [N,P,t,D])."""
        hop, win = self.hopSize, self.windowSize
        module = self.module
        n_sym = len(self.targetMIDIPitch)
        use_ip = self.conf.useInnerProductScorer

        if seg_audio.dtype == jnp.int16:  # link-compressed audio (transcribe)
            seg_audio = seg_audio.astype(jnp.float32) / 32768.0
        frames = frontend.make_frame(seg_audio, hop, win)
        n = frames.shape[0]
        t = frontend.num_frames(seg_audio.shape[-1], hop)
        if not use_ip:
            # pairwise-scorer fallback: generic (unfused) decode path
            s, noise, ctx = module.apply(
                params, frames, True,
                method=TransKunModule.process_frames,
            )
            ptr, diag = semicrf.viterbi_backward_tables_best(s, noise)
            n_edge = t - last_frame_idx
            bpres = module.apply(
                params, ctx, n_edge,
                method=TransKunModule.boundary_offset_presence,
            )
            return ptr, diag, bpres, ctx
        t_pad = _pad_to(t, semicrf.PALLAS_KP)
        p_pad = _track_pad(n, n_sym)
        s_t, noise, diag_raw, ctx = module.apply(
            params, frames, t_pad, p_pad, True,
            method=TransKunModule.process_frames_decode,
        )
        if semicrf._use_pallas():
            from ..ops import semicrf_pallas

            ptr_pad = semicrf_pallas.viterbi_backward_tables_padded(
                s_t, noise, diag_raw * (diag_raw > 0)
            )
        else:
            # test/CPU fallback: reconstruct the standard layout
            s_std = jnp.swapaxes(s_t, 0, 1)[:t, :t].reshape(
                t, t, n, p_pad
            )[..., :n_sym].reshape(t, t, n * n_sym).astype(jnp.float32)
            noise_std = jnp.zeros((t - 1, n * n_sym), jnp.float32)
            ptr_std, _ = semicrf.viterbi_backward_tables(s_std, noise_std)
            ptr_pad = jnp.zeros((t_pad, n * p_pad), jnp.int32)
            ptr_pad = ptr_pad.at[: t - 1].set(
                jnp.pad(
                    ptr_std.reshape(t - 1, n, n_sym),
                    ((0, 0), (0, 0), (0, p_pad - n_sym)),
                ).reshape(t - 1, n * p_pad)
            )
        ptr = (
            ptr_pad[: t - 1]
            .reshape(t - 1, n, p_pad)[:, :, :n_sym]
            .reshape(t - 1, n * n_sym)
        )
        diag = (
            (diag_raw > 0)[:t]
            .reshape(t, n, p_pad)[:, :, :n_sym]
            .reshape(t, n * n_sym)
        )
        n_edge = t - last_frame_idx
        bpres = module.apply(
            params, ctx, n_edge,
            method=TransKunModule.boundary_offset_presence,
        )
        return ptr, diag, bpres, ctx

    def _get_fused_chunk_fn(
        self,
        last_frame_idx: int,
        step_frames: int,
        segment_size: int,
        step_size: int,
        segment_batch: int,
        k_max: int = 128,
        k_budget: int = 8192,
        carve_off: int = 0,
        n_cover: int = 2,
        params=None,
    ):
        """Chunk-streaming variant of the fused group program: takes
        ``n_cover`` adjacent fixed-size audio chunks instead of pre-sliced
        segments, and carves the group's overlapping segment windows out of
        their device-side concatenation starting at the static sample offset
        ``carve_off`` (the group start's phase within its first covering
        chunk — constant across groups when the chunk length divides the
        group stride, so one compiled program serves the whole piece).

        This lets the caller upload the waveform chunk-by-chunk with async
        ``device_put`` while earlier groups compute — upload and compute
        overlap with ZERO duplicated bytes on the link (the 2x window overlap
        is materialized on device, not on the wire), and the zero padding
        around the piece never ships at all (those chunks resolve to a cached
        device-resident zeros array).

        When ``params`` is given, the returned callable takes
        ``(start_pos, *chunks)`` with the param tree CLOSED OVER: jit lifts
        closure arrays into the executable's constants once at trace time,
        so the per-group call skips the Python flatten of the ~10^2-leaf
        param dict — measurable on a 1-core host dispatching ~10 groups per
        piece.  The binding is keyed on the ids of the param LEAVES (a
        rebuilt dict around the same arrays cache-hits; any leaf swap is a
        new binding), kept LRU with a bounded size, and holds a strong
        reference to the leaves so no id can be recycled while cached."""
        geom = (
            "fused_chunk", last_frame_idx, step_frames, segment_size,
            step_size, segment_batch, k_max, k_budget, carve_off, n_cover,
        )
        if params is None:
            key = geom + (None,)
            leaves = None
        else:
            leaves = jax.tree_util.tree_leaves(params)
            key = geom + (tuple(map(id, leaves)),)
        if key in self._decode_fn:
            # LRU touch: transient bindings must not evict the hot one
            self._decode_fn[key] = self._decode_fn.pop(key)
        elif params is not None:
            # bounded bindings per geometry: multi-device serving holds one
            # per device (per-device replicated params), but callers that
            # rebuild their param arrays every call must not accumulate
            # executables — evict least-recently-used beyond a generous cap
            bound = [k for k in self._decode_fn if k[:-1] == geom and k[-1]]
            for stale in bound[: max(0, len(bound) - 15)]:
                del self._decode_fn[stale]
                self._bound_params.pop(stale, None)
        if key not in self._decode_fn:
            rel = np.arange(segment_batch, dtype=np.int32) * step_size
            # last window's right edge, relative to the first covering chunk
            cover = carve_off + (segment_batch - 1) * step_size + segment_size

            def body(p, start_pos, chunks, criterion, onset_bound):
                audio_cat = jnp.concatenate(list(chunks), axis=-1)[..., :cover]
                seg_audio = jax.vmap(
                    lambda s: jax.lax.dynamic_slice_in_dim(
                        audio_cat, s + carve_off, segment_size, axis=-1
                    )
                )(jnp.asarray(rel))
                return self._fused_group_traced(
                    p, seg_audio, start_pos, criterion, onset_bound,
                    last_frame_idx, step_frames, k_max, k_budget,
                )

            if params is None:

                @partial(jax.jit, static_argnames=("criterion", "onset_bound"))
                def fn(params, start_pos, *chunks, criterion="hamming",
                       onset_bound=-1):
                    return body(params, start_pos, chunks, criterion,
                                onset_bound)

            else:
                captured = params  # real closure var: jit lifts the leaves
                # into traced-once constants, NOT per-call arguments

                @partial(jax.jit, static_argnames=("criterion", "onset_bound"))
                def fn(start_pos, *chunks, criterion="hamming",
                       onset_bound=-1):
                    return body(captured, start_pos, chunks, criterion,
                                onset_bound)

                self._bound_params[key] = leaves

            self._decode_fn[key] = fn
        return self._decode_fn[key]

    def _fused_group_traced(
        self,
        params,
        seg_audio,
        start_pos,
        criterion: str,
        onset_bound: int,
        last_frame_idx: int,
        step_frames: int,
        k_max: int,
        k_budget: int,
    ):
        """Fully-fused streaming group program body: segment audio + the
        group's forcedStartPos -> compact per-event tensors + the NEXT
        group's forcedStartPos, all on device.

        The sequential stitching chain (pointer walk -> lastP -> next
        segment's start) runs as ``walk_backward_device`` scans chained
        INSIDE the program, so nothing but O(events) tensors ever crosses
        the host link and consecutive groups chain device-to-device — the
        TPU-first replacement for the reference's per-segment host loop
        (``ModelTransformer.py:758-791``).

        Decoded events are COMPACTED on device into a ``k_budget``-entry
        buffer (prefix-sum scatter) before the attribute heads run and
        before anything is fetched: the link carries ~100 KB per group
        instead of ~1 MB of [B, P, k_max]-padded tensors, and the attribute
        MLPs run on real events only.  ``count > k_budget`` (or a per-track
        walk overflow) raises the overflow flag; the caller then redoes the
        piece's remaining groups on the host-walk path with identical
        results — all already-dispatched fused groups still execute and are
        discarded, an accepted cost since auto-scaled budgets make overflow
        rare."""
        n_sym = len(self.targetMIDIPitch)
        ptr, diag, bpres, ctx = self._decode_tables_traced(
            params, seg_audio, last_frame_idx
        )
        n = seg_audio.shape[0]
        t = diag.shape[0]
        n_edge = bpres.shape[-1]
        k_range = jnp.arange(k_max, dtype=jnp.int32)

        seg_begins, seg_ends, seg_valid, seg_overflow = [], [], [], []
        start = start_pos.astype(jnp.int32)
        for gi in range(n):
            cols = slice(gi * n_sym, (gi + 1) * n_sym)
            b, e, cnt, ovf = semicrf.walk_backward_device(
                ptr[:, cols], diag[:, cols], start, k_max
            )
            valid = k_range[None, :] < cnt[:, None]
            if onset_bound >= 0:
                valid = valid & (b < onset_bound)
            # lastP: end of the last event whose offset is real —
            # interior, or presence-confirmed at the segment edge
            # (ref ``ModelTransformer.py:713-721``)
            bp_seg = bpres[gi]  # [P, T(begin), n_edge]
            bp_b = jnp.take_along_axis(bp_seg, b[:, :, None], axis=1)
            edge = jnp.clip(e - last_frame_idx, 0, n_edge - 1)
            bp = jnp.take_along_axis(bp_b, edge[:, :, None], axis=2)[
                ..., 0
            ]
            ok = (e < last_frame_idx) | bp
            # decoded ends are increasing per track -> max == last
            lastp = jnp.max(
                jnp.where(valid & ok, e, 0), axis=-1, initial=0
            )
            seg_begins.append(b)
            seg_ends.append(e)
            seg_valid.append(valid)
            seg_overflow.append(jnp.any(ovf))
            start = jnp.maximum(lastp - step_frames, 0)

        begins = jnp.stack(seg_begins)  # [n, P, K]
        ends = jnp.stack(seg_ends)
        valid = jnp.stack(seg_valid)
        overflow = jnp.any(jnp.stack(seg_overflow))

        # device-side compaction: scatter the valid events into a
        # fixed budget buffer by their prefix-sum position; invalid
        # slots collide harmlessly on the scratch row k_budget
        flatv = valid.reshape(-1)
        pos = jnp.cumsum(flatv.astype(jnp.int32)) - 1
        count = jnp.sum(flatv.astype(jnp.int32))
        slot = jnp.where(flatv, pos, k_budget)
        src = (
            jnp.full((k_budget + 1,), -1, jnp.int32)
            .at[slot]
            .set(jnp.arange(flatv.shape[0], dtype=jnp.int32))
        )
        cb = (
            jnp.zeros((k_budget + 1,), jnp.int32)
            .at[slot]
            .set(begins.reshape(-1))
        )
        ce = (
            jnp.zeros((k_budget + 1,), jnp.int32)
            .at[slot]
            .set(ends.reshape(-1))
        )
        # attribute heads on real events only: gather the endpoint
        # contexts straight from the compact indices
        row = jnp.maximum(src, 0) // k_max  # flat (segment, track)
        ctx_flat = ctx.reshape(n * n_sym, ctx.shape[2], ctx.shape[3])
        ctx_a = ctx_flat[row, cb]  # [k_budget+1, D]
        ctx_b = ctx_flat[row, ce]
        velocity, of, pres = self._attr_from_pairs(
            params, ctx_a, ctx_b, criterion
        )
        overflow = overflow | (count > k_budget)
        # pack the fetched payload tightly: the end-of-piece host fetch rides
        # a ~26 MB/s link, so every byte per budget slot is serial tail time.
        # src fits int16 whenever the flat (segment, track, k) index does;
        # argmax velocities are MIDI 0-127 -> uint8 (mse stays f32)
        if n * n_sym * k_max < 2**15:
            src = src.astype(jnp.int16)
        if velocity.dtype == jnp.int32:
            velocity = velocity.astype(jnp.uint8)
        return (
            src,
            cb.astype(jnp.int16),
            ce.astype(jnp.int16),
            velocity,
            of.astype(jnp.float32),
            pres,
            count,
            start,  # next group's forcedStartPos, stays on device
            overflow,
        )


    def _get_slice_fn(self, n_total: int, segment_size: int):
        key = ("slice", n_total, segment_size)
        if key not in self._decode_fn:

            @jax.jit
            def fn(audio, starts):  # audio [C, n_total], starts [B]
                return jax.vmap(
                    lambda s: jax.lax.dynamic_slice_in_dim(
                        audio, s, segment_size, axis=-1
                    )
                )(starts)

            self._decode_fn[key] = fn
        return self._decode_fn[key]

    def _transcribe_segment_group(
        self,
        params,
        seg_audio: Array,
        n_valid: int,
        start_pos: List[int],
        velocity_criterion: str,
        onset_bound: Optional[int],
        last_frame_idx: int,
        step_frames: int,
    ) -> Tuple[List[List[Note]], List[List[int]]]:
        """Decode a batch of segments in one device program; the sequential
        stitching chain (pointer walk + lastP) runs host-only using the
        precomputed boundary presence bits, then one batched attribute call
        assembles the whole group."""
        n_sym = len(self.targetMIDIPitch)
        n_batch = seg_audio.shape[0]
        handles = self._get_audio_decode_fn(last_frame_idx)(params, seg_audio)
        return self._process_group(
            params, handles, n_valid, start_pos, velocity_criterion,
            onset_bound, last_frame_idx, step_frames,
        )

    def _process_group(
        self,
        params,
        handles,
        n_valid: int,
        start_pos: List[int],
        velocity_criterion: str,
        onset_bound: Optional[int],
        last_frame_idx: int,
        step_frames: int,
        after_attr_dispatch=None,
    ) -> Tuple[List[List[Note]], List[List[int]]]:
        n_sym = len(self.targetMIDIPitch)
        ptr, diag, bpres, ctx = handles
        n_batch = bpres.shape[0]
        # one batched host fetch for all pointer-walk inputs
        ptr_np, diag_np, bpres_np = jax.device_get((ptr, diag, bpres))

        paths = []
        group_start_pos: List[List[int]] = []
        cur_start = list(start_pos)
        for gi in range(n_valid):
            cols = slice(gi * n_sym, (gi + 1) * n_sym)
            path = semicrf.backtrack_backward(
                ptr_np[:, cols], diag_np[:, cols], cur_start
            )
            if onset_bound is not None:
                path = [[e for e in p if e[0] < onset_bound] for p in path]
            paths.append(path)
            # lastP: end of the last decoded interval whose offset is real
            # (ref ``ModelTransformer.py:713-721``); edge-touching intervals
            # consult the precomputed presence bits
            last_p = []
            for j in range(n_sym):
                cur_last = 0
                for (b, e) in path[j]:
                    if e < last_frame_idx or bpres_np[gi, j, b, e - last_frame_idx]:
                        cur_last = e
                last_p.append(cur_last)
            cur_start = [max(k - step_frames, 0) for k in last_p]
            group_start_pos.append(cur_start)

        # one attribute call for the whole group (pad to the compiled batch)
        paths_padded = paths + [
            [[] for _ in range(n_sym)] for _ in range(n_batch - n_valid)
        ]
        notes, _ = self._attr_and_assemble(
            params, ctx, paths_padded, velocity_criterion, last_frame_idx,
            after_attr_dispatch=after_attr_dispatch,
        )
        return notes[:n_valid], group_start_pos

    def transcribe(
        self,
        params,
        x: np.ndarray,
        step_in_second: Optional[float] = None,
        segment_size_in_second: Optional[float] = None,
        discard_second_half: bool = False,
        merge_incomplete_event: bool = True,
        velocity_criterion: str = "hamming",
        segment_batch: Optional[int] = None,
    ) -> List[Note]:
        """Full-piece streaming transcription with exact cross-segment
        stitching (ref ``transcribe``, ``ModelTransformer.py:729-848``).

        x: [nSample, nChannel] float waveform at conf.fs.

        TPU-first restructuring of the reference loop: the per-segment device
        work (forward + Viterbi tables + attribute heads) is independent of
        the stitching state — only the host pointer walk consumes
        ``forcedStartPos``.  So segments run through the device in batches of
        ``segment_batch`` while the host walks pointers sequentially,
        producing results identical to the one-segment-at-a-time reference.
        """
        plan = self._transcribe_dispatch(
            params, x, step_in_second, segment_size_in_second,
            discard_second_half, velocity_criterion, segment_batch,
        )
        return self._transcribe_finish(plan, merge_incomplete_event)

    def transcribe_many(
        self,
        params,
        pieces,
        step_in_second: Optional[float] = None,
        segment_size_in_second: Optional[float] = None,
        discard_second_half: bool = False,
        merge_incomplete_event: bool = True,
        velocity_criterion: str = "hamming",
        segment_batch: Optional[int] = None,
        depth: Optional[int] = None,
        devices: Optional[Sequence[Any]] = None,
    ):
        """Pipelined batch transcription: a generator yielding one note list
        per piece, in order.

        ``pieces`` is an iterable of waveforms (or (anything, waveform) pairs
        read lazily).  The next piece's audio is read, quantized, and its
        whole group chain DISPATCHED before the current piece's results are
        fetched and assembled, so the device never idles between pieces —
        the production serving mode the per-piece API can't reach on a
        high-latency link.  ``depth`` pieces stay in flight (default: one
        per device).

        ``devices`` (e.g. ``jax.devices()``) round-robins pieces over
        multiple accelerators — each piece's sequential stitching chain is
        device-local, so pieces are the natural unit of multi-chip serving
        parallelism (each device runs its own pieces independently; results
        still yield in input order).
        """
        from collections import deque

        devs = list(devices) if devices else [None]
        if depth is None:
            depth = len(devs)
        # replicate the parameters once per device (jit follows its inputs'
        # placement; mixed-device arguments would be an error) — cached per
        # (source params, device) so repeated serving calls reuse the SAME
        # replica objects and the closed-over decode programs never re-trace
        cache = self._replicated_params
        src_leaves = jax.tree_util.tree_leaves(params)
        src_key = tuple(map(id, src_leaves))
        # LRU with a cap that always fits one full device sweep (replicas
        # pin device memory; keyed on the source LEAVES so a rebuilt dict
        # around the same arrays reuses its replicas)
        cap = max(64, 2 * len(devs))
        params_by_dev = {}
        for i, d in enumerate(devs):
            ck = (src_key, id(d))
            if ck in cache:
                cache[ck] = cache.pop(ck)  # LRU touch
            else:
                for stale in list(cache)[: max(0, len(cache) + 1 - cap)]:
                    del cache[stale]
                cache[ck] = (
                    params if d is None else jax.device_put(params, d),
                    src_leaves,  # strong ref pins the leaf ids
                )
            params_by_dev[i] = cache[ck][0]
        q = deque()
        for i, item in enumerate(pieces):
            x = item[1] if isinstance(item, tuple) else item
            q.append(
                self._transcribe_dispatch(
                    params_by_dev[i % len(devs)], x, step_in_second,
                    segment_size_in_second, discard_second_half,
                    velocity_criterion, segment_batch,
                    device=devs[i % len(devs)],
                )
            )
            if len(q) > depth:
                yield self._transcribe_finish(q.popleft(), merge_incomplete_event)
        while q:
            yield self._transcribe_finish(q.popleft(), merge_incomplete_event)

    def _transcribe_dispatch(
        self,
        params,
        x: np.ndarray,
        step_in_second: Optional[float],
        segment_size_in_second: Optional[float],
        discard_second_half: bool,
        velocity_criterion: str,
        segment_batch: Optional[int],
        device=None,
    ) -> Dict[str, Any]:
        """Phase 1 of a piece: quantize, chunk-upload, dispatch every fused
        group program.  Returns the plan consumed by ``_transcribe_finish``;
        nothing in here waits on the device.  ``device`` pins the piece's
        uploads (and therefore its programs) to one accelerator —
        ``transcribe_many`` round-robins pieces over devices."""
        if step_in_second is None and segment_size_in_second is None:
            step_in_second = self.segmentHopSizeInSecond
            segment_size_in_second = self.segmentSizeInSecond

        import os
        import time as _time

        _timing = bool(os.environ.get("TRANSKUN_TPU_TIMING"))
        _marks: List[Tuple[str, float]] = [("begin", _time.time())]

        def _mark(label: str):
            if _timing:
                _marks.append((label, _time.time()))

        x = np.asarray(x).T  # [C, nSample] — kept UNPADDED: the conceptual
        # zero padding around the piece lives only in padded-timeline
        # coordinates; it never touches host memory or the link
        pad_time_begin = segment_size_in_second - step_in_second
        pad = math.ceil(pad_time_begin * self.fs)
        n_real = x.shape[-1]
        n_sample = n_real + 2 * pad  # padded-timeline length

        start_frame_idx = math.floor(pad_time_begin * self.fs / self.hopSize)

        step_size = math.ceil(step_in_second * self.fs / self.hopSize) * self.hopSize
        segment_size = math.ceil(segment_size_in_second * self.fs)
        last_frame_idx = round(segment_size / self.hopSize)
        onset_bound = step_size if discard_second_half else None

        starts = list(range(0, n_sample, step_size))
        step_frames = int(step_size / self.hopSize)
        n_sym = len(self.targetMIDIPitch)

        if segment_batch is None:
            # single-segment groups win on this chip+link, measured
            # (scripts/bench_chunk_sweep.py, 64 s piece): sb=1 241x vs
            # sb=3 185x vs sb=5 181x.  Two effects compound: the fused
            # group program costs LESS per segment at sb=1 (13.9 ms vs
            # ~19-20 at sb>=2, scripts/profile_group_compute.py) and
            # one-step chunks give the finest upload/compute pipelining
            # with zero padded-slot waste.  One compiled program serves
            # every group of every piece length.
            segment_batch = 1

        groups = [
            starts[g0 : g0 + segment_batch]
            for g0 in range(0, len(starts), segment_batch)
        ]
        n_groups = len(groups)

        # The waveform streams to the device in per-group chunks with async
        # device_put, so the upload (the single largest cost of streaming
        # transcription on a slow link) overlaps earlier groups' compute.
        # Each group's overlapping segment windows are carved on DEVICE from
        # two adjacent chunks — no byte crosses the link twice.  When the
        # waveform is int16-exact (every decoded wav/mp3 is), chunks ship as
        # int16 and dequantize on device, halving the link traffic.
        link = _quantize_link(x, self.decode_link_int16)
        _mark("quantize_check")
        # Upload-chunk grid, ANCHORED AT THE REAL AUDIO START (padded-
        # timeline position ``pad``): chunk j covers real samples
        # [j*chunk_len, (j+1)*chunk_len).  Chunks with j < 0 or beyond the
        # audio are pure padding and resolve to a cached device-resident
        # zeros array — the piece's zero padding (up to 2*segment_size of
        # every piece) never crosses the link.  chunk_steps must divide
        # segment_batch so every group starts at the same static phase
        # ``carve_off`` within its first covering chunk (one compiled
        # program for all groups).
        chunk_steps = self.decode_chunk_steps
        if chunk_steps is None:
            # heuristic from measured link behavior (~10-15 ms fixed cost
            # per transfer + ~50 MB/s marginal): ~2-step chunks give
            # upload/compute overlap without drowning in per-transfer
            # overhead; group sizes with no even divisor fall back to
            # 1-step (finest) chunks, which still amortize fine
            for cand in (2, 1):
                if segment_batch % cand == 0:
                    chunk_steps = cand
                    break
        else:
            chunk_steps = max(1, min(chunk_steps, segment_batch))
            while segment_batch % chunk_steps:
                chunk_steps -= 1
        chunk_len = chunk_steps * step_size
        span = (segment_batch - 1) * step_size + segment_size
        carve_off = (-pad) % chunk_len
        n_cover = -(-(carve_off + span) // chunk_len)
        n_real_chunks = -(-n_real // chunk_len) if n_real else 0
        dev_chunks: Dict[int, Array] = {}

        def zero_chunk():
            key = ((link.shape[0], chunk_len), link.dtype.str, id(device))
            z = self._zero_chunk.get(key)
            if z is None:
                ctx = jax.default_device(device) if device is not None else None
                if ctx is None:
                    z = jnp.zeros((link.shape[0], chunk_len), link.dtype)
                else:
                    with ctx:
                        z = jnp.zeros((link.shape[0], chunk_len), link.dtype)
                self._zero_chunk[key] = z
            return z

        def ensure_chunks(js: List[int]):
            # one BATCHED device_put per dispatch wave: the tunnel charges a
            # fixed ~10 ms per transfer call, amortized across the wave
            todo: List[int] = []
            arrays: List[np.ndarray] = []
            for j in js:
                if j in dev_chunks:
                    continue
                if j < 0 or j >= n_real_chunks:
                    dev_chunks[j] = zero_chunk()
                    continue
                lo = j * chunk_len
                hi = min(lo + chunk_len, n_real)
                piece = link[:, lo:hi]
                if not piece.any():
                    # interior silence / trailing partial silent chunks
                    dev_chunks[j] = zero_chunk()
                    continue
                if hi - lo < chunk_len:
                    buf = np.zeros((link.shape[0], chunk_len), link.dtype)
                    buf[:, : hi - lo] = piece
                    piece = buf
                else:
                    piece = np.ascontiguousarray(piece)
                todo.append(j)
                arrays.append(piece)
            if arrays:
                for j, d in zip(todo, jax.device_put(arrays, device)):
                    dev_chunks[j] = d

        # -- fast path: the whole sequential stitching chain (Viterbi tables
        # -> pointer walk -> lastP -> next forcedStartPos -> attribute
        # readout) runs on device; groups chain device-to-device and only
        # O(events) tensors cross the (slow) host link, fetched async.
        # The legacy host-walk path remains for per-track event counts above
        # the fused program's capacity (``overflow``), falling back mid-piece
        # with identical results.
        k_max = self.decode_k_max
        k_budget = (
            self.decode_k_budget
            if self.decode_k_budget is not None
            # 2048 events per segment ≈ 5x the densest real piano (≈50
            # notes/s); the end-of-piece fetch pays ~17 B/slot on the link,
            # so the budget directly prices the decode's serial tail
            else 2048 * segment_batch
        )
        fused_fn = self._get_fused_chunk_fn(
            last_frame_idx, step_frames, segment_size, step_size,
            segment_batch, k_max, k_budget, carve_off, n_cover,
            params=params,
        )
        ob = onset_bound if onset_bound is not None else -1
        handles: Dict[int, tuple] = {}
        starts_in: Dict[int, Array] = {}
        start_dev = jax.device_put(
            np.full((n_sym,), start_frame_idx, np.int32), device
        )

        def dispatch(k: int):
            nonlocal start_dev
            if k < len(groups) and k not in handles:
                starts_in[k] = start_dev
                # first covering chunk of the group's padded-coords span
                j0 = (k * segment_batch * step_size - pad) // chunk_len
                ensure_chunks(list(range(j0, j0 + n_cover)))
                out = fused_fn(
                    start_dev,
                    *(dev_chunks[j] for j in range(j0, j0 + n_cover)),
                    criterion=velocity_criterion,
                    onset_bound=ob,
                )
                start_dev = out[7]
                for a in out[:7] + (out[8],):
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        pass
                handles[k] = out

        # dispatch every group up front (they chain device-to-device through
        # forcedStartPos); the fetch happens in ``_transcribe_finish`` — ONE
        # host round-trip per piece, on a link where each fetch costs a full
        # RTT while the marginal bytes are nearly free.  All upload chunks of
        # the piece ship in ONE batched device_put first: the link charges a
        # fixed per-transfer-call cost, so a wave per group pays it n_groups
        # times; transfers are async, so group 0's program still starts as
        # soon as its own chunks land
        if groups:
            j_first = (0 - pad) // chunk_len
            j_last = ((len(groups) - 1) * segment_batch * step_size - pad) // chunk_len
            ensure_chunks(list(range(j_first, j_last + n_cover)))
        for g_idx in range(len(groups)):
            dispatch(g_idx)
        _mark("dispatch_all")
        outs = [handles.pop(g_idx) for g_idx in range(len(groups))]
        return dict(
            params=params,
            outs=outs,
            groups=groups,
            starts_in=starts_in,
            segment_batch=segment_batch,
            n_sym=n_sym,
            k_max=k_max,
            last_frame_idx=last_frame_idx,
            step_frames=step_frames,
            segment_size=segment_size,
            pad_time_begin=pad_time_begin,
            velocity_criterion=velocity_criterion,
            onset_bound=onset_bound,
            link=link,
            timing=(_timing, _marks, _mark),
            device=device,
        )

    def _transcribe_finish(
        self, plan: Dict[str, Any], merge_incomplete_event: bool = True
    ) -> List[Note]:
        """Phase 2 of a piece: one fetch of every group's compact events,
        host assembly + cross-segment merge (+ the host-walk fallback on
        overflow)."""
        params = plan["params"]
        outs = plan["outs"]
        groups = plan["groups"]
        starts_in = plan["starts_in"]
        segment_batch = plan["segment_batch"]
        n_sym = plan["n_sym"]
        k_max = plan["k_max"]
        last_frame_idx = plan["last_frame_idx"]
        step_frames = plan["step_frames"]
        segment_size = plan["segment_size"]
        pad_time_begin = plan["pad_time_begin"]
        velocity_criterion = plan["velocity_criterion"]
        onset_bound = plan["onset_bound"]
        link = plan["link"]
        _timing, _marks, _mark = plan["timing"]

        events_by_type: Dict[int, List[Note]] = defaultdict(list)

        def consume_group(group, group_events, shifted=False):
            for i, cur_events in zip(group, group_events):
                if not shifted:
                    begin_time = i / self.fs - pad_time_begin
                    for e in cur_events:
                        e.start += begin_time
                        e.end += begin_time
                        e.start = max(e.start, 0)
                        e.end = max(e.end, e.start)

                for e in cur_events:
                    if merge_incomplete_event and len(events_by_type[e.pitch]) > 0:
                        last_e = events_by_type[e.pitch][-1]
                        if e.start < last_e.end:
                            if e.hasOnset:
                                events_by_type[e.pitch][-1] = e
                            else:
                                last_e.hasOffset = e.hasOffset
                                last_e.end = max(e.end, last_e.end)
                            continue
                    if e.hasOnset:
                        events_by_type[e.pitch].append(e)

        fallback_from: Optional[int] = None
        fetched = jax.device_get(
            [(o[0], o[1], o[2], o[3], o[4], o[5], o[6], o[8]) for o in outs]
        )
        _mark("fetch_all")
        # overflow prefix: groups up to (not including) the first overflowing
        # one assemble on the fast path; the rest redo via host walk below
        n_ok = len(groups)
        for g_idx in range(len(groups)):
            if bool(fetched[g_idx][7]):
                fallback_from = g_idx
                n_ok = g_idx
                break
        # introspection for tests/diagnostics: which group (if any) tripped
        # the overflow fallback, and each group's compacted event count
        self.last_transcribe_fallback_from = fallback_from
        self.last_transcribe_group_counts = [int(f[6]) for f in fetched]
        if n_ok:
            # ONE scatter of every group's compact event buffer into
            # [n_ok*segment_batch, P, K] host arrays and ONE vectorized
            # assembly pass — per-group numpy work doesn't scale with piece
            # length on the (slow, 1-core-in-this-env) host
            n_grp = segment_batch
            stride = n_grp * n_sym * k_max
            counts = [int(fetched[g][6]) for g in range(n_ok)]
            s_all = np.concatenate(
                [
                    fetched[g][0][: counts[g]].astype(np.int64) + g * stride
                    for g in range(n_ok)
                ]
            )
            cat = lambda i: np.concatenate(
                [fetched[g][i][: counts[g]] for g in range(n_ok)]
            )
            n_seg = n_ok * n_grp
            gi = s_all // (n_sym * k_max)
            gj = (s_all // k_max) % n_sym
            gk = s_all % k_max
            begins = np.zeros((n_seg, n_sym, k_max), np.int32)
            ends = np.zeros((n_seg, n_sym, k_max), np.int32)
            mask = np.zeros((n_seg, n_sym, k_max), bool)
            vel_all = cat(3)
            vel_d = np.zeros((n_seg, n_sym, k_max), vel_all.dtype)
            of_d = np.zeros((n_seg, n_sym, k_max, 2), np.float64)
            pres_d = np.zeros((n_seg, n_sym, k_max, 2), bool)
            begins[gi, gj, gk] = cat(1)
            ends[gi, gj, gk] = cat(2)
            mask[gi, gj, gk] = True
            vel_d[gi, gj, gk] = vel_all
            of_d[gi, gj, gk] = cat(4)
            pres_d[gi, gj, gk] = cat(5)
            begin_times = np.array(
                [
                    s / self.fs - pad_time_begin
                    for g in groups[:n_ok]
                    for s in (list(g) + [0] * (n_grp - len(g)))
                ],
                np.float64,
            )
            group_events, _ = self._assemble_from_arrays(
                begins, ends, mask, vel_d, of_d, pres_d, last_frame_idx,
                begin_times=begin_times,
            )
            for g_idx in range(n_ok):
                lo = g_idx * n_grp
                consume_group(
                    groups[g_idx],
                    group_events[lo : lo + len(groups[g_idx])],
                    shifted=True,
                )
            _mark("assemble")

        if fallback_from is not None:
            # resume with the host-walk path from the overflowing group, with
            # the start positions the device chain carried to that point
            # (link is unpadded: re-apply the padded-timeline zeros here)
            pad = math.ceil(pad_time_begin * self.fs)
            guarded = np.pad(link, ((0, 0), (pad, pad + segment_size)))
            dev_audio = jax.device_put(guarded, plan["device"])
            slice_fn = self._get_slice_fn(dev_audio.shape[-1], segment_size)
            starts_np = np.zeros((len(groups), segment_batch), np.int32)
            for k, grp in enumerate(groups):
                starts_np[k, : len(grp)] = grp
            sp_all = jax.device_put(starts_np, plan["device"])
            start_pos = [int(v) for v in np.asarray(starts_in[fallback_from])]
            for g_idx in range(fallback_from, len(groups)):
                group = groups[g_idx]
                group_events, group_last_p = self._transcribe_segment_group(
                    params,
                    slice_fn(dev_audio, sp_all[g_idx]),
                    len(group),
                    start_pos,
                    velocity_criterion,
                    onset_bound,
                    last_frame_idx,
                    step_frames=step_frames,
                )
                start_pos = group_last_p[len(group) - 1]
                consume_group(group, group_events)

        # incomplete events in the final segment get a forced offset
        for event_type in events_by_type:
            if len(events_by_type[event_type]) > 0:
                events_by_type[event_type][-1].hasOffset = True

        events_all = [e for lst in events_by_type.values() for e in lst]
        events_all = [n for n in events_all if n.hasOffset]
        if _timing:
            import os

            # marks are kept on the instance so callers (bench.py) can build
            # a phase breakdown without parsing stdout; TRANSKUN_TPU_TIMING
            # = "silent" records marks but skips the per-call print
            self.last_transcribe_marks = list(_marks)
            if os.environ.get("TRANSKUN_TPU_TIMING") != "silent":
                prev = _marks[0][1]
                for label, tt in _marks[1:]:
                    print(f"  [transcribe] {label}: +{(tt - prev) * 1e3:.1f} ms")
                    prev = tt
        return resolve_overlapping(events_all)
