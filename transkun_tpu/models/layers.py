"""V2 transformer building blocks (flax.linen), TPU-first layouts.

Counterparts of ``transkun/LayersTransformer.py``.  Everything runs in NHWC /
channels-last layouts (TPU native); attention is plain XLA dot-product
attention (sequence lengths here are ~60-240, far below where a custom flash
kernel pays off — XLA fuses these einsums onto the MXU directly).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def rms_norm(x: Array, eps: float = 1e-6) -> Array:
    """Scale-free RMSNorm (ref ``LayersTransformer.py:12-19`` — no learned gain).
    Statistics in fp32 regardless of input dtype."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class TiedDropout(nn.Module):
    """Dropout tied along one axis — drops whole slices (ref ``:22-37``)."""

    rate: float
    axis: int

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        shape = list(x.shape)
        shape[self.axis] = 1
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, tuple(shape))
        return x * mask / keep


class SpatialPositionEmbedding(nn.Module):
    """Random-Fourier-feature positional embedding with a learned MLP on top
    (ref ``LearnableSpatialPositionEmbedding``, ``:40-86``): cos of a learned
    linear map of raw coordinates (init N(0, 1/gamma) weights, U(-pi,pi)
    phase), scaled by 1/sqrt(d/2), then Linear-GELU-Linear."""

    embed_size: int
    coord_dim: int
    gamma: float = 10.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, coord: Array, deterministic: bool = True) -> Array:
        # coord: [..., coord_dim] raw (possibly negative) coordinates
        phi = nn.Dense(
            self.embed_size,
            kernel_init=nn.initializers.normal(1.0 / self.gamma),
            bias_init=nn.initializers.uniform(scale=2 * math.pi),
            name="proj",
        )(coord.astype(jnp.float32))
        # note: flax uniform is [0, scale); torch init is U(-pi, pi).  Same
        # distribution modulo 2*pi under cos().
        z = jnp.cos(phi) / math.sqrt(self.embed_size / 2)
        h = nn.Dense(4 * self.embed_size, name="mlp_0")(z)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.embed_size, name="mlp_1")(h)


def grid_coords(*axes: Array) -> Array:
    """meshgrid(indexing='ij') + stack(-1): [len(a0), ..., n_axes]."""
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=-1)


class _Kernel(nn.Module):
    """Bias-free projection parameter with ``nn.Dense``'s exact param tree
    ({'kernel'}) and init — calling it returns the RAW kernel so parents can
    concat-fuse several projections of one tensor into a single GEMM."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> Array:
        return self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (self.in_features, self.features),
        )


class MultiHeadAttention(nn.Module):
    """MHA with separate unbiased q/k/v projections and a biased out
    projection (ref ``MultiHeadAttentionKernel``, ``:119-190``).  Attends over
    axis -2 of arbitrarily-batched inputs.  head_dim =
    ceil(hiddenFactor*embed/num_heads).

    Setup-style so callers can fetch the raw k/v kernels (``kv_kernels``)
    and feed precomputed projections to ``attend`` — the axial blocks
    concat-fuse every k/v projection of the shared ``mem`` tensor into one
    GEMM (see ``BasicBlock``)."""

    embed_dim: int
    num_heads: int
    hidden_factor: float = 1.0
    dtype: Any = None  # computation dtype (params stay fp32)

    def setup(self):
        head_dim = int(
            math.ceil(math.ceil(self.hidden_factor * self.embed_dim) / self.num_heads)
        )
        self.head_dim = head_dim
        self.hidden = head_dim * self.num_heads
        self.q_proj = _Kernel(self.embed_dim, self.hidden)
        self.k_proj = _Kernel(self.embed_dim, self.hidden)
        self.v_proj = _Kernel(self.embed_dim, self.hidden)
        self.out_proj = nn.Dense(self.embed_dim, dtype=self.dtype)

    def kv_kernels(self) -> Tuple[Array, Array]:
        return self.k_proj(), self.v_proj()

    def attend(self, query: Array, k: Array, v: Array) -> Array:
        """Attention with ALREADY-PROJECTED k/v ``[..., S, hidden]``;
        ``query`` is raw and projected here."""
        from flax.linen.dtypes import promote_dtype

        query, wq = promote_dtype(query, self.q_proj(), dtype=self.dtype)
        q = query @ wq

        # Exp-trick attention via XLA einsums (ops/attention_pallas.py).
        from ..ops import attention_pallas

        scale = 1.0 / math.sqrt(self.head_dim)
        if attention_pallas.use_pallas_attention():
            # the opt-in Pallas kernel wants flat [B, S, D]: broadcast the
            # leading (batch) dims between query and key/value explicitly
            lead = jnp.broadcast_shapes(q.shape[:-2], k.shape[:-2])
            q = jnp.broadcast_to(q, lead + q.shape[-2:])
            k = jnp.broadcast_to(k, lead + k.shape[-2:])
            v = jnp.broadcast_to(v, lead + v.shape[-2:])
            out = attention_pallas.attention(
                q.reshape(-1, q.shape[-2], self.hidden),
                k.reshape(-1, k.shape[-2], self.hidden),
                v.reshape(-1, v.shape[-2], self.hidden),
                self.num_heads, scale,
            )
            out = out.reshape(*lead, q.shape[-2], self.hidden)
        else:
            # XLA path broadcasts leads inside its einsums — the All0 path's
            # shared key/value row is never materialized per query row
            out = attention_pallas.attention_xla(
                q, k, v, self.num_heads, scale
            )
        return self.out_proj(out)

    def __call__(self, query: Array, key: Optional[Array] = None) -> Array:
        from flax.linen.dtypes import promote_dtype

        if key is None:
            key = query
        wk, wv = self.kv_kernels()
        key_k, wk = promote_dtype(key, wk, dtype=self.dtype)
        key_v, wv = promote_dtype(key, wv, dtype=self.dtype)
        return self.attend(query, key_k @ wk, key_v @ wv)


def _layer_scale_init(key, shape):
    return jnp.full(shape, 1e-2, jnp.float32)


class AttnResBlock(nn.Module):
    """Prenorm attention residual with LayerScale init 1e-2 (ref ``:88-99``):
    x + dropout(MHA(rms_norm(x), mem)) * scale.

    ``kv`` (already-projected key/value tensors) bypasses the block's own
    k/v GEMMs — used by ``BasicBlock``'s fused shared-mem projection."""

    size: int
    num_heads: int
    hidden_factor_attn: float
    dropout: float
    dtype: Any = None

    def setup(self):
        self.scale = self.param("scale", _layer_scale_init, (self.size,))
        self.mha = MultiHeadAttention(
            self.size, self.num_heads, self.hidden_factor_attn, dtype=self.dtype,
        )
        self.drop = nn.Dropout(self.dropout)

    def kv_kernels(self) -> Tuple[Array, Array]:
        return self.mha.kv_kernels()

    def __call__(self, x, mem, deterministic: bool, kv=None):
        q_in = rms_norm(x).astype(self.dtype or x.dtype)
        if kv is None:
            h = self.mha(q_in, mem)
        else:
            h = self.mha.attend(q_in, *kv)
        h = self.drop(h, deterministic=deterministic)
        return x + (h * self.scale).astype(x.dtype)


class _DenseParams(nn.Module):
    """Raw kernel/bias holder with nn.Dense's exact param tree and inits —
    lets the FFN use either plain XLA matmuls or the fused Pallas MLP over
    the same checkpoint-compatible parameters."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class FFNResBlock(nn.Module):
    """Prenorm FFN residual with LayerScale (ref ``:88-99,224-233``)."""

    size: int
    hidden_factor: float
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool):
        from ..ops import mlp_pallas

        scale = self.param("scale", _layer_scale_init, (self.size,))
        hidden = int(math.ceil(self.size * self.hidden_factor))
        dt = self.dtype or x.dtype
        xin = rms_norm(x).astype(dt)
        k1, b1 = _DenseParams(hidden, name="lin1")(xin.shape[-1])
        k2, b2 = _DenseParams(self.size, name="lin2")(hidden)

        fused_ok = mlp_pallas.use_pallas_mlp() and (
            deterministic or self.dropout == 0.0
        )
        if fused_ok:
            # hidden activation stays in VMEM; the mid-FFN dropout is a
            # no-op under the gate above
            h = mlp_pallas.mlp(
                xin, k1.astype(dt), b1.astype(dt), k2.astype(dt), b2.astype(dt)
            )
        else:
            h = xin @ k1.astype(dt) + b1.astype(dt)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = h @ k2.astype(dt) + b2.astype(dt)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + (h * scale).astype(x.dtype)


class BasicBlock(nn.Module):
    """Factorized axial attention over a [N, T, F, D] lattice (ref ``:193-372``).

    "F": attention along the frequency/track axis within each timestep;
    "T": attention along time within each column; optional "All0"/"0All"
    aggregation-track cross attention and full "FT" attention.  Both
    attentions inside one block read the block's *input* as keys/values.
    """

    size: int
    num_heads: int
    hidden_factor: float = 2.0
    hidden_factor_attn: float = 1.0
    enabled: Tuple[str, ...] = ("F", "T", "All0", "0All")
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        from ..ops import attention_pallas

        mem = x
        h = x
        kw = dict(
            size=self.size,
            num_heads=self.num_heads,
            hidden_factor_attn=self.hidden_factor_attn,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        ffn_kw = dict(
            size=self.size, hidden_factor=self.hidden_factor, dropout=self.dropout,
            dtype=self.dtype,
        )
        blkF = AttnResBlock(**kw, name="mhaBlockF") if "F" in self.enabled else None
        blkT = AttnResBlock(**kw, name="mhaBlockT") if "T" in self.enabled else None
        blkA = (
            AttnResBlock(**kw, name="mhaBlockAll0")
            if ("All0" in self.enabled or "0All" in self.enabled)
            else None
        )
        blkFT = AttnResBlock(**kw, name="mhaBlockFT") if "FT" in self.enabled else None

        # every attention in the block reads the SAME block input ``mem`` as
        # keys/values (directly, transposed, sliced, or flattened) — so all
        # their k/v projections can ride ONE concat GEMM over mem instead of
        # 6-8 narrow ones (opt-in; see ops.attention_pallas.use_fused_kv)
        kvs = {}
        if attention_pallas.use_fused_kv():
            from flax.linen.dtypes import promote_dtype

            owners = [b for b in (blkF, blkT, blkA, blkFT) if b is not None]
            kernels = [w for b in owners for w in b.kv_kernels()]
            args = promote_dtype(mem, *kernels, dtype=self.dtype)
            mem_p, kernels = args[0], args[1:]
            fused = mem_p @ jnp.concatenate(kernels, axis=1)
            off = 0
            for b, wk in zip(owners, kernels[::2]):
                hid = wk.shape[1]
                kvs[b.name] = (
                    fused[..., off : off + hid],
                    fused[..., off + hid : off + 2 * hid],
                )
                off += 2 * hid

        def kv_of(blk, transform):
            if blk.name not in kvs:
                return None
            k, v = kvs[blk.name]
            return transform(k), transform(v)

        if blkF is not None:
            h = blkF(h, mem, deterministic, kv=kv_of(blkF, lambda a: a))
            h = FFNResBlock(**ffn_kw, name="fnnBlockF")(h, deterministic)

        h = jnp.swapaxes(h, -3, -2)  # [N, F, T, D]
        mem_t = jnp.swapaxes(mem, -3, -2)
        swap = lambda a: jnp.swapaxes(a, -3, -2)

        if blkT is not None:
            h = blkT(h, mem_t, deterministic, kv=kv_of(blkT, swap))
            h = FFNResBlock(**ffn_kw, name="fnnBlockT")(h, deterministic)

        if blkA is not None:
            h0, h1 = h[..., :1, :, :], h[..., 1:, :, :]
            if "All0" in self.enabled:
                h1 = blkA(
                    h1, mem_t[..., 0:1, :, :], deterministic,
                    kv=kv_of(blkA, lambda a: swap(a)[..., 0:1, :, :]),
                )
            if "0All" in self.enabled:
                flat = mem_t.reshape(*mem_t.shape[:-3], 1, -1, mem_t.shape[-1])
                h0 = blkA(
                    h0, flat, deterministic,
                    kv=kv_of(
                        blkA,
                        lambda a: swap(a).reshape(
                            *a.shape[:-3], 1, -1, a.shape[-1]
                        ),
                    ),
                )
            h = jnp.concatenate([h0, h1], axis=-3)
            h = FFNResBlock(**ffn_kw, name="fnnBlockAll0")(h, deterministic)

        if blkFT is not None:
            nf, nt = h.shape[-3], h.shape[-2]
            hf = h.reshape(*h.shape[:-3], nf * nt, h.shape[-1])
            memf = mem_t.reshape(*mem_t.shape[:-3], nf * nt, mem_t.shape[-1])
            hf = blkFT(
                hf, memf, deterministic,
                kv=kv_of(
                    blkFT,
                    lambda a: swap(a).reshape(*a.shape[:-3], nf * nt, a.shape[-1]),
                ),
            )
            hf = FFNResBlock(**ffn_kw, name="fnnBlockFT")(hf, deterministic)
            h = hf.reshape(*h.shape[:-3], nf, nt, h.shape[-1])

        return jnp.swapaxes(h, -3, -2)


class ScaledInnerProductIntervalScorer(nn.Module):
    """Interval scorer: S[e,b] = <q_e, k_b> * |e-b| + diag (ref ``:381-441``).

    Input ctx [N, P, T, D] -> (S [T, T, N, P], noise [T-1, N, P]); the noise
    (skip) score is identically zero in V2 (ref ``:436-437``, README design).
    """

    size: int
    expansion_factor: int = 1
    dropout: float = 0.0
    length_scaling: str = "linear"
    score_dtype: Any = None  # e.g. jnp.bfloat16: halves the HBM cost of S

    def setup(self):
        self.map = nn.Dense(2 * self.size * self.expansion_factor + 1)

    def _qkd(self, ctx: Array):
        e = self.size * self.expansion_factor
        mapped = self.map(ctx)
        q, k, diag = jnp.split(mapped, [e, 2 * e], axis=-1)
        q = q / math.sqrt(q.shape[-1])
        if self.score_dtype is not None:
            q = q.astype(self.score_dtype)
            k = k.astype(self.score_dtype)
            diag = diag.astype(self.score_dtype)
        return q, k, diag

    def _length_scale(self, s: Array, len_eb: Array) -> Array:
        if self.length_scaling == "linear":
            return s * len_eb
        if self.length_scaling == "sqrt":
            return s * jnp.sqrt(len_eb)
        if self.length_scaling != "none":
            raise ValueError(self.length_scaling)
        return s

    def __call__(self, ctx: Array) -> Tuple[Array, Array]:
        q, k, diag = self._qkd(ctx)
        s = jnp.einsum(
            "iped,ipbd->ipeb", q, k,
            preferred_element_type=self.score_dtype or jnp.float32,
        )
        t = s.shape[-1]
        len_eb = jnp.abs(jnp.arange(t)[:, None] - jnp.arange(t)[None, :]).astype(s.dtype)
        s = self._length_scale(s, len_eb)
        # diag [N,P,T,1] broadcast against eye [T,T] -> diag_embed
        s = s + jnp.eye(t, dtype=s.dtype) * diag
        noise = jnp.zeros_like(diag[..., 1:, 0])
        s = jnp.transpose(s, (2, 3, 0, 1))  # [T_end, T_begin, N, P]
        noise = jnp.transpose(noise, (2, 0, 1))  # [T-1, N, P]
        return s, noise

    def _padded_scores(
        self, ctx: Array, t_pad: int, p_pad: int, transposed: bool
    ) -> Tuple[Array, Array, Array]:
        """Shared fused emission: the padded, NEG-masked score tensor written
        exactly once, straight from the einsum epilogue (length scale, diag
        add, and padding mask fused in — the [T,T,NB] tensor dominates HBM
        traffic at flagship shape).

        transposed=False -> alpha layout [end, begin, N*p_pad] (training
        logZ kernels); True -> decode layout [begin, end, N*p_pad] (Viterbi
        kernel).  Returns (s, noise zeros [t_pad, N*p_pad] — the V2
        noise-score design choice, ref ``LayersTransformer.py:436`` —
        diag_t [Tp, N, Pp] un-gated)."""
        from ..ops.semicrf import NEG

        q, k, diag = self._qkd(ctx)  # [N, P, T, E], diag [N, P, T, 1]
        n, p, t, _ = q.shape
        q = jnp.pad(q, ((0, 0), (0, p_pad - p), (0, t_pad - t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, p_pad - p), (0, t_pad - t), (0, 0)))
        a, c = (k, q) if transposed else (q, k)
        s = jnp.einsum(
            "ipad,ipcd->acip", a, c,
            preferred_element_type=self.score_dtype or jnp.float32,
        )  # [axis0, axis1, N, Pp]
        idx = jnp.arange(t_pad)
        len_eb = jnp.abs(idx[:, None] - idx[None, :]).astype(s.dtype)
        s = self._length_scale(s, len_eb[:, :, None, None])
        diag_pad = jnp.pad(
            diag[..., 0], ((0, 0), (0, p_pad - p), (0, t_pad - t))
        )  # [N, Pp, Tp]
        diag_t = jnp.transpose(diag_pad, (2, 0, 1))  # [Tp, N, Pp]
        eye = jnp.eye(t_pad, dtype=bool)
        # the added diag only matters on the eye, where axis0 == axis1, so
        # indexing it along axis0 is correct in both layouts
        s = jnp.where(
            eye[:, :, None, None], s + diag_t[:, None].astype(s.dtype), s
        )
        valid = (idx[:, None] < t) & (idx[None, :] < t)
        track_valid = jnp.arange(p_pad)[None, None, None, :] < p
        s = jnp.where(valid[:, :, None, None] & track_valid, s, NEG)
        nb = n * p_pad
        s = s.reshape(t_pad, t_pad, nb)
        noise = jnp.zeros((t_pad, nb), jnp.float32)
        return s, noise, diag_t

    def decode_scores(
        self, ctx: Array, t_pad: int, p_pad: int
    ) -> Tuple[Array, Array, Array]:
        """Decode-layout scores for the Pallas Viterbi kernel.

        Returns (s_t [t_pad, t_pad, N*p_pad] in [begin, end, lane] layout,
        noise [t_pad, N*p_pad] zeros, diag [t_pad, N*p_pad] f32 un-gated)."""
        s_t, noise, diag_t = self._padded_scores(ctx, t_pad, p_pad, True)
        return s_t, noise, diag_t.reshape(t_pad, -1).astype(jnp.float32)

    def train_scores(
        self, ctx: Array, t_pad: int, p_pad: int
    ) -> Tuple[Array, Array]:
        """Alpha-layout [end, begin, N*p_pad] scores for the training logZ
        kernels (``semicrf.log_z_padded_best``) and ``eval_path_padded``."""
        s, noise, _ = self._padded_scores(ctx, t_pad, p_pad, False)
        return s, noise
