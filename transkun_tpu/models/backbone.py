"""Axial-attention backbone (ref ``transkun/LayersTransformer.py:444-660``).

Channels-last throughout (TPU native).  Pipeline: 3x3 input conv + 1-D
frequency position embedding -> strided conv patchify (8x in time, 4x in
frequency) -> prepend one aggregation row/column -> add (T, F) grid position
embedding, build per-pitch query tracks from a (T, MIDI-pitch) embedding ->
nLayers of factorized F/T attention (optionally rematerialized) -> split off
the pitch tracks, drop the t=0 aggregation step, transposed-conv 8x temporal
upsample back to frame rate.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import BasicBlock, SpatialPositionEmbedding, grid_coords

Array = jax.Array


class DownConv(nn.Module):
    """Strided conv patchifier: 8x time, 4x frequency (ref ``:498-518``)."""

    base_size: int
    dropout: float
    downsample_f: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, h: Array, deterministic: bool) -> Array:
        # h: [N, T, F, C]
        b = self.base_size
        if self.downsample_f:
            h = jnp.pad(h, ((0, 0), (4, 3), (2, 1), (0, 0)))
            strides = [(2, 1), (2, 2), (2, 2)]
        else:
            h = jnp.pad(h, ((0, 0), (4, 3), (0, 0), (0, 0)))
            strides = [(2, 1), (2, 1), (2, 1)]
        chans = [2 * b, 4 * b, 4 * b]
        drop = nn.Dropout(self.dropout, broadcast_dims=(1, 2))
        for i, (c, s) in enumerate(zip(chans, strides)):
            h = nn.Conv(c, (3, 3), strides=s, padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"norm{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = drop(h, deterministic=deterministic)
        h = nn.Conv(4 * b, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3")(h)
        h = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="norm3")(h)
        return h


class UpConv1d(nn.Module):
    """Full 8x upsample stack (ref ``LayersTransformer.py:523-534``):
    three (ConvTranspose k=stride=2 -> Conv k=3 -> GroupNorm -> GELU) stages,
    the last stage without norm/activation, 4b -> 4b -> 2b -> b channels.
    Each transposed conv with kernel == stride is one Dense to 2 per-step
    outputs plus a reshape — an MXU matmul, no scatter."""

    base_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, h: Array) -> Array:
        # h: [B, T, 4b] channels-last
        b = self.base_size
        stages = [(4 * b, False), (2 * b, False), (b, True)]
        for i, (c_out, last) in enumerate(stages):
            bb, t, _ = h.shape
            h = nn.Dense(2 * c_out, dtype=self.dtype, name=f"up{i}")(h)
            h = h.reshape(bb, 2 * t, c_out)
            h = nn.Conv(
                c_out, (3,), padding=((1, 1),), dtype=self.dtype, name=f"conv{i}"
            )(h)
            if not last:
                h = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"norm{i}")(h)
                h = nn.gelu(h, approximate=False)
        return h


class Backbone(nn.Module):
    input_size: int
    base_size: int
    pos_embed_init_gamma: float
    n_head: int
    hidden_factor: float = 2.0
    hidden_factor_attn: float = 1.0
    expansion_factor: int = 1
    dropout: float = 0.0
    n_layers: int = 4
    enabled_attn: Tuple[str, ...] = ("F", "T")
    use_gradient_checkpoint: bool = True
    downsample_f: bool = True
    upsample_proj_only: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: Array, output_indices: Array, deterministic: bool = True
    ) -> Array:
        # x: [N, T, F, C] mel features; output_indices: [P] raw MIDI coords
        n, n_t, n_f, _ = x.shape
        b = self.base_size
        d = 4 * b

        pos_f = SpatialPositionEmbedding(
            b, 1, self.pos_embed_init_gamma, self.dropout, name="posEmbedBuilder"
        )(jnp.arange(n_f, dtype=jnp.float32)[:, None], deterministic)  # [F, b]

        h = nn.Conv(b, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="inputConv")(x)
        h = h + pos_f  # broadcast over N, T
        h = DownConv(b, self.dropout, self.downsample_f, dtype=self.dtype, name="downConv")(
            h.astype(self.dtype or h.dtype), deterministic
        )  # [N, T', F', 4b]

        # prepend one aggregation step (time) and one aggregation track (freq)
        h = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (0, 0)))
        tp, fp = h.shape[1], h.shape[2]

        coord_t = jnp.arange(tp, dtype=jnp.float32)
        coord_f = jnp.arange(fp, dtype=jnp.float32)
        pos_tf = SpatialPositionEmbedding(
            d, 2, self.pos_embed_init_gamma, self.dropout, name="posEmbedBuilderAttnTF"
        )(grid_coords(coord_t, coord_f), deterministic)  # [T', F', 4b]
        pos_te = SpatialPositionEmbedding(
            d, 2, self.pos_embed_init_gamma, self.dropout, name="posEmbedBuilderAttnTE"
        )(
            grid_coords(coord_t, output_indices.astype(jnp.float32)), deterministic
        )  # [T', P, 4b]

        h = h + pos_tf
        h_target = jnp.broadcast_to(pos_te, (n, *pos_te.shape))
        h_all = jnp.concatenate([h, h_target], axis=-2)  # [N, T', F'+P, 4b]
        # keep the residual stream in the compute dtype through the encoder
        # stack: at flagship shape the f32 stream costs ~2x per layer (HBM
        # traffic on the stream + norms), measured 3.1 -> 1.6 ms/layer
        h_all = h_all.astype(self.dtype or h_all.dtype)

        block_cls = BasicBlock
        if self.use_gradient_checkpoint:
            block_cls = nn.remat(BasicBlock, static_argnums=(2,))
        for i in range(self.n_layers):
            h_all = block_cls(
                size=d,
                num_heads=self.n_head,
                hidden_factor=self.hidden_factor,
                hidden_factor_attn=self.hidden_factor_attn,
                enabled=self.enabled_attn,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"encoderLayers_{i}",
            )(h_all, deterministic)

        h_target = h_all[..., fp:, :]  # [N, T', P, 4b]
        h_target = h_target[:, 1:]  # drop the t=0 aggregation step
        p = h_target.shape[2]

        # 8x temporal upsample back to frame rate (ref ``:521,649``).  A
        # transposed conv with kernel == stride == 8 is exactly a dense map to
        # 8 per-patch outputs followed by a reshape — one MXU matmul.
        ht = jnp.swapaxes(h_target, 1, 2).reshape(n * p, tp - 1, d)  # [N*P, T'', 4b]
        out_d = b * self.expansion_factor
        up = nn.Dense(8 * out_d, dtype=self.dtype, name="upConv1dSkip")(ht)
        up = up.reshape(n * p, (tp - 1) * 8, out_d)
        if not self.upsample_proj_only:
            # full path: conv stack + skip (ref ``:645-646``); both land on
            # baseSize channels, so expansion_factor must be 1
            assert self.expansion_factor == 1, (
                "upsample_proj_only=False requires expansion_factor == 1 "
                "(upConv1d ends at baseSize channels, ref "
                "LayersTransformer.py:533,646)"
            )
            up = up + UpConv1d(b, dtype=self.dtype, name="upConv1d")(ht)
        up = up[:, :n_t]  # crop to original frame count
        return up.reshape(n, p, n_t, out_d).astype(jnp.float32)
