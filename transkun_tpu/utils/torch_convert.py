"""Convert a reference PyTorch TransKun state_dict to flax params.

Used for (a) loading reference-trained checkpoints and (b) exact-parity
testing of the forward pass.  Layout conversions:

* torch ``nn.Linear`` weight [out, in]       -> Dense kernel [in, out]
* MHA q/k/v projections are stored [in, out] in the reference -> no transpose
* torch ``Conv2d`` weight [out, in, kh, kw]  -> Conv kernel [kh, kw, in, out]
* torch ``ConvTranspose1d`` (k == stride == 8) weight [in, out, 8] ->
  Dense kernel [in, 8*out] via transpose to [in, 8, out]; bias tiled 8x.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _linear(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _conv2d(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0))),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _groupnorm(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _pos_embed(sd, prefix):
    return {
        "proj": _linear(sd, prefix + ".proj"),
        "mlp_0": _linear(sd, prefix + ".mlp.0"),
        "mlp_1": _linear(sd, prefix + ".mlp.3"),
    }


def _mha(sd, prefix):
    return {
        "q_proj": {"kernel": np.asarray(sd[prefix + ".q_proj_weight"])},
        "k_proj": {"kernel": np.asarray(sd[prefix + ".k_proj_weight"])},
        "v_proj": {"kernel": np.asarray(sd[prefix + ".v_proj_weight"])},
        "out_proj": _linear(sd, prefix + ".out_proj"),
    }


def _attn_block(sd, prefix):
    return {
        "mha": _mha(sd, prefix + ".module"),
        "scale": np.asarray(sd[prefix + ".scale"]),
    }


def _ffn_block(sd, prefix):
    return {
        "lin1": _linear(sd, prefix + ".module.0"),
        "lin2": _linear(sd, prefix + ".module.3"),
        "scale": np.asarray(sd[prefix + ".scale"]),
    }


def _mlp_head(sd, prefix):
    return {
        "lin1": _linear(sd, prefix + ".0"),
        "lin2": _linear(sd, prefix + ".3"),
    }


def convert_backbone(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert the ``backbone.*`` keys of a torch state_dict (numpy values)
    to the flax Backbone params dict."""
    backbone: Dict[str, Any] = {
        "posEmbedBuilder": _pos_embed(sd, "backbone.posEmbedBuilder"),
        "posEmbedBuilderAttnTF": _pos_embed(sd, "backbone.posEmbedBuilderAttnTF"),
        "posEmbedBuilderAttnTE": _pos_embed(sd, "backbone.posEmbedBuilderAttnTE"),
        "inputConv": _conv2d(sd, "backbone.inputConv"),
        "downConv": {
            "conv0": _conv2d(sd, "backbone.downConv.1"),
            "norm0": _groupnorm(sd, "backbone.downConv.2"),
            "conv1": _conv2d(sd, "backbone.downConv.5"),
            "norm1": _groupnorm(sd, "backbone.downConv.6"),
            "conv2": _conv2d(sd, "backbone.downConv.9"),
            "norm2": _groupnorm(sd, "backbone.downConv.10"),
            "conv3": _conv2d(sd, "backbone.downConv.13"),
            "norm3": _groupnorm(sd, "backbone.downConv.14"),
        },
    }
    # transposed-conv-as-dense upsampler
    def _convtranspose1d_as_dense(prefix):
        w = sd[prefix + ".weight"]  # [in, out, k]
        k = w.shape[-1]
        kernel = np.ascontiguousarray(np.transpose(w, (0, 2, 1))).reshape(
            w.shape[0], -1
        )
        return {"kernel": kernel, "bias": np.tile(sd[prefix + ".bias"], k)}

    backbone["upConv1dSkip"] = _convtranspose1d_as_dense("backbone.upConv1dSkip")

    if "backbone.upConv1d.0.weight" in sd:
        # full upsample stack (upsampleProjOnly=False, ref
        # ``LayersTransformer.py:523-534``): torch Sequential indices
        # 0/4/8 ConvTranspose1d, 1/5/9 Conv1d [out, in, k] -> [k, in, out],
        # 2/6 GroupNorm
        def _conv1d(prefix):
            return {
                "kernel": np.ascontiguousarray(
                    np.transpose(sd[prefix + ".weight"], (2, 1, 0))
                ),
                "bias": np.asarray(sd[prefix + ".bias"]),
            }

        backbone["upConv1d"] = {
            "up0": _convtranspose1d_as_dense("backbone.upConv1d.0"),
            "conv0": _conv1d("backbone.upConv1d.1"),
            "norm0": _groupnorm(sd, "backbone.upConv1d.2"),
            "up1": _convtranspose1d_as_dense("backbone.upConv1d.4"),
            "conv1": _conv1d("backbone.upConv1d.5"),
            "norm1": _groupnorm(sd, "backbone.upConv1d.6"),
            "up2": _convtranspose1d_as_dense("backbone.upConv1d.8"),
            "conv2": _conv1d("backbone.upConv1d.9"),
        }

    i = 0
    while f"backbone.encoderLayers.{i}.mhaBlockF.scale" in sd or any(
        key.startswith(f"backbone.encoderLayers.{i}.") for key in sd
    ):
        layer = {}
        base = f"backbone.encoderLayers.{i}"
        for tag in ("F", "T", "All0", "FT"):
            if f"{base}.mhaBlock{tag}.scale" in sd:
                layer[f"mhaBlock{tag}"] = _attn_block(sd, f"{base}.mhaBlock{tag}")
            if f"{base}.fnnBlock{tag}.scale" in sd:
                layer[f"fnnBlock{tag}"] = _ffn_block(sd, f"{base}.fnnBlock{tag}")
        if not layer:
            break
        backbone[f"encoderLayers_{i}"] = layer
        i += 1
    return backbone


def convert_state_dict(sd: Dict[str, Any], conf) -> Dict[str, Any]:
    """torch state_dict (tensors or numpy arrays) -> flax params dict."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in sd.items()}
    backbone = convert_backbone(sd)

    params = {
        "frontend": {
            "win_sigma": np.asarray(
                sd["framewiseFeatureExtractor.spectrogramExtractor.winGen.sigma"]
            ),
            "win_center": np.asarray(
                sd["framewiseFeatureExtractor.spectrogramExtractor.winGen.center"]
            ),
        },
        "backbone": backbone,
        "scorer": {"map": _linear(sd, "scorer.map.0")},
        "velocityPredictor": _mlp_head(sd, "velocityPredictor"),
        "refinedOFPredictor": _mlp_head(sd, "refinedOFPredictor"),
    }
    return {"params": params}


def _gru_cell(sd, prefix, suffix):
    """torch GRU layer params -> flax GRUCell dict.  torch gate order is
    (r, z, n); torch keeps two redundant biases for r/z which flax merges."""
    w_ih = np.asarray(sd[f"{prefix}.weight_ih_{suffix}"])  # [3H, in]
    w_hh = np.asarray(sd[f"{prefix}.weight_hh_{suffix}"])  # [3H, H]
    b_ih = np.asarray(sd[f"{prefix}.bias_ih_{suffix}"])
    b_hh = np.asarray(sd[f"{prefix}.bias_hh_{suffix}"])
    h = w_hh.shape[1]
    wir, wiz, win = w_ih[:h], w_ih[h : 2 * h], w_ih[2 * h :]
    whr, whz, whn = w_hh[:h], w_hh[h : 2 * h], w_hh[2 * h :]
    bir, biz, bin_ = b_ih[:h], b_ih[h : 2 * h], b_ih[2 * h :]
    bhr, bhz, bhn = b_hh[:h], b_hh[h : 2 * h], b_hh[2 * h :]
    return {
        "ir": {"kernel": np.ascontiguousarray(wir.T), "bias": bir + bhr},
        "iz": {"kernel": np.ascontiguousarray(wiz.T), "bias": biz + bhz},
        "in": {"kernel": np.ascontiguousarray(win.T), "bias": bin_},
        "hr": {"kernel": np.ascontiguousarray(whr.T)},
        "hz": {"kernel": np.ascontiguousarray(whz.T)},
        "hn": {"kernel": np.ascontiguousarray(whn.T), "bias": bhn},
    }


def _batchnorm(sd, prefix):
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def _mlp3(sd, prefix):
    return {
        "lin1": _linear(sd, prefix + ".0"),
        "lin2": _linear(sd, prefix + ".3"),
        "lin3": _linear(sd, prefix + ".6"),
    }


def convert_state_dict_ablation(sd: Dict[str, Any], conf) -> Dict[str, Any]:
    """torch V1 (Model_ablation) state_dict -> flax variables
    ({'params': ..., 'batch_stats': ...})."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in sd.items()}
    params: Dict[str, Any] = {
        "frontend": {
            "win_sigma": sd[
                "framewiseFeatureExtractor.spectrogramExtractor.winGen.sigma"
            ],
            "win_center": sd[
                "framewiseFeatureExtractor.spectrogramExtractor.winGen.center"
            ],
        },
        "inputProj": _linear(sd, "inputProj.0"),
        "pitchEmbedding": {"embedding": sd["pitchEmbedding.weight"]},
        "velocityPredictor": _mlp3(sd, "velocityPredictor"),
        "refinedOFPredictor": _mlp3(sd, "refinedOFPredictor"),
    }
    batch_stats: Dict[str, Any] = {}

    # conv pre-layers with BatchNorm running stats
    i = 0
    while f"preLayer.layers.{i}.conv1.weight" in sd:
        base = f"preLayer.layers.{i}"
        block_p: Dict[str, Any] = {
            "conv1": _conv2d(sd, base + ".conv1"),
            "conv2": _conv2d(sd, base + ".conv2"),
        }
        block_s: Dict[str, Any] = {}
        for bn in ("bn1", "bn2"):
            p, s = _batchnorm(sd, f"{base}.{bn}")
            block_p[bn] = p
            block_s[bn] = s
        params[f"preLayer_{i}"] = block_p
        batch_stats[f"preLayer_{i}"] = block_s
        i += 1

    # bidirectional GRU stack + out projection
    ctx: Dict[str, Any] = {"outProj": _linear(sd, "contextModel.outProj")}
    layer = 0
    while f"contextModel.grus.weight_ih_l{layer}" in sd:
        ctx[f"gru{layer}_fwd"] = _gru_cell(sd, "contextModel.grus", f"l{layer}")
        ctx[f"gru{layer}_bwd"] = _gru_cell(
            sd, "contextModel.grus", f"l{layer}_reverse"
        )
        layer += 1
    params["contextModel"] = ctx

    # pairwise scorer
    pw: Dict[str, Any] = {}
    for name, tname in [("scoreMap", "scoreMap"), ("scoreMapSkip", "scoreMapSkip")]:
        for j, idx in enumerate((0, 3, 6)):
            pw[f"{name}_{j}"] = _linear(sd, f"pairwiseScore.{tname}.{idx}")
    if "pairwiseScore.post.map.0.weight" in sd:
        pw["post"] = {
            "conv1": _conv2d(sd, "pairwiseScore.post.map.0"),
            "conv2": _conv2d(sd, "pairwiseScore.post.map.3"),
        }
    params["pairwiseScore"] = pw

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str, conf, prefer_best: bool = True):
    """Load a reference ``.pt`` checkpoint file into flax params
    (ref ``transcribe.py:49-62``: ``best_state_dict`` preferred, tolerant)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    key = "best_state_dict" if prefer_best and "best_state_dict" in ckpt else "state_dict"
    return convert_state_dict(ckpt[key], conf)
