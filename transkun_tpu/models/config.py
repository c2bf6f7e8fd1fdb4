"""Model configuration (mirrors the reference ``ModelConfig`` defaults,
``transkun/ModelTransformer.py:17-66``) and the JSON conf-file loader that
plays the role of the reference's ``moduleconf`` system: the conf names a
model module + config class and carries the hyperparameter dict
(``transkun/pretrained/2.0.conf``)."""

from __future__ import annotations

import dataclasses
import importlib
import json
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class ModelConfig:
    f_min: float = 30
    f_max: float = 8000
    n_mels: int = 229

    segmentHopSizeInSecond: float = 8
    segmentSizeInSecond: float = 16

    hopSize: int = 1024
    windowSize: int = 4096
    fs: int = 44100
    nExtraWins: int = 5

    baseSize: int = 40
    downsampleF: bool = True

    posEmbedInitGamma: float = 1

    nHead: int = 4
    fourierSize: int = 64

    nLayers: int = 6
    enabledAttn: Tuple[str, ...] = ("F", "T")
    hiddenFactorAttn: float = 1
    hiddenFactor: float = 4

    velocityPredictorHiddenSize: int = 512
    refinedOFPredictorHiddenSize: int = 512

    scoringExpansionFactor: int = 4
    useInnerProductScorer: bool = True

    # Full ConvTranspose upsample stack + skip (ref
    # ``LayersTransformer.py:522-534,645-646``).  The reference never passes
    # this (its Backbone default True is used by every shipped config) but
    # keeps the capability; requires scoringExpansionFactor == 1 so the skip
    # and the conv stack land on the same channel count.
    upsampleProjOnly: bool = True

    scoreDropoutProb: float = 0.1
    contextDropoutProb: float = 0.1
    velocityDropoutProb: float = 0.1
    refinedOFDropoutProb: float = 0.1

    # encoder-block rematerialization (the reference hardcodes
    # torch.utils.checkpoint on every block, ``LayersTransformer.py:330-368``).
    # Slope-measured at flagship B=2 bf16 on v5e: remat is ~10% FASTER than
    # storing activations (fwd+bwd 115.6 vs 126.9 ms) — the encoder is
    # HBM-bound, so recomputing beats spilling/reloading the per-block
    # intermediates.  Keep True; ``cli/train.py --gradientCheckpoint``
    # overrides for other shapes.
    useGradientCheckpoint: bool = True

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if "enabledAttn" in kwargs:
            kwargs["enabledAttn"] = tuple(kwargs["enabledAttn"])
        return cls(**kwargs)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["enabledAttn"] = list(d["enabledAttn"])
        return d


# module names in conf files map reference modules -> ours
_MODULE_ALIASES = {
    "transkun.ModelTransformer": "transkun_tpu.models.transkun",
    "transkun.Model_ablation": "transkun_tpu.models.ablation",
}


def parse_conf_file(path: str):
    """Parse a reference-style JSON conf (see ``pretrained/2.0.conf``).

    Returns (model_module, config) where model_module exposes ``TransKun``.
    """
    with open(path) as f:
        conf = json.load(f)
    entry = conf["Model"]
    module_name = _MODULE_ALIASES.get(entry["module"], entry["module"])
    module = importlib.import_module(module_name)
    config_cls = getattr(module, entry.get("configClassName", "Config"))
    config = config_cls.from_dict(entry.get("config", {}))
    return module, config


def default_conf_path() -> str:
    """Path of the shipped flagship conf (same JSON schema as the reference's
    packaged ``transkun/pretrained/2.0.conf``, ``transcribe.py:22-25``)."""
    import os

    return os.path.join(os.path.dirname(__file__), "..", "pretrained", "2.0.conf")


def load_default_conf():
    """(model_module, config) for the shipped flagship V2 configuration —
    the single source of truth used by the CLI, bench, and driver entries."""
    return parse_conf_file(default_conf_path())


def write_conf_template(path: str, module: str = "transkun_tpu.models.transkun"):
    conf = {
        "Model": {
            "module": module,
            "configClassName": "Config",
            "config": ModelConfig().to_dict(),
        }
    }
    with open(path, "w") as f:
        json.dump(conf, f, indent=2)


Config = ModelConfig
