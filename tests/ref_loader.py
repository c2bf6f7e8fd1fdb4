"""Load the reference PyTorch transkun package from /root/reference at test
time (never copied), stubbing its unavailable third-party deps."""

import sys
import types

REF_ROOT = "/root/reference"


def load_reference_transkun():
    import numpy as np
    import torch

    # stub modules the reference imports at module scope but that we only
    # need for code paths not exercised in parity tests
    for name in ["pretty_midi", "mir_eval", "ncls"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "torchaudio" not in sys.modules:
        from transkun_tpu.ops import frontend

        ta = types.ModuleType("torchaudio")
        func = types.ModuleType("torchaudio.functional")

        def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
            return torch.from_numpy(
                frontend.melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate)
            )

        func.melscale_fbanks = melscale_fbanks
        ta.functional = func
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = func

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import transkun.ModelTransformer as ref_model

    return ref_model
