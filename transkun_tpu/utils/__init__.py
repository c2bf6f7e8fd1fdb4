"""Small shared utilities (see also jax_setup / profiling / torch_convert)."""

import jax


def compute_param_size(params) -> float:
    """Total parameter count of a pytree, in millions.

    Mirrors the reference's `computeParamSize` (`transkun/Util.py:8-13`),
    which the reference prints at model startup (`ModelTransformer.py:855`).
    """
    return sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6
