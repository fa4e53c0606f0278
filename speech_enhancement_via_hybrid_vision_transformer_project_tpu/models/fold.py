"""Inference-time BatchNorm folding.

In eval mode BatchNorm is a per-channel affine map with frozen stats:
``y = gamma * (x - mean) / sqrt(var + eps) + beta``. Following a bias-free
conv it is exactly absorbable into the conv itself:

    s  = gamma / sqrt(var + eps)
    W' = W * s          (per output channel)
    b' = beta - mean*s

``fold_batchnorm`` rewrites a trained HybridViT's variables into that
form for a ``fold_bn=True`` model clone (models/hybrid_vit.py) — one
fewer op chain per conv block in the inference graph. The reference has
no counterpart (torch/cuDNN does an equivalent fusion inside its
inference kernels; on TPU, XLA usually fuses the BN affine into the conv
epilogue too, so measure before assuming a win — benchmarks/bench_infer
``--fold-bn``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

BN_EPS = 1e-5  # matches ConvBlock/TransposeConvBlock


def fold_batchnorm(model, variables: Dict[str, Any]) -> Tuple[Any, Dict]:
    """Return ``(folded_model, folded_variables)`` for inference.

    ``model`` must be a HybridViT (or any module whose conv blocks follow
    the ConvBlock/TransposeConvBlock naming: ``<block>/Conv_0`` +
    ``<block>/BatchNorm_0``). Blocks without a BatchNorm (the final
    decoder layer) pass through untouched.
    """
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    new_params: Dict[str, Any] = {}
    for block, sub in params.items():
        if (
            isinstance(sub, dict)
            and "Conv_0" in sub
            and "BatchNorm_0" in sub
            and block in stats
        ):
            conv = sub["Conv_0"]
            bn = sub["BatchNorm_0"]
            st = stats[block]["BatchNorm_0"]
            gamma = np.asarray(bn["scale"], np.float32)
            beta = np.asarray(bn["bias"], np.float32)
            mean = np.asarray(st["mean"], np.float32)
            var = np.asarray(st["var"], np.float32)
            s = gamma / np.sqrt(var + BN_EPS)
            kernel = np.asarray(conv["kernel"], np.float32) * s  # [...,Cout]
            bias = beta - mean * s
            folded = dict(sub)
            folded["Conv_0"] = {"kernel": kernel, "bias": bias}
            del folded["BatchNorm_0"]
            new_params[block] = folded
        else:
            new_params[block] = sub

    # a BN that survives the fold would make the fold_bn=True model clone
    # fail far from here (missing conv bias / unused BN params) — turn a
    # silent partial fold into an immediate, attributable error
    leftover = [
        block
        for block, sub in new_params.items()
        if isinstance(sub, dict) and "BatchNorm_0" in sub
    ]
    if leftover:
        raise ValueError(
            "fold_batchnorm could not fold BatchNorm in block(s) "
            f"{leftover} (missing batch_stats or unexpected layout)"
        )

    import dataclasses

    import jax.numpy as jnp

    folded_model = dataclasses.replace(model, fold_bn=True, name=None)
    # return DEVICE arrays: host numpy leaves would be re-uploaded on
    # every jitted call (measured: 13 s/step through the TPU relay)
    folded_vars = jax.tree_util.tree_map(
        jnp.asarray, {"params": new_params}
    )
    return folded_model, folded_vars
