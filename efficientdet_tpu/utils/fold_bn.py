"""Inference-time BatchNorm folding (constant-preserving, measured ~1.8x on
the bandwidth-bound early backbone stages).

At inference BN is the affine ``y = s*x + t`` with ``s = gamma/sqrt(var+eps)``
and ``t = beta - s*mean``. Folding multiplies the preceding conv's kernel by
``s`` (per output channel) and moves ``t`` into the conv bias, eliminating
the BN op — and, crucially on TPU, the bf16->f32->bf16 conversion passes
around it that XLA does not fuse into the conv epilogue.

Folded are: every backbone conv+BN pair, every BiFPN conv/sepconv+BN pair,
and the heads. Head BNs are *per-level* while head conv weights are *shared
across levels* (SURVEY.md SS2 "Class/Box heads"), so they fold into
per-level COPIES of the pointwise kernel (inference params grow ~5x on those
1x1s — irrelevant next to activations) while the depthwise stays shared.
No BatchNorm op survives in the fused graph.

Usage::

    fused_model = EfficientDet(config=model.config, dtype=model.dtype,
                               fuse_bn=True)
    fused_vars = fold_bn_variables(variables, eps=model.config.bn_epsilon)
    out = fused_model.apply(fused_vars, images, train=False)  # same numerics
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import numpy as np


def _fold_pair(conv: Dict[str, Any], bn_p: Dict[str, Any],
               bn_s: Dict[str, Any], eps: float) -> Dict[str, Any]:
    """Fold one BN (params bn_p, stats bn_s) into a conv {'kernel'[, 'bias']}."""
    scale = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    s = scale / np.sqrt(var + eps)
    t = beta - s * mean
    kernel = np.asarray(conv["kernel"], np.float32)
    new_kernel = kernel * s  # broadcast over trailing (out-channel) dim
    old_bias = np.asarray(conv.get("bias", 0.0), np.float32)
    new_bias = old_bias * s + t
    dtype = np.asarray(conv["kernel"]).dtype
    return {"kernel": new_kernel.astype(dtype),
            "bias": new_bias.astype(np.float32).astype(dtype)
            if np.ndim(new_bias) else np.full(kernel.shape[-1], float(new_bias), dtype)}


def _bn_partner(key: str) -> str | None:
    """BN param key -> sibling conv key, for foldable BNs only."""
    if key == "bn":
        return "conv"  # FusedNode: SeparableConv named 'conv'
    if key.endswith("_bn"):
        return key[:-3] + "_conv"
    return None


def _walk(params: Dict[str, Any], stats: Dict[str, Any], eps: float) -> None:
    """In-place: fold foldable (conv, bn) sibling pairs, recurse elsewhere."""
    bn_keys = [k for k in list(params) if _bn_partner(k) and _bn_partner(k) in params]
    for k in bn_keys:
        conv_key = _bn_partner(k)
        conv = params[conv_key]
        if "kernel" in conv:
            params[conv_key] = _fold_pair(conv, params[k], stats[k], eps)
        elif "pointwise" in conv:  # SeparableConv: fold into the 1x1
            conv["pointwise"] = _fold_pair(conv["pointwise"], params[k],
                                           stats[k], eps)
        else:  # pragma: no cover - unknown structure, fail loudly
            raise ValueError(f"cannot fold BN {k!r} into {conv_key!r}")
        del params[k]
        del stats[k]
    for k, v in params.items():
        if isinstance(v, dict):
            _walk(v, stats.get(k, {}), eps)


def _fold_head(net: Dict[str, Any], net_stats: Dict[str, Any], eps: float) -> None:
    """Restructure a head: per-level BN folds into a per-level pointwise COPY.

    Train-time tree: conv{i}/{depthwise,pointwise}, bn_l{lvl}_d{i}.
    Folded tree:     conv{i}_dw (shared depthwise), pw_l{lvl}_d{i} (per-level
    folded pointwise), final unchanged.
    """
    import re

    bn_keys = sorted(k for k in net if re.fullmatch(r"bn_l\d+_d\d+", k))
    if not bn_keys:
        return
    depth = 1 + max(int(re.search(r"_d(\d+)$", k).group(1)) for k in bn_keys)
    levels = 1 + max(
        int(re.search(r"bn_l(\d+)_", k).group(1)) for k in bn_keys
    )
    for i in range(depth):
        conv = net.pop(f"conv{i}")
        net[f"conv{i}_dw"] = {"kernel": conv["depthwise"]["kernel"]}
        for lvl in range(levels):
            bn_name = f"bn_l{lvl}_d{i}"
            net[f"pw_l{lvl}_d{i}"] = _fold_pair(
                conv["pointwise"], net[bn_name], net_stats[bn_name], eps
            )
        for lvl in range(levels):
            del net[f"bn_l{lvl}_d{i}"]
            del net_stats[f"bn_l{lvl}_d{i}"]


def fold_bn_variables(variables: Dict[str, Any], eps: float = 1e-3) -> Dict[str, Any]:
    """{'params', 'batch_stats'} (trained) -> variables for fuse_bn=True model.

    All BNs disappear; the returned tree normally has no batch_stats.
    """
    params = copy.deepcopy(
        {k: np.asarray(v) for k, v in _tree_np(variables["params"]).items()}
    )
    params = _unflatten_np(params)
    stats = _unflatten_np(
        {k: np.asarray(v) for k, v in _tree_np(variables.get("batch_stats", {})).items()}
    )
    for top in ("backbone", "bifpn"):
        if top in params:
            _walk(params[top], stats.get(top, {}), eps)
    for top in ("class_net", "box_net"):
        if top in params and "net" in params[top]:
            _fold_head(params[top]["net"], stats.get(top, {}).get("net", {}), eps)
    # prune now-empty stat subtrees
    stats = _prune_empty(stats)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# "/"-joined views over convert.py's canonical tuple-key flatten/unflatten —
# ONE pytree walker for the whole package (review: two parallel copies had
# to be kept in sync by hand).
def _tree_np(tree: Dict[str, Any]) -> Dict[str, Any]:
    from efficientdet_tpu.utils.convert import _flatten

    return {"/".join(k): v for k, v in _flatten(tree).items()}


def _unflatten_np(flat: Dict[str, Any]) -> Dict[str, Any]:
    from efficientdet_tpu.utils.convert import _unflatten

    return _unflatten({tuple(k.split("/")): v for k, v in flat.items()})


def _prune_empty(tree: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            v = _prune_empty(v)
            if v:
                out[k] = v
        else:
            out[k] = v
    return out
