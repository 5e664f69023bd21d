"""Torch→Flax weight conversion for the vision backbones.

The reference trains timm `tf_efficientnet_bX_ns` / `convnext*` backbones;
deployment parity therefore needs a checkpoint-conversion path (SURVEY.md §7
hard-part 6). This module maps HuggingFace-transformers state dicts (the
torch implementation available in this offline image; timm/torchvision
layouts differ only in key names) onto the mmtrs_tpu Flax modules:

- :func:`efficientnet_from_hf` — transformers.EfficientNetModel → params/
  batch_stats for models.backbones.efficientnet.EfficientNet;
- :func:`convnext_from_hf` — transformers.ConvNextModel → ConvNeXt.

Conventions: torch conv OIHW → flax HWIO; depthwise torch (C,1,kh,kw) →
flax (kh,kw,1,C); BatchNorm weight/bias/running_mean/running_var →
scale/bias/mean/var. The parity test (tests/test_convert.py) runs a
random-initialized HF model and the converted Flax model on the same input
and asserts elementwise agreement — i.e. the Flax architectures are
layer-exact re-implementations, so loading real pretrained weights is purely
mechanical once weights are present on disk.
"""

from __future__ import annotations

import math

import numpy as np

from mmtrs_tpu.models.backbones.efficientnet import (
    _BASE_BLOCKS,
    _SCALING,
    _round_channels,
    _round_repeats,
)


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def _conv(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _dwconv(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)  # (C,1,kh,kw) → (kh,kw,1,C)


def _bn(sd, prefix):
    return (
        {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])},
        {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])},
    )


def efficientnet_from_hf(state_dict: dict, variant: str = "b0") -> dict:
    """HF EfficientNetModel state_dict → {"params": ..., "batch_stats": ...}
    for EfficientNet(variant, num_classes=0)."""
    sd = state_dict
    wm, dm, _, _ = _SCALING[variant]
    params: dict = {}
    stats: dict = {}

    params["conv_stem"] = {"kernel": _conv(sd["embeddings.convolution.weight"])}
    p, s = _bn(sd, "embeddings.batchnorm")
    params["bn_stem"], stats["bn_stem"] = p, s

    flat = 0
    for si, (e, c, r, strd, k) in enumerate(_BASE_BLOCKS):
        for j in range(_round_repeats(r * dm)):
            name = f"stage{si}_block{j}"
            hf = f"encoder.blocks.{flat}"
            blk_p: dict = {}
            blk_s: dict = {}
            if e != 1:
                blk_p["pw_expand"] = {
                    "kernel": _conv(sd[f"{hf}.expansion.expand_conv.weight"])
                }
                p, s = _bn(sd, f"{hf}.expansion.expand_bn")
                blk_p["bn0"], blk_s["bn0"] = p, s
            blk_p["dw"] = {
                "kernel": _dwconv(sd[f"{hf}.depthwise_conv.depthwise_conv.weight"])
            }
            p, s = _bn(sd, f"{hf}.depthwise_conv.depthwise_norm")
            blk_p["bn1"], blk_s["bn1"] = p, s
            blk_p["se"] = {
                "reduce": {
                    "kernel": _conv(sd[f"{hf}.squeeze_excite.reduce.weight"]),
                    "bias": _t(sd[f"{hf}.squeeze_excite.reduce.bias"]),
                },
                "expand": {
                    "kernel": _conv(sd[f"{hf}.squeeze_excite.expand.weight"]),
                    "bias": _t(sd[f"{hf}.squeeze_excite.expand.bias"]),
                },
            }
            blk_p["pw_project"] = {
                "kernel": _conv(sd[f"{hf}.projection.project_conv.weight"])
            }
            p, s = _bn(sd, f"{hf}.projection.project_bn")
            blk_p["bn2"], blk_s["bn2"] = p, s
            params[name] = blk_p
            stats[name] = blk_s
            flat += 1

    params["conv_head"] = {"kernel": _conv(sd["encoder.top_conv.weight"])}
    p, s = _bn(sd, "encoder.top_bn")
    params["bn_head"], stats["bn_head"] = p, s
    return {"params": params, "batch_stats": stats}


def convnext_from_hf(state_dict: dict, variant: str = "tiny", v2: bool = False) -> dict:
    """HF ConvNextModel state_dict → params for ConvNeXt(variant, num_classes=0)."""
    from mmtrs_tpu.models.backbones.convnext import _CONFIGS

    sd = state_dict
    depths, dims = _CONFIGS[variant]
    params: dict = {}

    params["stem_conv"] = {
        "kernel": _conv(sd["embeddings.patch_embeddings.weight"]),
        "bias": _t(sd["embeddings.patch_embeddings.bias"]),
    }
    params["stem_norm"] = {
        "scale": _t(sd["embeddings.layernorm.weight"]),
        "bias": _t(sd["embeddings.layernorm.bias"]),
    }
    for si, depth in enumerate(depths):
        if si > 0:
            params[f"down{si}_norm"] = {
                "scale": _t(sd[f"encoder.stages.{si}.downsampling_layer.0.weight"]),
                "bias": _t(sd[f"encoder.stages.{si}.downsampling_layer.0.bias"]),
            }
            params[f"down{si}_conv"] = {
                "kernel": _conv(sd[f"encoder.stages.{si}.downsampling_layer.1.weight"]),
                "bias": _t(sd[f"encoder.stages.{si}.downsampling_layer.1.bias"]),
            }
        for j in range(depth):
            hf = f"encoder.stages.{si}.layers.{j}"
            blk = {
                "dwconv": {
                    "kernel": _dwconv(sd[f"{hf}.dwconv.weight"]),
                    "bias": _t(sd[f"{hf}.dwconv.bias"]),
                },
                "norm": {
                    "scale": _t(sd[f"{hf}.layernorm.weight"]),
                    "bias": _t(sd[f"{hf}.layernorm.bias"]),
                },
                "pwconv1": {
                    "kernel": _t(sd[f"{hf}.pwconv1.weight"]).T,
                    "bias": _t(sd[f"{hf}.pwconv1.bias"]),
                },
                "pwconv2": {
                    "kernel": _t(sd[f"{hf}.pwconv2.weight"]).T,
                    "bias": _t(sd[f"{hf}.pwconv2.bias"]),
                },
            }
            if not v2:
                blk["gamma"] = _t(sd[f"{hf}.layer_scale_parameter"])
            params[f"stage{si}_block{j}"] = blk

    # HF's final layernorm corresponds to our head_norm
    params["head_norm"] = {
        "scale": _t(sd["layernorm.weight"]),
        "bias": _t(sd["layernorm.bias"]),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# Loading converted weights into trainers
# ---------------------------------------------------------------------------


def _deep_merge(dst: dict, src: dict, path: str = "") -> dict:
    out = dict(dst)
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"pretrained key {path + k} absent from model tree")
        if isinstance(v, dict):
            out[k] = _deep_merge(dst[k], v, path + k + "/")
        else:
            have = np.asarray(dst[k])
            give = np.asarray(v)
            if have.shape != give.shape:
                raise ValueError(
                    f"shape mismatch at {path + k}: model {have.shape} vs "
                    f"pretrained {give.shape}"
                )
            out[k] = give.astype(have.dtype)
    return out


def merge_pretrained(variables: dict, pretrained: dict) -> dict:
    """Load converted backbone weights into a model's initialized
    ``variables`` (the reference's timm pretrained=True —
    train_hard.py:155-157 / train_mm_joint_dualtask.py:375).

    The backbone may be the whole model (VisionTrainer with num_classes=0
    trees) or a named/auto-named submodule (MMJointDualHead, MILNet): the
    host subtree is located as the unique node containing every top-level
    pretrained key. Freshly-initialized heads are left untouched; missing
    keys or shape mismatches raise loudly.
    """
    out = {k: v for k, v in variables.items()}
    for col, sub in pretrained.items():
        if col not in variables or not sub:
            continue
        target = variables[col]
        keys = set(sub)
        if keys <= set(target):
            out[col] = _deep_merge(target, sub)
            continue
        hosts = [
            k for k, v in target.items()
            if isinstance(v, dict) and keys <= set(v)
        ]
        if len(hosts) != 1:
            raise KeyError(
                f"cannot locate backbone subtree for collection '{col}' "
                f"(candidates: {hosts})"
            )
        merged = dict(target)
        merged[hosts[0]] = _deep_merge(target[hosts[0]], sub, hosts[0] + "/")
        out[col] = merged
    return out
