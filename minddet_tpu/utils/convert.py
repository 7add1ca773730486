"""Checkpoint conversion: PyTorch (and MindSpore-naming) -> minddet_tpu flax.

The reference ships per-model torch->MindSpore converters with hand-written
name remaps (``centernet/convert_ckpt.py``, ``centerpoint/det3d_ms/models/
detectors/point_pillars.py:137-168``, ``pointpillars/src/utils.py:48-56``).
Here conversion is one rule engine: regex name rewrites + automatic layout
transposition (torch OIHW conv -> flax HWIO, torch (out,in) linear -> flax
(in,out), BN running stats -> batch_stats), so a model family only declares
its name-mapping table. BASELINE.json requires 1:1 conversion for mAP-parity
evaluation against reference checkpoints.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _set_nested(tree: Dict, path: Sequence[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_tensor(name: str, tensor: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map a torch parameter leaf-name + layout to the flax convention."""
    arr = np.asarray(tensor)
    if name == "weight":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:  # linear (out, in) -> (in, out)
            return "kernel", arr.T
        return "scale", arr  # norm weight
    if name == "bias":
        return "bias", arr
    if name == "running_mean":
        return "mean", arr
    if name == "running_var":
        return "var", arr
    return name, arr


def convert_state_dict(
    state_dict: Dict[str, Any],
    rename_rules: Sequence[Tuple[str, str]],
    bn_scopes: Sequence[str] = ("bn", "norm", "downsample_bn"),
    drop: Sequence[str] = ("num_batches_tracked",),
) -> Dict[str, Dict]:
    """torch state_dict -> {'params': ..., 'batch_stats': ...} pytrees.

    ``rename_rules``: ordered (regex, replacement) applied to the dotted module
    path (not the leaf). A module whose final path component matches any
    ``bn_scopes`` entry routes weight/bias to params (scale/bias) and
    running stats to batch_stats.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    for full_name, tensor in state_dict.items():
        if any(full_name.endswith(d) for d in drop):
            continue
        if hasattr(tensor, "detach"):
            tensor = tensor.detach().cpu().numpy()
        parts = full_name.split(".")
        module_path, leaf = ".".join(parts[:-1]), parts[-1]
        for pat, repl in rename_rules:
            module_path = re.sub(pat, repl, module_path)
        new_leaf, arr = convert_tensor(leaf, tensor)
        path = [p for p in module_path.split(".") if p]
        if new_leaf in ("mean", "var"):
            _set_nested(batch_stats, path + [new_leaf], arr)
        else:
            _set_nested(params, path + [new_leaf], arr)
    return {"params": params, "batch_stats": batch_stats}


def tree_paths(tree: Dict, prefix: str = "") -> List[str]:
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(tree_paths(v, p))
        else:
            out.append(p)
    return sorted(out)


def report_mismatches(converted: Dict, target: Dict) -> Dict[str, List[str]]:
    """Which target leaves are missing / unexpected / shape-mismatched.

    The equivalent of the reference's not-loaded-parameter reporting
    (``centernet/train.py:188-191``).
    """
    def leaves(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                yield from leaves(v, p)
            else:
                yield p, v

    conv = dict(leaves(converted))
    tgt = dict(leaves(target))
    missing = sorted(set(tgt) - set(conv))
    unexpected = sorted(set(conv) - set(tgt))
    bad_shape = sorted(
        p for p in set(conv) & set(tgt)
        if tuple(np.shape(conv[p])) != tuple(np.shape(tgt[p]))
    )
    return {"missing": missing, "unexpected": unexpected, "shape_mismatch": bad_shape}


def apply_converted(target_variables: Dict, converted: Dict, strict: bool = False) -> Dict:
    """Overlay converted leaves onto an initialized variables pytree."""
    import jax

    report = {
        c: report_mismatches(converted.get(c, {}), target_variables.get(c, {}))
        for c in ("params", "batch_stats")
    }
    if strict:
        for c, r in report.items():
            assert not r["missing"] and not r["shape_mismatch"], (c, r)

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = overlay(out[k], v)
            elif k in out and not isinstance(v, dict):
                if tuple(np.shape(out[k])) == tuple(np.shape(v)):
                    out[k] = np.asarray(v, dtype=np.asarray(out[k]).dtype)
        return out

    return {
        c: overlay(target_variables.get(c, {}), converted.get(c, {}))
        for c in target_variables
    }


# ---------------------------------------------------------------------------
# Model-family rule tables
# ---------------------------------------------------------------------------

# torchvision-style ResNet -> minddet_tpu ResNet naming
RESNET_RULES: List[Tuple[str, str]] = [
    (r"^layer(\d+)\.(\d+)\.downsample\.0", r"layer\1_\2.downsample_conv"),
    (r"^layer(\d+)\.(\d+)\.downsample\.1", r"layer\1_\2.downsample_bn"),
    (r"^layer(\d+)\.(\d+)\.", r"layer\1_\2."),
    (r"^conv1$", "conv1"),
    (r"^bn1$", "bn1"),
]


def convert_resnet_backbone(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """torchvision resnet state_dict -> ResNet backbone variables."""
    sd = {k: v for k, v in state_dict.items() if not k.startswith("fc.")}
    return convert_state_dict(sd, RESNET_RULES)
