"""torch checkpoint -> JAX parameter conversion.

Converts (a) reference VFA `.pth` checkpoints (`train.py:168-180` format:
dict with 'model_state_dict') and (b) torchvision ImageNet ResNet weights
into this framework's parameter tree, for checkpoint-level parity evaluation
(BASELINE.md) and pretrained-backbone training.

Layout rules:
  conv   torch (O, I, kh, kw) -> flax (kh, kw, I, O)
  linear torch (O, I)         -> flax (I, O)
  GroupNorm / BatchNorm weight/bias -> scale/bias;
  BN running_mean/var -> batch_stats.

The reference's pretrained load is a *partial* state-dict update
(`vfa/model/resnet.py:176-180`): torchvision BN affine params land in the
GN layers of the same name (running stats dropped). Replicated here.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

# torch "module path" -> (flax scope path, kind)
# kind: conv | linear | norm (scale/bias) | bn (norm + running stats)
_HEAD_SEQS = {
    "fuse.0": ("fuse_0", "conv"),
    "fuse.1": ("fuse_1", "bn"),
    "fuse.3": ("fuse_3", "conv"),
    "fuse.4": ("fuse_4", "bn"),
    "map_classifier.0": ("map_classifier_0", "conv"),
    "tytx_pred.0": ("tytx_pred_0", "conv"),
    "tytx_pred.1": ("tytx_pred_1", "norm"),
    "tytx_pred.3": ("tytx_pred_3", "conv"),
    "orient_pred.0": ("orient_pred_0", "conv"),
    "thtwtl_pred.0": ("thtwtl_pred_0", "conv"),
    "thtwtl_pred.1": ("thtwtl_pred_1", "norm"),
    "thtwtl_pred.3": ("thtwtl_pred_3", "conv"),
    "lat8": ("lat8", "conv"),
    "lat16": ("lat16", "conv"),
    "lat32": ("lat32", "conv"),
    "bn8": ("bn8", "norm"),
    "bn16": ("bn16", "norm"),
    "bn32": ("bn32", "norm"),
}

_SKIP = re.compile(
    r"(num_batches_tracked|z_corners|corners_offset|^mean$|^std$)"
)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    assert path[-1] in node, f"missing param {'/'.join(path)}"
    old = node[path[-1]]
    assert tuple(old.shape) == tuple(value.shape), (
        f"shape mismatch at {'/'.join(path)}: {old.shape} vs {value.shape}"
    )
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _resnet_path(mod: str):
    """'layer2.1.conv1' -> ('layer2_1', 'conv1'); 'conv1' -> ('conv1',)."""
    m = re.match(r"layer(\d)\.(\d+)\.(.+)", mod)
    if m:
        inner = m.group(3).replace("downsample.0", "downsample_0") \
                          .replace("downsample.1", "downsample_1")
        return (f"layer{m.group(1)}_{m.group(2)}", *inner.split("."))
    return tuple(mod.split("."))


def convert_state_dict(
    state_dict: Dict[str, Any],
    params: Dict,
    batch_stats: Dict,
    strict: bool = True,
) -> Tuple[Dict, Dict]:
    """Map a reference VFA model_state_dict onto (params, batch_stats).

    Returns deep-copied updated trees. Unknown keys raise when strict.
    """
    import copy

    import jax

    params = jax.tree_util.tree_map(np.asarray, copy.deepcopy(params))
    batch_stats = jax.tree_util.tree_map(np.asarray, copy.deepcopy(batch_stats))

    for key, val in state_dict.items():
        v = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if _SKIP.search(key):
            continue
        if key.startswith("base."):
            mod, leaf = key[len("base."):].rsplit(".", 1)
            path = ("base",) + _resnet_path(mod)
            if leaf == "weight" and v.ndim == 4:
                _set(params, path + ("kernel",), _conv_kernel(v))
            elif leaf == "weight":
                _set(params, path + ("scale",), v)
            elif leaf == "bias":
                _set(params, path + ("bias",), v)
            elif strict:
                raise KeyError(key)
            continue
        m = re.match(r"vfa(8|16|32)\.collapse\.(weight|bias)", key)
        if m:
            s, leaf = m.groups()
            if leaf == "weight":
                _set(params, (f"vfa{s}_collapse_kernel",), v.T)
            else:
                _set(params, (f"vfa{s}_collapse_bias",), v)
            continue
        mod, leaf = key.rsplit(".", 1)
        if mod in _HEAD_SEQS:
            name, kind = _HEAD_SEQS[mod]
            if leaf == "weight" and kind == "conv":
                _set(params, (name, "kernel"), _conv_kernel(v))
            elif leaf == "bias" and kind == "conv":
                _set(params, (name, "bias"), v)
            elif leaf == "weight":
                _set(params, (name, "scale"), v)
            elif leaf == "bias":
                _set(params, (name, "bias"), v)
            elif leaf == "running_mean" and kind == "bn":
                _set(batch_stats, (name, "mean"), v)
            elif leaf == "running_var" and kind == "bn":
                _set(batch_stats, (name, "var"), v)
            elif strict:
                raise KeyError(key)
            continue
        if strict:
            raise KeyError(f"unmapped torch key: {key}")
    return params, batch_stats


def load_reference_checkpoint(path: str, params, batch_stats):
    """Load a reference `.pth` (torch.save of {'model_state_dict': ...})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return convert_state_dict(sd, params, batch_stats)


def load_torchvision_resnet_params(params, base: str = "resnet18"):
    """Partial-load torchvision ImageNet weights into the backbone, exactly
    like the reference (`resnet.py:151-180`): conv kernels map over; BN
    weight/bias land in the same-named GroupNorm affine; running stats and
    the fc head are dropped."""
    import copy

    import jax
    import torch.utils.model_zoo as model_zoo

    urls = {
        "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
        "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    }
    sd = model_zoo.load_url(urls[base])
    params = jax.tree_util.tree_map(np.asarray, copy.deepcopy(params))
    for key, val in sd.items():
        v = val.detach().cpu().numpy()
        if "num_batches_tracked" in key or "running_" in key or key.startswith("fc."):
            continue
        mod, leaf = key.rsplit(".", 1)
        path = ("base",) + _resnet_path(mod)
        try:
            if leaf == "weight" and v.ndim == 4:
                _set(params, path + ("kernel",), _conv_kernel(v))
            elif leaf == "weight":
                _set(params, path + ("scale",), v)
            elif leaf == "bias":
                _set(params, path + ("bias",), v)
        except (KeyError, AssertionError):
            # partial-load rule: keys absent from the model are skipped
            continue
    return params
