"""One-way torch .pth -> Flax checkpoint converter.

Maps the reference MSTransception state_dict (keyed by the torch module
tree of networks/MSTr.py) onto this framework's param/batch_stats pytrees.
The conversion is driven by the *flax* tree: every flax leaf derives its
torch key via deterministic name translation, fetches the tensor, and
applies the layout transform (torch OIHW conv -> flax HWIO; torch (out,in)
linear -> flax (in,out); torch 1x1 conv -> flax dense for the attention
projections that this rebuild expresses as Dense).

Unused reference parameters (dead modules: MixFFN_skip.norm2/norm3,
backbone conv1_1_s*/cpe, channel-attn scale_reduce, fc{1-4}_back, CAM crpe,
per-layer sp scale_fuse_att beyond layer 1) are reported, not errors.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# flax list-module name -> torch ModuleList name.
_LIST_RENAMES = {
    "block1": "block1",
    "block2": "block2",
    "block3": "block3",
    "block4": "block4",
    "mhca_blks": "mhca_blks",
    "layers": "MHCA_layers",
    "patch_embeds": "patch_embeds",
    "conv": "conv_list",  # ConvRelPosEnc conv_{j}
    "stem": "stem",
    "group_attention": "group_attention",
    "fc_back": "fc_back",
    "fcs": "fcs",
}

_PLAIN_RENAMES = {
    "inv_res": "InvRes",
    "channel_attention": "channelAttention",
}

_LIST_RE = re.compile(r"^([a-zA-Z_0-9]*?)_(\d+)$")

_LEAF_RENAMES = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
    "gamma": "gamma",
}

# Context-sensitive renames: (parent module in flax path, flax name) ->
# torch relative name. Used for fusion blocks whose torch versions are
# nn.Sequential with numeric children.
_CONTEXT_RENAMES = {
    # SE_Block (MSTr.py:571-594)
    ("se", "fc1"): "excitation.0",
    ("se", "fc2"): "excitation.2",
    # CBAM ChannelAttention (MSTr.py:1128-1146)
    ("ca", "se_fc1"): "se.0",
    ("ca", "se_fc2"): "se.2",
}


def flax_path_to_torch_key(path: str, context: str = "mstransception") -> str:
    """'backbone/block1_0/attn/keys/kernel' -> 'backbone.block1.0.attn.keys.weight'."""
    elems = path.split("/")
    leaf = elems[-1]
    body = elems[:-1]

    # Drop norm-wrapper inner levels ('ln' under LayerNorm, 'bn' under
    # BatchNorm wrappers) — they have no torch counterpart level.
    if len(body) >= 1 and body[-1] in ("ln", "bn"):
        body = body[:-1]

    out: List[str] = []
    for i, e in enumerate(body):
        m = _LIST_RE.match(e)
        if m and m.group(1) in _LIST_RENAMES:
            out.append(_LIST_RENAMES[m.group(1)])
            out.append(m.group(2))
            continue
        if e in _PLAIN_RENAMES:
            out.append(_PLAIN_RENAMES[e])
            continue
        # SE/CBAM sequential renames keyed on flax parent names.
        parent = body[i - 1] if i > 0 else ""
        # CBAM/SE fusion blocks live under 'aggregate' or 'ca'/'sa'.
        if (parent, e) in _CONTEXT_RENAMES:
            out.append(_CONTEXT_RENAMES[(parent, e)])
            continue
        if e == "se_fc1":
            out.append("se.0")
            continue
        if e == "se_fc2":
            out.append("se.2")
            continue
        out.append(e)
    key = ".".join(out)

    # Fusion-block Sequential flattening, applied on the joined key.
    key = key.replace("aggregate.fc1", "aggregate.excitation.0")
    key = key.replace("aggregate.fc2", "aggregate.excitation.2")
    # SK vs CBAM Sequential conv/bn placements are disambiguated at
    # conversion time via the _candidate_keys fallbacks.
    full = f"{key}.{_LEAF_RENAMES.get(leaf, leaf)}"
    # Bridge 'para' proj_act (Linear, LN, GELU — MSTr.py:2506-2510).
    full = full.replace("bridge.proj.", "bridge.proj_act.0.")
    full = full.replace("bridge.proj_norm.", "bridge.proj_act.1.")
    # sp bridge: the shared SpatialAwareTrans lives inside reference
    # bridge_layer1 (MSTr.py:2682).
    full = full.replace("bridge.bridge_layer1_sp.",
                        "bridge.bridge_layer1.scale_fuse_att.")
    return full


# Fallback torch keys tried in order when the primary key is absent —
# handles Sequential-wrapped conv/bn in the fusion blocks.
def _candidate_keys(key: str) -> List[str]:
    cands = [key]
    # CBAMBlock: conv -> conv2d_bn_act.0, bn -> conv2d_bn_act.1.
    cands.append(re.sub(r"aggregate\.conv\.weight$",
                        "aggregate.conv2d_bn_act.0.weight", key))
    cands.append(re.sub(r"aggregate\.bn\.", "aggregate.conv2d_bn_act.1.", key))
    # SK_Block: conv -> conv_bn_ac.0, bn -> conv_bn_ac.2.
    cands.append(re.sub(r"aggregate\.conv\.(weight|bias)$",
                        r"aggregate.conv_bn_ac.0.\1", key))
    cands.append(re.sub(r"aggregate\.bn\.", "aggregate.conv_bn_ac.2.", key))
    # SE_Block keeps plain conv/bn names.
    # Conv3d variants: conv3d kernel/bias handled separately.
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def _to_flax_tensor(torch_tensor, flax_leaf: np.ndarray, path: str):
    """Apply the layout transform torch -> flax for one tensor."""
    t = np.asarray(torch_tensor, dtype=np.float32)
    want = flax_leaf.shape
    if path.endswith("conv3d_kernel"):
        # torch Conv3d (O, C, P, 1, 1) -> (O, C*P).
        t = t.reshape(t.shape[0], -1)
    elif t.ndim == 4 and len(want) == 4:
        t = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif t.ndim == 4 and len(want) == 2:
        t = t.reshape(t.shape[0], t.shape[1]).T  # 1x1 conv -> dense
    elif t.ndim == 2 and len(want) == 2:
        t = t.T  # (out,in) -> (in,out)
    if t.shape != tuple(want):
        raise ValueError(f"shape mismatch at {path}: torch {t.shape} "
                         f"vs flax {tuple(want)}")
    return t


def convert_state_dict(state_dict: Dict[str, Any], variables: Dict
                       ) -> Tuple[Dict, Dict[str, Any]]:
    """Fill `variables` (init-structured {'params', 'batch_stats'}) from a
    torch state_dict. Returns (new_variables, report)."""
    import jax

    sd = {}
    for k, v in state_dict.items():
        k = k[7:] if k.startswith("module.") else k  # DataParallel prefix
        sd[k] = v

    used = set()
    missing: List[str] = []

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    def fill(collection):
        def one(kp, leaf):
            p = path_str(kp)
            if "mhca_blks_stacked" in p:
                # vectorize_paths layout: leading path axis stacks the
                # per-path torch modules mhca_blks.{i}.
                leaf_np = np.asarray(leaf)
                num_p = leaf_np.shape[0]
                parts = []
                for i in range(num_p):
                    sub = p.replace("mhca_blks_stacked", f"mhca_blks_{i}")
                    key = flax_path_to_torch_key(sub)
                    if key not in sd:
                        missing.append(f"{p} -> {key}")
                        return leaf_np
                    used.add(key)
                    parts.append(_to_flax_tensor(sd[key], leaf_np[i], sub))
                return np.stack(parts)
            key = flax_path_to_torch_key(p)
            for cand in _candidate_keys(key):
                if cand in sd:
                    used.add(cand)
                    return _to_flax_tensor(sd[cand], np.asarray(leaf), p)
            # conv3d params: interact_concat Sequential.
            if p.endswith("conv3d_kernel") or p.endswith("conv3d_bias"):
                base = key.rsplit(".", 1)[0].rsplit(".", 1)[0]
                leafname = ("weight" if p.endswith("kernel") else "bias")
                cand = f"{base}.interact_concat.0.{leafname}"
                if cand in sd:
                    used.add(cand)
                    return _to_flax_tensor(sd[cand], np.asarray(leaf), p)
            missing.append(f"{p} -> {key}")
            return np.asarray(leaf)

        return jax.tree_util.tree_map_with_path(one, collection)

    new_params = fill(variables["params"])
    new_stats = (fill(variables["batch_stats"])
                 if "batch_stats" in variables else {})
    if missing:
        raise KeyError("unconverted flax params:\n" + "\n".join(missing[:40])
                       + (f"\n... and {len(missing) - 40} more"
                          if len(missing) > 40 else ""))
    report = {
        "n_converted": len(used),
        "unused_torch_keys": sorted(
            k for k in sd
            if k not in used and not k.endswith("num_batches_tracked")),
    }
    out = dict(variables)
    out["params"] = new_params
    if "batch_stats" in variables:
        out["batch_stats"] = new_stats
    return out, report


def load_pth_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a .pth state_dict on CPU as numpy arrays."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
