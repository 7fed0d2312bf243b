"""Device mesh + sharding utilities.

The reference's only parallelism is single-process torch DataParallel
(trainer.py:110-111). The TPU-native equivalent is GSPMD: one jit-compiled
train step over a `jax.sharding.Mesh`, with the batch sharded on a 'data'
axis and (optionally) wide weight matrices sharded on a 'model' axis. XLA
emits the all-reduces over ICI; there is no hand-written comm backend.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh.

    dp_size <= 0 means "use all remaining devices for data parallelism".
    On a single chip this degenerates to a 1x1 mesh, so all sharded code
    paths stay identical between 1 and N chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp_size < 1:
        tp_size = 1
    if dp_size <= 0:
        dp_size = n // tp_size
    assert dp_size * tp_size <= n, (
        f"mesh {dp_size}x{tp_size} needs {dp_size * tp_size} devices, have {n}")
    dev_array = np.asarray(devices[: dp_size * tp_size]).reshape(dp_size, tp_size)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def needs_safe_dwconv_grad(mesh: Mesh) -> bool:
    """True iff training over this mesh needs the GSPMD-safe depthwise
    kernel-grad VJP (ops/common.py:set_safe_dwconv_kernel_grad). The
    jax 0.9 bug (tests/test_tp_grads.py) multiplies the kernel grad by
    the product of the mesh axes the batch is NOT sharded on — only >=2
    nontrivial axes can make that product exceed 1, so single-device and
    pure-dp meshes take XLA's faster native conv grads."""
    return sum(1 for s in mesh.shape.values() if s > 1) >= 2


# Tensor-parallel param layout: shard the widest projection matrices on the
# 'model' axis. Rules are (path regex, PartitionSpec for the kernel). The
# model is ~30M params so TP is optional; these rules make the multi-chip
# dry-run exercise a real 2-D sharding, and scale headroom for larger dims.
_TP_RULES = (
    # FFN up-projections: shard output features. Bridge-layer FFNs are
    # excluded: sequence parallelism token-shards their inputs on the SAME
    # 'model' axis (models/bridge.py), and hidden-sharding the kernels too
    # gives SPMD two conflicting preferences — the backward's dwconv
    # grad-accumulation adds then hit the "involuntary full
    # rematerialization" fallback (12 warnings + the slow dp4x2 compile,
    # MULTICHIP_r03). The bridge FFN matrices are small (<=512x2048), so
    # TP there bought nothing; SP is the right parallelism for the bridge.
    (re.compile(r"^(?!.*bridge_layer).*(mix_ffn|mlp|mixffn)\d*/fc1/kernel$"),
     P(None, MODEL_AXIS)),
    # FFN down-projections: shard input features (row-parallel, pairs with
    # the column-parallel fc1 — value-verified vs unsharded, r2 bisect).
    (re.compile(r"^(?!.*bridge_layer).*(mix_ffn|mlp|mixffn)\d*/fc2/kernel$"),
     P(MODEL_AXIS, None)),
    # Attention qkv fused projections: shard output (head) dim.
    (re.compile(r".*/qkv(_linear)?/kernel$"), P(None, MODEL_AXIS)),
    # NOTE: deliberately NO rule for attention out-projections (/proj/).
    # Input-sharding the bridge channel attention's proj produced WRONG
    # VALUES (max |Δlogit| 3.37 vs unsharded, r2 bisect) — a GSPMD
    # miscompile around the reference's raw (B,N,C)->(B,C,N) reshape
    # (MSTr.py:2312-2314) feeding a contracting-dim-sharded dot; the
    # matrices are small (64x64) so TP there buys nothing anyway.
    # tests/test_sp_remat.py::test_sp_forward_matches_unsharded_exactly
    # guards TP value parity; revisit if the XLA bug is fixed.
)


def param_shard_rules(path: str, value) -> P:
    """PartitionSpec for one param given its flattened '/'-joined path."""
    if getattr(value, "ndim", 0) == 2:
        for rule, spec in _TP_RULES:
            if rule.match(path):
                return spec
    return P()  # replicated


def shard_params(params, mesh: Mesh):
    """Device-put a param pytree with TP rules applied (replicated otherwise).

    One tree-level device_put (not per-leaf) — per-leaf transfers are a
    round-trip each, which is pathological over a tunneled TPU."""

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    def sharding_for(kp, v):
        spec = param_shard_rules(path_str(kp), v)
        # Only shard if the dim divides evenly; fall back to replication.
        axes = mesh.shape
        for dim, name in zip(v.shape, spec):
            if name is not None and dim % axes[name] != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map_with_path(sharding_for, params)
    return jax.device_put(params, shardings)
