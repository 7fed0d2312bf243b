"""Test-only loader for the reference PyTorch model at /root/reference.

Used exclusively to validate the .pth->Flax converter and numerical parity
of this from-scratch rebuild — no reference code is copied or vendored.
Shims the reference's unused-at-import deps (torchvision, torchinfo) and
patches the silu_sigmoid device bug (networks/MSTr.py:1276 hardcodes
.cuda(), which breaks CPU-only torch; the math is unchanged).
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference_mstr():
    """Import networks.MSTr from the reference, or None if unavailable."""
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        return None
    try:
        import torch  # noqa: F401
        import einops  # noqa: F401
    except ImportError:
        return None

    # Shim modules the reference imports but never uses at module scope.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if "torchinfo" not in sys.modules:
        ti = types.ModuleType("torchinfo")
        ti.summary = lambda *a, **k: None
        sys.modules["torchinfo"] = ti

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import networks.MSTr as mstr
    except Exception:
        return None

    # Patch the .cuda() device bug so CoordAtt runs on CPU (same math).
    import torch

    def _cpu_safe_forward(self, x):
        return torch.minimum(self.silu(x + 3) / 6, torch.ones_like(x))

    mstr.silu_sigmoid.forward = _cpu_safe_forward
    return mstr
