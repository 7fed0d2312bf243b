"""Golden-numerics regression: fixed seed + fixed input -> stored logits.

Generated once from the converter-validated build (whose outputs match the
reference torch model); guards against silent numeric drift in future
refactors without needing torch at test time. Regenerate intentionally with
REGEN_GOLDEN=1 python -m pytest tests/test_golden_regression.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from transception_tpu.models.transception import MSTransception

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_logits_v1.npz")


def _compute():
    cfg = tiny_config()
    model = MSTransception(cfg)
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)).astype(np.float32))
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1234), x, train=False)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    return np.asarray(out)


def test_golden_logits():
    got = _compute()
    if os.environ.get("REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, logits=got)
        if not os.environ.get("REGEN_GOLDEN"):
            pytest.skip("golden file generated; rerun to compare")
        return
    want = np.load(GOLDEN)["logits"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
