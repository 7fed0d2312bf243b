"""Stochastic depth: schedule shape, train/eval behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from transception_tpu.models.msvit import dpr_schedule
from transception_tpu.ops.attention import drop_path


def test_dpr_schedule_linear_split():
    dpr = dpr_schedule(0.3, (3, 8, 3))
    assert [len(s) for s in dpr] == [3, 8, 3]
    flat = [v for s in dpr for v in s]
    np.testing.assert_allclose(flat, np.linspace(0, 0.3, 14), atol=1e-7)
    assert dpr_schedule(0.0, (2, 2)) == [(0.0, 0.0), (0.0, 0.0)]


def test_drop_path_eval_identity():
    x = jnp.ones((4, 8, 16))
    out = drop_path(x, 0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out0 = drop_path(x, 0.0, deterministic=False, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))


def test_drop_path_train_scales_and_masks():
    x = jnp.ones((512, 4))
    out = np.asarray(drop_path(x, 0.25, deterministic=False,
                               rng=jax.random.PRNGKey(0)))
    # rows are either 0 or 1/keep
    uniq = np.unique(out)
    assert all(min(abs(u), abs(u - 1 / 0.75)) < 1e-5 for u in uniq)
    # expectation preserved within sampling noise
    assert abs(out.mean() - 1.0) < 0.1
