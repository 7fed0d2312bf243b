"""Orbax checkpoint save/restore round trip through the Trainer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from transception_tpu.core.config import DataConfig, TrainConfig
from transception_tpu.train.state import create_train_state
from transception_tpu.train.trainer import Trainer


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=4, max_epochs=1, output_dir=str(tmp_path),
                       dp_size=1)
    dcfg = DataConfig(dataset="synthetic", img_size=32, synthetic_len=8)
    tr = Trainer(cfg, tcfg, dcfg)
    x = jnp.zeros((4, 32, 32, 1), jnp.float32)
    state = create_train_state(tr.model, tcfg, steps_per_epoch=2,
                               sample_batch=x, rng=jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    tr.save_checkpoint(state, 7)
    latest = tr.latest_checkpoint()
    assert latest and latest.endswith("step_00000007")

    # restore into a fresh state with different values
    fresh = create_train_state(tr.model, tcfg, steps_per_epoch=2,
                               sample_batch=x, rng=jax.random.PRNGKey(99))
    restored = tr.restore_checkpoint(fresh, latest)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
