"""Wide-layout train head (VERDICT r4): the final-expand pixel shuffle
commutes with LN, the 1x1 head conv, and the pixel-mean losses, so the
train step emits logits in PRE-shuffle token order (B, N, p², K) and
permutes the no-grad labels instead (models/decoder.py wide_head;
train/losses.py shuffle_labels_wide). These tests pin:
  1. the label permutation is exactly the inverse pixel shuffle,
  2. wide logits unshuffle to the standard logits,
  3. loss and one optimizer step match the standard layout,
  4. the sharded (dp×tp) wide step matches the unsharded loss
     (GSPMD guard per CLAUDE.md — any new traced graph needs one),
  5. the Trainer gate only fires for MSTransception with img%4==0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from transception_tpu.core.config import TrainConfig
from transception_tpu.models.transception import MSTransception
from transception_tpu.parallel.mesh import batch_sharding, shard_params
from transception_tpu.train.losses import (
    segmentation_loss,
    shuffle_labels_wide,
)
from transception_tpu.train.state import create_train_state
from transception_tpu.train.trainer import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = MSTransception(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 9, (4, 32, 32)), jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    return cfg, model, variables, x, y


def _unshuffle(wide, H, W, p=4):
    """(B, (H/p)(W/p), p², K) -> (B, H, W, K), the pixel shuffle."""
    B, n, q, K = wide.shape
    h, w = H // p, W // p
    return wide.reshape(B, h, w, p, p, K).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, H, W, K)


def test_shuffle_labels_wide_is_inverse_pixel_shuffle():
    B, H, W, p = 2, 8, 8, 4
    labels = jnp.arange(B * H * W, dtype=jnp.int32).reshape(B, H, W)
    wide = shuffle_labels_wide(labels, p)
    assert wide.shape == (B, (H // p) * (W // p), p * p)
    for b, h, w_, p1, p2 in [(0, 0, 0, 0, 0), (1, 1, 0, 3, 2),
                             (0, 0, 1, 2, 3), (1, 1, 1, 1, 1)]:
        assert int(wide[b, h * (W // p) + w_, p1 * p + p2]) == \
            int(labels[b, h * p + p1, w_ * p + p2])
    # Round-trip through the forward shuffle.
    back = _unshuffle(wide[..., None], H, W, p)[..., 0]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(labels))


def test_wide_logits_unshuffle_to_standard(setup):
    cfg, model, variables, x, y = setup
    std = model.apply(variables, x, train=False)
    wide = model.apply(variables, x, train=False, wide_head=True)
    assert wide.shape == (4, 8 * 8, 16, cfg.num_classes)
    np.testing.assert_allclose(
        np.asarray(_unshuffle(wide, 32, 32)), np.asarray(std),
        rtol=1e-5, atol=1e-5)


def test_wide_loss_matches_standard(setup):
    cfg, model, variables, x, y = setup
    std = model.apply(variables, x, train=False)
    wide = model.apply(variables, x, train=False, wide_head=True)
    t0, ce0, d0 = segmentation_loss(std, y, cfg.num_classes, 0.4, 0.6)
    t1, ce1, d1 = segmentation_loss(wide, shuffle_labels_wide(y),
                                    cfg.num_classes, 0.4, 0.6)
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
    np.testing.assert_allclose(float(ce0), float(ce1), rtol=1e-5)
    np.testing.assert_allclose(float(d0), float(d1), rtol=1e-5)


def test_wide_train_step_matches_standard(setup):
    cfg, model, variables, x, y = setup
    tcfg = TrainConfig(batch_size=4, max_epochs=2)

    def one_step(wide_head):
        state = create_train_state(model, tcfg, steps_per_epoch=4,
                                   sample_batch=x,
                                   rng=jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6,
                                       wide_head=wide_head))
        state, m = step(state, x, y, jax.random.PRNGKey(1))
        return state, m

    s0, m0 = one_step(False)
    s1, m1 = one_step(True)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(s0.params)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(s1.params))
    assert len(flat0) == len(flat1)  # identical param trees
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat1[path]),
            rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_sharded_wide_step_matches_unsharded_loss(setup, cpu_mesh):
    cfg, model, variables, x, y = setup
    tcfg = TrainConfig(batch_size=4, dp_size=4, tp_size=2, max_epochs=1)
    step = make_train_step(model, cfg.num_classes, 0.4, 0.6,
                           wide_head=True)

    def run(mesh):
        state = create_train_state(model, tcfg, steps_per_epoch=4,
                                   sample_batch=x,
                                   rng=jax.random.PRNGKey(0))
        if mesh is not None:
            with jax.set_mesh(mesh):
                state = state.replace(
                    params=shard_params(state.params, mesh))
                ds = batch_sharding(mesh)
                _, m = jax.jit(step)(state, jax.device_put(x, ds),
                                     jax.device_put(y, ds),
                                     jax.random.PRNGKey(1))
                return float(m["loss"])
        _, m = jax.jit(step)(state, x, y, jax.random.PRNGKey(1))
        return float(m["loss"])

    base = run(None)
    sharded = run(cpu_mesh)
    assert np.isfinite(sharded)
    np.testing.assert_allclose(sharded, base, rtol=1e-5)


def test_trainer_wide_gate(tmp_path):
    from transception_tpu.core.config import DataConfig
    from transception_tpu.train.trainer import Trainer
    dcfg = DataConfig(dataset="synthetic", synthetic_len=4)
    tr = Trainer(tiny_config(), TrainConfig(batch_size=2,
                                            output_dir=str(tmp_path)), dcfg)
    assert tr._use_wide_head() is True
    tr2 = Trainer(tiny_config(),
                  TrainConfig(batch_size=2, wide_loss=False,
                              output_dir=str(tmp_path)), dcfg)
    assert tr2._use_wide_head() is False
    # Non-MSTransception models never take the kwarg.
    from transception_tpu.models.legacy import MISSFormer
    tr3 = Trainer(tiny_config(),
                  TrainConfig(batch_size=2, output_dir=str(tmp_path)),
                  dcfg, model=MISSFormer(tiny_config()))
    assert tr3._use_wide_head() is False
