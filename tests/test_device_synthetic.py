"""On-device synthetic stream: determinism, loader protocol, trainer use.

The stream exists because the axon TPU tunnel on this image leaks host
RSS on every H2D/D2H transfer (~payload size, unconditional), so long
synthetic recipe runs must not stream batches from the host
(data/device_synthetic.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from transception_tpu.core.config import DataConfig, TrainConfig
from transception_tpu.data.device_synthetic import DeviceSyntheticStream
from transception_tpu.train.trainer import Trainer, assemble_global_batch


def _collect(stream, n=2):
    out = []
    for i, b in enumerate(stream):
        if i >= n:
            break
        out.append((np.asarray(b["image"]), np.asarray(b["label"])))
    return out


def test_stream_shapes_dtypes_device():
    s = DeviceSyntheticStream(batch_size=4, img_size=32, num_classes=9,
                              length=16, seed=7)
    assert len(s) == 4
    batch = next(iter(s))
    img, lbl = batch["image"], batch["label"]
    assert isinstance(img, jax.Array) and isinstance(lbl, jax.Array)
    assert img.shape == (4, 32, 32, 1) and img.dtype == jnp.float32
    assert lbl.shape == (4, 32, 32) and lbl.dtype == jnp.int32
    li = np.asarray(lbl)
    assert li.min() >= 0 and li.max() < 9
    fi = np.asarray(img)
    assert fi.min() >= 0.0 and fi.max() < 1.0


def test_stream_determinism_across_instances_and_epochs():
    a = DeviceSyntheticStream(batch_size=2, img_size=32, num_classes=4,
                              length=8, seed=3)
    b = DeviceSyntheticStream(batch_size=2, img_size=32, num_classes=4,
                              length=8, seed=3)
    for (ia, la), (ib, lb) in zip(_collect(a), _collect(b)):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)
    # Different epoch -> different content; same epoch replays exactly
    # (the kill/resume contract).
    a.set_epoch(1)
    b.set_epoch(1)
    a1 = _collect(a)
    b1 = _collect(b)
    for (ia, la), (ib, lb) in zip(a1, b1):
        np.testing.assert_array_equal(ia, ib)
    b.set_epoch(0)
    b0 = _collect(b)
    assert not np.array_equal(a1[0][0], b0[0][0])
    # Different seed -> different content.
    c = DeviceSyntheticStream(batch_size=2, img_size=32, num_classes=4,
                              length=8, seed=4)
    assert not np.array_equal(_collect(c)[0][0], b0[0][0])


def test_assemble_passthrough_no_copy():
    s = DeviceSyntheticStream(batch_size=2, img_size=32, num_classes=4,
                              length=4, seed=0)
    batch = next(iter(s))
    img, lbl = assemble_global_batch(batch, None, 2, multihost=False)
    assert img is batch["image"] and lbl is batch["label"]


def test_trainer_device_data_end_to_end(tmp_path):
    cfg = tiny_config()
    dcfg = DataConfig(dataset="synthetic", img_size=32, synthetic_len=8,
                      num_workers=1, device_data=True)
    tcfg = TrainConfig(batch_size=4, max_epochs=2, eval_interval=100,
                       ckpt_every=100, output_dir=str(tmp_path), dp_size=1)
    tr = Trainer(cfg, tcfg, dcfg)
    state, _ = tr.train(max_steps=3)
    assert int(state.step) == 3
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
