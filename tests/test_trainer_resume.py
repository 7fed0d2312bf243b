"""Trainer auto-resume: a second train() run picks up from the saved step."""

import jax.numpy as jnp

from conftest import tiny_config
from transception_tpu.core.config import DataConfig, TrainConfig
from transception_tpu.train.trainer import Trainer


def test_trainer_auto_resume(tmp_path):
    cfg = tiny_config()
    dcfg = DataConfig(dataset="synthetic", img_size=32, synthetic_len=8,
                      num_workers=1)
    tcfg = TrainConfig(batch_size=4, max_epochs=4, eval_interval=100,
                       ckpt_every=1, output_dir=str(tmp_path), dp_size=1)

    tr = Trainer(cfg, tcfg, dcfg)
    state1, _ = tr.train(max_steps=2)
    assert int(state1.step) == 2

    # Fresh Trainer, same output_dir: must restore step 2 and continue.
    tr2 = Trainer(cfg, tcfg, dcfg)
    state2, _ = tr2.train(max_steps=4)
    assert int(state2.step) == 4
    log = (tmp_path / "log.txt").read_text()
    assert "resumed from" in log
