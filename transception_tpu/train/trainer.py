"""Training loop: jit-compiled train step over a device mesh, orbax
checkpointing, TensorBoard metrics, in-training volume eval.

Replaces trainer.py:72-230. One jit step computes forward, 0.4·CE+0.6·Dice,
grads, SGD update, and batch-stat updates; GSPMD shards the batch on the
'data' mesh axis and averages grads over ICI automatically. Checkpoints
carry params + optimizer + step (the reference saved model-only,
trainer.py:182-184, with no resume path — here resume is real and
preemption-safe).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from transception_tpu.core.config import DataConfig, TrainConfig, TransceptionConfig
from transception_tpu.data.loader import HostDataLoader
from transception_tpu.data.synapse import make_test_dataset, make_train_dataset
from transception_tpu.eval.inference import run_inference
from transception_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from transception_tpu.train.losses import (
    segmentation_loss,
    shuffle_labels_wide,
)
from transception_tpu.train.state import (
    TrainState,
    create_train_state,
    make_lr_schedule,
)

logger = logging.getLogger("transception_tpu")


def reference_eval_schedule(epoch: int, max_epoch: int, eval_interval: int,
                            initial_interval: int = 20
                            ) -> tuple[bool, bool]:
    """Recipe-exact checkpoint/eval cadence of the reference
    (trainer.py:179-226), as (save, evaluate) for 0-based `epoch`:

    - phase 1 (epoch in [max/2, max-100)): every `initial_interval` epochs;
    - phase 2 (epoch >= max-100): every `eval_interval` epochs;
    - last epoch: always save; evaluate via whichever branch applies
      (the reference's last-epoch block skips eval only when the phase-2
      rule already ran it that same epoch).
    """
    phase1 = (int(max_epoch / 2) <= epoch < int(max_epoch - 100)
              and (epoch + 1) % initial_interval == 0)
    phase2 = (epoch >= int(max_epoch - 100)
              and (epoch + 1) % eval_interval == 0)
    last = epoch >= max_epoch - 1
    save = phase1 or phase2 or last
    evaluate = phase1 or phase2 or (last and (epoch + 1) % eval_interval != 0)
    return save, evaluate


def assemble_global_batch(batch, data_shard, global_batch_size: int,
                          multihost: bool):
    """Device-place one loader batch as (images, labels).

    Single-host: a plain device_put with the batch sharding. Multi-host DP:
    each host holds its contiguous 1/process_count shard of the global
    batch (HostDataLoader slicing) and the global jax.Array is assembled
    from process-local data — the TPU-native replacement for
    DataParallel's scatter (trainer.py:110-111). Extracted from the train
    loop so multi-host semantics are testable with real process counts
    (tests/test_multihost.py)."""
    if isinstance(batch["image"], jax.Array):
        # Already on device (DeviceSyntheticStream) — no transfer.
        return batch["image"], batch["label"]
    if multihost:
        gb_img = (global_batch_size,) + batch["image"].shape[1:]
        gb_lbl = (global_batch_size,) + batch["label"].shape[1:]
        images = jax.make_array_from_process_local_data(
            data_shard, batch["image"], gb_img)
        labels = jax.make_array_from_process_local_data(
            data_shard, batch["label"], gb_lbl)
    else:
        images = jax.device_put(batch["image"], data_shard)
        labels = jax.device_put(batch["label"], data_shard)
    return images, labels


def train_step_model(model):
    """The kernel-gated model the train step actually runs — the single
    source of truth for train-vs-eval Pallas gating (Trainer, bench.py and
    the measurement scripts must all agree, or a profile describes a graph
    training never executes).

    Eval keeps every kernel; the train step turns them off
    (`use_pallas_train`: their custom-VJP backwards lose to XLA's fused
    fwd+bwd) EXCEPT (a) the bridge attention, which has a real
    flash-style Pallas backward, and (b) with `ffn_flash_train`, the
    fused MixFFN_skip folds (ETB + MHCA + bridge per-scale), whose
    backward is the flash kernel mixffn_kernel._bwd_kernel_ln. The
    eval-only attn folds stay off so the flash backwards see the plain
    kernels."""
    import dataclasses as _dc

    from transception_tpu.models.transception import MSTransception
    if isinstance(model, MSTransception) and model.cfg.use_pallas \
            and not model.cfg.use_pallas_train:
        over = dict(use_pallas=False, bridge_use_pallas=True,
                    bridge_ffn_use_pallas=False, bridge_attn_fold=False,
                    # eval-only whole-block MHCA kernel: its backward is
                    # the jnp-mirror VJP (recomputes through HBM) — keep
                    # the train step on XLA's fused fwd+bwd
                    mhca_block_fold=False)
        if model.cfg.ffn_flash_train:
            over.update(bridge_ffn_use_pallas=True, etb_ffn_fold=True,
                        mhca_ffn_fold=True)
        return MSTransception(_dc.replace(model.cfg, **over))
    return model


def make_train_step(model, num_classes: int, ce_w: float, dice_w: float,
                    wide_head: bool = False):
    """wide_head=True (MSTransception only): the model emits logits in
    PRE-pixel-shuffle token order and the loss permutes the (no-grad)
    integer labels instead — same per-pixel math, but the final shuffle
    transpose and the LN re-tiling reshapes (measured ~14 ms of the
    104 ms bs-24 train step backward) never enter the graph. Loss values
    match the standard layout up to fp32 reduction order
    (tests/test_wide_head.py)."""
    def loss_fn(params, batch_stats, images, labels, dropout_rng):
        kw = {"wide_head": True} if wide_head else {}
        outs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng}, **kw)
        if wide_head:
            labels = shuffle_labels_wide(labels)
        total, ce, dc = segmentation_loss(outs, labels, num_classes,
                                          ce_w, dice_w)
        return total, (updates["batch_stats"], ce, dc)

    def train_step(state: TrainState, images, labels, dropout_rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (new_bs, ce, dc)), grads = grad_fn(
            state.params, state.batch_stats, images, labels, dropout_rng)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = {"loss": total, "loss_ce": ce, "loss_dice": dc}
        return new_state, metrics

    return train_step


def _log_images(writer, pred_fn, state, images, labels, it):
    """TB image triplets every N iters (trainer.py:167-174 equivalent):
    normalized input, argmax prediction x50, label x50 for sample 0.

    pred_fn is the jitted argmax-forward, built once per Trainer — wrapping
    a fresh lambda here would force a retrace (minutes through the TPU
    tunnel) on every call."""
    import numpy as np
    img = np.asarray(images[0, :, :, 0], np.float32)
    rng = img.max() - img.min()
    img = (img - img.min()) / (rng if rng > 0 else 1.0)
    pred = np.asarray(pred_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images[:1]))[0]
    writer.add_image("train/Image", img[None], it)
    writer.add_image("train/Prediction",
                     (pred * 50).astype(np.uint8)[None], it)
    writer.add_image("train/GroundTruth",
                     (np.asarray(labels[0]) * 50).astype(np.uint8)[None], it)


class Trainer:
    """End-to-end Synapse trainer (the trainer_synapse equivalent)."""

    def __init__(self, model_cfg: TransceptionConfig, train_cfg: TrainConfig,
                 data_cfg: DataConfig, model=None):
        from transception_tpu.models.transception import MSTransception
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.data_cfg = data_cfg
        self.model = model or MSTransception(model_cfg)
        # Train-step model: same params, kernels gated by use_pallas_train
        # (see train_step_model — the single source of truth). Applies to
        # a caller-passed MSTransception too (the CLI always passes one):
        # gating only the model=None path silently trained with every
        # custom-VJP kernel (caught by the 500-epoch run).
        self.train_model = train_step_model(self.model)
        self.mesh = make_mesh(train_cfg.dp_size, train_cfg.tp_size)
        # Depthwise kernel-grad VJP: the GSPMD-safe explicit-reduction
        # backward only where the mesh can trigger the jax 0.9 bug
        # (>=2 nontrivial axes); XLA's faster native conv grads
        # otherwise (~6 ms of the bs-24 single-chip step).
        from transception_tpu.ops.common import set_safe_dwconv_kernel_grad
        from transception_tpu.parallel.mesh import needs_safe_dwconv_grad
        set_safe_dwconv_kernel_grad(needs_safe_dwconv_grad(self.mesh))
        os.makedirs(train_cfg.output_dir, exist_ok=True)
        self._setup_logging()

    def _use_wide_head(self) -> bool:
        """Wide-layout train loss (cfg.wide_loss): MSTransception only
        (other registry models don't take the wide_head kwarg), and the
        label pixel-shuffle needs img_size % 4 == 0."""
        from transception_tpu.models.transception import MSTransception
        return (self.cfg.wide_loss
                and isinstance(self.train_model, MSTransception)
                and self.data_cfg.img_size % 4 == 0)

    def _setup_logging(self):
        path = os.path.join(self.cfg.output_dir, "log.txt")
        handler = logging.FileHandler(path)
        handler.setFormatter(logging.Formatter(
            "[%(asctime)s.%(msecs)03d] %(message)s", datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)

    # ---- checkpointing (orbax) ----
    def _ckpt_dir(self):
        return os.path.abspath(os.path.join(self.cfg.output_dir, "ckpt"))

    def save_checkpoint(self, state: TrainState, step: int):
        import orbax.checkpoint as ocp
        path = os.path.join(self._ckpt_dir(), f"step_{step:08d}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
        }, force=True)
        ckptr.wait_until_finished()
        logger.info("saved checkpoint to %s", path)

    def latest_checkpoint(self) -> Optional[str]:
        d = self._ckpt_dir()
        if not os.path.isdir(d):
            return None
        steps = sorted(p for p in os.listdir(d) if p.startswith("step_"))
        return os.path.join(d, steps[-1]) if steps else None

    def restore_checkpoint(self, state: TrainState, path: str) -> TrainState:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": 0,
        }
        restored = ckptr.restore(path, target)
        # Restore hands back host numpy; re-apply the mesh shardings or a
        # tp_size>1 resume would silently re-place params replicated.
        from transception_tpu.parallel.mesh import replicate
        fallback = replicate(self.mesh)

        def sharding_of(x):
            return x.sharding if isinstance(x, jax.Array) else fallback

        params = shard_params(restored["params"], self.mesh)
        batch_stats = jax.device_put(
            restored["batch_stats"],
            jax.tree_util.tree_map(sharding_of, state.batch_stats))
        opt_state = jax.device_put(
            restored["opt_state"],
            jax.tree_util.tree_map(sharding_of, state.opt_state))
        return state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state)

    # ---- main loop ----
    def train(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        test_ds = make_test_dataset(self.data_cfg)
        if self.data_cfg.device_data:
            assert self.data_cfg.dataset == "synthetic", (
                "--device_data generates random batches on device; it is "
                "only meaningful for the synthetic dataset")
            from transception_tpu.data.device_synthetic import (
                DeviceSyntheticStream,
            )
            loader = DeviceSyntheticStream(
                cfg.batch_size, self.data_cfg.img_size,
                self.data_cfg.num_classes,
                length=self.data_cfg.synthetic_len, seed=cfg.seed,
                sharding=batch_sharding(self.mesh))
        else:
            train_ds = make_train_dataset(self.data_cfg)
            loader = HostDataLoader(
                train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                num_workers=self.data_cfg.num_workers,
                process_index=jax.process_index(),
                process_count=jax.process_count())
        steps_per_epoch = len(loader)
        logger.info("%d iterations per epoch, %d max iterations",
                    steps_per_epoch, steps_per_epoch * cfg.max_epochs)

        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((cfg.batch_size, self.data_cfg.img_size,
                            self.data_cfg.img_size, 1), jnp.float32)
        with jax.set_mesh(self.mesh):
            return self._train_loop(cfg, loader, test_ds, steps_per_epoch,
                                    rng, sample, max_steps)

    def _train_loop(self, cfg, loader, test_ds, steps_per_epoch, rng,
                    sample, max_steps):
        state = create_train_state(self.train_model, cfg, steps_per_epoch,
                                   sample, rng)
        # Shard: params via TP rules (replicated by default), batch on data.
        state = state.replace(
            params=shard_params(state.params, self.mesh),
            opt_state=jax.device_put(state.opt_state),
        )
        if cfg.resume:
            latest = self.latest_checkpoint()
            if latest:
                state = self.restore_checkpoint(state, latest)
                logger.info("resumed from %s (step %d)", latest,
                            int(state.step))

        schedule = make_lr_schedule(cfg, steps_per_epoch)
        step_fn = jax.jit(make_train_step(
            self.train_model, self.data_cfg.num_classes, cfg.ce_weight,
            cfg.dice_weight, wide_head=self._use_wide_head()),
            donate_argnums=(0,))
        data_shard = batch_sharding(self.mesh)

        writer = None
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join(cfg.output_dir, "tb"))
        except Exception:  # pragma: no cover
            pass
        # Built once: re-wrapping in jax.jit per _log_images call would
        # recompile the eval forward every 200 iterations (ADVICE r1).
        tb_pred_fn = jax.jit(lambda v, x: jnp.argmax(
            self.model.apply(v, x, train=False), -1))

        dice_hist, hd95_hist = [], []
        tb_pending = []
        it = int(state.step)
        start_epoch = it // max(steps_per_epoch, 1)
        total_steps = max_steps or steps_per_epoch * cfg.max_epochs
        t0 = time.time()
        done = False
        for epoch in range(start_epoch, cfg.max_epochs):
            loader.set_epoch(epoch)
            multihost = jax.process_count() > 1
            for batch in loader:
                images, labels = assemble_global_batch(
                    batch, data_shard, cfg.batch_size, multihost)
                rng, drop = jax.random.split(rng)
                state, metrics = step_fn(state, images, labels, drop)
                it += 1
                if writer is not None and it % 10 == 0:
                    # Buffer device scalars; converting here (float(v))
                    # would sync the async dispatch pipeline every 10
                    # steps. Flushed with the 50-step log line below
                    # (schedule(it) also runs there — it dispatches to
                    # the device and would sync just the same).
                    tb_pending.append((it, dict(metrics)))
                if writer is not None and it % 200 == 0:
                    try:
                        _log_images(writer, tb_pred_fn, state, images,
                                    labels, it)
                    except Exception:  # pragma: no cover
                        pass
                if it % 50 == 0:
                    if writer is not None:
                        for tb_it, tb_m in tb_pending:
                            writer.add_scalar("info/lr",
                                              float(schedule(tb_it)), tb_it)
                            for k, v in tb_m.items():
                                writer.add_scalar(f"info/{k}", float(v),
                                                  tb_it)
                        tb_pending.clear()
                    m = {k: float(v) for k, v in metrics.items()}
                    logger.info(
                        "iteration %d : lr %.6f loss %.4f ce %.4f dice %.4f "
                        "(%.1f img/s)", it, float(schedule(it)), m["loss"],
                        m["loss_ce"], m["loss_dice"],
                        50 * cfg.batch_size / max(time.time() - t0, 1e-9))
                    t0 = time.time()
                if it >= total_steps:
                    done = True
                    break
            # Eval/checkpoint schedule: 'interval' = simple every-N knobs;
            # 'reference' = the recipe-exact two-phase cadence
            # (trainer.py:179-226) for checkpoint-for-checkpoint 500-epoch
            # reproduction runs.
            if cfg.eval_schedule == "reference":
                do_save, do_eval = reference_eval_schedule(
                    epoch, cfg.max_epochs, cfg.eval_interval)
            else:
                do_save = (epoch + 1) % cfg.ckpt_every == 0
                do_eval = (epoch + 1) % cfg.eval_interval == 0
            if done or do_save:
                self.save_checkpoint(state, it)
            if done or do_eval:
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                if self.data_cfg.dataset == "isic":
                    from transception_tpu.data.isic import dice_eval
                    d = dice_eval(self.model, variables, test_ds,
                                  self.data_cfg.img_size, log=logger.info)
                    h = 0.0
                else:
                    d, h = run_inference(
                        self.model, variables, test_ds,
                        self.data_cfg.num_classes,
                        patch_size=self.data_cfg.img_size, log=logger.info,
                        device_resample=cfg.eval_device_resample)
                dice_hist.append(d)
                hd95_hist.append(h)
            if done:
                break
        if writer is not None:
            for tb_it, tb_m in tb_pending:
                writer.add_scalar("info/lr", float(schedule(tb_it)), tb_it)
                for k, v in tb_m.items():
                    writer.add_scalar(f"info/{k}", float(v), tb_it)
            writer.close()
        self._plot_results(dice_hist, hd95_hist)
        return state, {"dice": dice_hist, "hd95": hd95_hist}

    def _plot_results(self, dice_hist, hd95_hist):
        """Curves + tsv like trainer.py:50-69 (best-effort)."""
        if not dice_hist:
            return
        try:
            import pandas as pd
            df = pd.DataFrame({"mean_dice": dice_hist, "mean_hd95": hd95_hist})
            df.to_csv(os.path.join(self.cfg.output_dir, "results.tsv"),
                      sep="\t")
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(1, 2, figsize=(10, 4))
            axes[0].plot(dice_hist)
            axes[0].set_title("Mean Dice")
            axes[1].plot(hd95_hist)
            axes[1].set_title("Mean HD95")
            fig.savefig(os.path.join(self.cfg.output_dir, "curves.png"),
                        dpi=150)
            plt.close(fig)
        except Exception as e:  # pragma: no cover
            logger.warning("plotting failed: %s", e)
