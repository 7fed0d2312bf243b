"""On-device synthetic batch stream: zero host->device traffic per step.

Motivation (measured on this image): every H2D/D2H transfer through the
experimental axon TPU tunnel leaks its payload size in host RSS —
4.6 MB host RSS per 4.8 MB `jax.device_put`, unconditionally (delete(),
gc, and block_until_ready do not release it). A bs-24 fp32 stream leaks
~9.6 MB/step, which OOM-kills a 46k-step recipe run at ~13k steps on the
125 GB host. For synthetic (data-free) throughput/recipe runs the fix is
also the faster design: generate the batch inside XLA from a counter, so
the loop does no transfers at all and the host loader drops out of the
critical path.

The stream mimics the `HostDataLoader` iterator protocol (len /
set_epoch / dict batches) so `Trainer._train_loop` is unchanged;
`assemble_global_batch` passes already-on-device arrays through.
Determinism matches the loader's contract: batch content is a pure
function of (seed, epoch, step-within-epoch), so kill/resume at an epoch
boundary replays the identical stream.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator

import jax
import jax.numpy as jnp


class DeviceSyntheticStream:
    """Loader-protocol iterator whose batches are jitted onto the device.

    Images ~ U[0,1) normalized to the same [0,1] range the host synthetic
    path produces (synapse.py:90-101); labels ~ uniform classes. Content
    statistics are irrelevant for synthetic runs — shapes, dtypes, and
    determinism are the contract.
    """

    def __init__(self, batch_size: int, img_size: int, num_classes: int,
                 length: int = 2211, seed: int = 1234, sharding=None):
        self.batch_size = batch_size
        self.img_size = img_size
        self.num_classes = num_classes
        self.length = length
        self.seed = seed
        self.epoch = 0

        out_shardings = ((sharding, sharding) if sharding is not None
                         else None)

        @partial(jax.jit, static_argnums=(), out_shardings=out_shardings)
        def gen(step: jax.Array):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
            k_img, k_lbl = jax.random.split(key)
            images = jax.random.uniform(
                k_img, (batch_size, img_size, img_size, 1), jnp.float32)
            labels = jax.random.randint(
                k_lbl, (batch_size, img_size, img_size), 0, num_classes,
                jnp.int32)
            return images, labels

        self._gen = gen

    def __len__(self) -> int:
        return self.length // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, object]]:
        n = len(self)
        base = self.epoch * n
        for b in range(n):
            images, labels = self._gen(jnp.int32(base + b))
            yield {"image": images, "label": labels,
                   "case_name": [f"device_synth_{base + b}_{j}"
                                 for j in range(self.batch_size)]}
