"""Standalone worker for the multi-host DP test (tests/test_multihost.py).

Runs as one of N real processes under jax.distributed: builds a dp mesh
over the global CPU devices, assembles the global batch from its local
shard via assemble_global_batch (the exact trainer code path,
train/trainer.py), runs ONE train step, and writes {loss, param
fingerprint} to the given JSON file.

Usage: python tests/multihost_worker.py <pid> <nprocs> <port> <outfile>
"""

import json
import os
import sys

pid, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transception_tpu.core.config import TrainConfig, TransceptionConfig  # noqa: E402
from transception_tpu.models.transception import MSTransception  # noqa: E402
from transception_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
    shard_params,
)
from transception_tpu.train.state import create_train_state  # noqa: E402
from transception_tpu.train.trainer import (  # noqa: E402
    assemble_global_batch,
    make_train_step,
)


def _barrier(name: str, timeout_ms: int = 900_000):
    """Coordination-service barrier (NOT a device collective): keeps the
    workers' first gloo collective within its 30 s key-value timeout by
    re-synchronizing after each compile-heavy phase — the two processes
    share one CPU here, so compile skew can exceed the gloo deadline."""
    jax._src.distributed.global_state.client.wait_at_barrier(name, timeout_ms)


def main():
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())

    cfg = TransceptionConfig(img_size=32, dtype="float32", use_pallas=False,
                             stage1_layers=1, num_path=(2, 2, 2),
                             num_layers=(1, 1, 1), num_heads=(8, 8, 8))
    model = MSTransception(cfg)

    GB = 8
    rng = np.random.default_rng(0)
    x = rng.random((GB, 32, 32, 1)).astype(np.float32)
    y = rng.integers(0, 9, (GB, 32, 32)).astype(np.int32)
    local = GB // nprocs
    batch = {"image": x[pid * local:(pid + 1) * local],
             "label": y[pid * local:(pid + 1) * local]}

    mesh = make_mesh(dp_size=n_global, tp_size=1)
    with jax.set_mesh(mesh):
        _barrier("pre_init")
        state = create_train_state(model, TrainConfig(batch_size=GB),
                                   steps_per_epoch=4,
                                   sample_batch=jnp.zeros((GB, 32, 32, 1)),
                                   rng=jax.random.PRNGKey(0))
        _barrier("post_init")
        state = state.replace(params=shard_params(state.params, mesh))
        ds = batch_sharding(mesh)
        images, labels = assemble_global_batch(batch, ds, GB, multihost=True)
        step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6))
        compiled = step.lower(state, images, labels,
                              jax.random.PRNGKey(1)).compile()
        _barrier("post_compile")
        new_state, metrics = compiled(state, images, labels,
                                      jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
        # Fingerprint the UPDATED params: identical across hosts and equal
        # to the single-host update iff grads were correctly all-reduced.
        fp = float(sum(
            float(jnp.sum(jnp.abs(p.astype(jnp.float64))))
            for p in jax.tree_util.tree_leaves(new_state.params)))

    with open(outfile, "w") as f:
        json.dump({"loss": loss, "fingerprint": fp,
                   "process_count": jax.process_count(),
                   "n_devices": n_global}, f)


if __name__ == "__main__":
    main()
