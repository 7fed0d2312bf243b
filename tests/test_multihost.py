"""Multi-host data parallelism under REAL process counts (VERDICT r2 #6).

The trainer's multihost branch (train/trainer.py assemble_global_batch:
jax.make_array_from_process_local_data) previously only executed when
jax.process_count() > 1, which no test simulated. Here two actual
processes join a jax.distributed CPU cluster (2 local devices each -> 4
global), each assembles its contiguous local shard of the global batch
through the exact trainer code path, and one train step must produce the
same loss and the same updated-parameter fingerprint as a single-host
run over the full batch.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import CPU_DEVICES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_host_reference():
    """Same step on one process: full batch, 4-device dp mesh."""
    from transception_tpu.core.config import TrainConfig, TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params,
    )
    from transception_tpu.train.state import create_train_state
    from transception_tpu.train.trainer import (
        assemble_global_batch,
        make_train_step,
    )

    cfg = TransceptionConfig(img_size=32, dtype="float32", use_pallas=False,
                             stage1_layers=1, num_path=(2, 2, 2),
                             num_layers=(1, 1, 1), num_heads=(8, 8, 8))
    model = MSTransception(cfg)
    GB = 8
    rng = np.random.default_rng(0)
    batch = {"image": rng.random((GB, 32, 32, 1)).astype(np.float32),
             "label": rng.integers(0, 9, (GB, 32, 32)).astype(np.int32)}
    mesh = make_mesh(dp_size=4, tp_size=1, devices=CPU_DEVICES[:4])
    with jax.set_mesh(mesh):
        state = create_train_state(model, TrainConfig(batch_size=GB),
                                   steps_per_epoch=4,
                                   sample_batch=jnp.zeros((GB, 32, 32, 1)),
                                   rng=jax.random.PRNGKey(0))
        state = state.replace(params=shard_params(state.params, mesh))
        images, labels = assemble_global_batch(
            batch, batch_sharding(mesh), GB, multihost=False)
        step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6))
        new_state, metrics = step(state, images, labels,
                                  jax.random.PRNGKey(1))
        fp = float(sum(
            float(jnp.sum(jnp.abs(p.astype(jnp.float64))))
            for p in jax.tree_util.tree_leaves(new_state.params)))
        return float(metrics["loss"]), fp


@pytest.mark.slow
def test_two_process_dp_matches_single_host(tmp_path):
    port = _free_port()
    nprocs = 2
    outs = [str(tmp_path / f"proc{i}.json") for i in range(nprocs)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    # Keep the axon TPU plugin out of the workers: sitecustomize registers
    # it whenever PALLAS_AXON_POOL_IPS is set, and JAX_PLATFORMS=axon (the
    # image default) would win over the worker's cpu pin.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nprocs), str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["n_devices"] == 4 for r in results)
    # Both hosts observe the identical global step.
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["fingerprint"],
                               results[1]["fingerprint"], rtol=1e-6)

    ref_loss, ref_fp = _single_host_reference()
    # Cross-process all-reduce order may differ from single-host: small
    # fp32 tolerance, anything larger is an assembly/averaging bug.
    np.testing.assert_allclose(results[0]["loss"], ref_loss, rtol=2e-5)
    np.testing.assert_allclose(results[0]["fingerprint"], ref_fp,
                               rtol=1e-6)
