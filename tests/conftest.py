"""Test env: CPU with 8 virtual devices so sharding tests run without a TPU.

Note: the axon TPU plugin in this image ignores JAX_PLATFORMS, so we also
pin jax_default_device to CPU — eager dispatch through the TPU tunnel is
~4ms/op and would make tests pathologically slow.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# Persistent compile cache makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CPU_DEVICES = jax.devices("cpu")
jax.config.update("jax_default_device", CPU_DEVICES[0])


@pytest.fixture(scope="session")
def cpu_mesh():
    from transception_tpu.parallel.mesh import make_mesh
    return make_mesh(dp_size=4, tp_size=2, devices=CPU_DEVICES)


def tiny_config(**overrides):
    """Small-but-structurally-complete config for fast CPU tests."""
    from transception_tpu.core.config import TransceptionConfig
    base = dict(img_size=32, dtype="float32", use_pallas=False,
                stage1_layers=1, num_path=(2, 2, 2), num_layers=(1, 1, 1),
                num_heads=(8, 8, 8))
    base.update(overrides)
    return TransceptionConfig(**base)
