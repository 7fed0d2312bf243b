"""Depthwise-conv kernel gradients under a (data, model) mesh.

Round-5 bisect: jax 0.9's GSPMD partitioner returns the KERNEL gradient
of a feature_group_count==C convolution multiplied by the product of the
mesh axis sizes the batch sharding does not use (x2 on a (4, 2) mesh,
x4 on (2, 4)) whenever the batch operand is actually sharded. Forward,
input gradients, and regular (fgc=1) convs are unaffected. In this model
that silently doubled EVERY depthwise kernel's gradient (CPE, CRPE, FFN
DWConv, patch-embed and ResBlock dwconvs) in tp>=2 training — while the
loss metric (computed pre-update) still matched, so the multichip dryrun
could not see it.

Fix: ops/common.py DepthwiseConv — bit-identical forward, custom VJP
computing the kernel grad as kh*kw shifted multiply-reduces (plain
reductions, which GSPMD partitions correctly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conftest import CPU_DEVICES
from transception_tpu.ops.common import DepthwiseConv


def _mesh(shape):
    n = int(np.prod(shape))
    return Mesh(np.asarray(CPU_DEVICES[:n]).reshape(shape),
                ("data", "model"))


def _raw_dw(x, k):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def test_upstream_gspmd_grouped_conv_kernel_grad_bug_still_present():
    """Documents the raw-lax repro. If this starts SKIPPING, jax fixed
    the upstream bug and DepthwiseConv's custom VJP can be retired."""
    rng = np.random.default_rng(0)
    C = 16
    x = jnp.asarray(rng.random((8, 8, 8, C)), jnp.float32)
    k = jnp.asarray(rng.random((3, 3, 1, C)), jnp.float32)
    loss = lambda k_, x_: jnp.sum(_raw_dw(x_, k_) ** 2)  # noqa: E731
    g_ref = np.asarray(jax.jit(jax.grad(loss))(k, x))
    mesh = _mesh((4, 2))
    with jax.set_mesh(mesh):
        xb = jax.device_put(x, NamedSharding(mesh, P("data")))
        kr = jax.device_put(k, NamedSharding(mesh, P()))
        g = np.asarray(jax.device_get(jax.jit(jax.grad(loss))(kr, xb)))
    ratio = float(np.median(g / g_ref))
    if abs(ratio - 1.0) < 1e-6:
        pytest.skip("upstream GSPMD bug fixed in this jax — "
                    "consider retiring DepthwiseConv's custom VJP")
    np.testing.assert_allclose(ratio, 2.0, rtol=1e-6)


@pytest.mark.parametrize("shape,stride", [((4, 2), 1), ((2, 4), 1),
                                          ((4, 2), 2)])
def test_depthwise_conv_kernel_grad_correct_under_mesh(shape, stride):
    rng = np.random.default_rng(1)
    C = 16
    x = jnp.asarray(rng.random((8, 9, 9, C)), jnp.float32)
    mod = DepthwiseConv(C, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), dtype=jnp.float32,
                        name="dw")
    v = mod.init(jax.random.PRNGKey(0), x)
    loss = lambda v_, x_: jnp.sum(mod.apply(v_, x_) ** 2)  # noqa: E731
    g_ref = jax.device_get(jax.jit(jax.grad(loss))(v, x))
    mesh = _mesh(shape)
    with jax.set_mesh(mesh):
        xb = jax.device_put(x, NamedSharding(mesh, P("data")))
        vr = jax.device_put(v, NamedSharding(mesh, P()))
        g = jax.device_get(jax.jit(jax.grad(loss))(vr, xb))
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=jax.tree_util.keystr(pth))


def test_depthwise_conv_matches_nn_conv_forward_and_grads():
    """Bit-identical forward + matching unsharded grads vs the nn.Conv it
    replaced (same param tree, same init stream)."""
    from flax import linen as nn
    rng = np.random.default_rng(0)
    C = 16
    x = jnp.asarray(rng.random((2, 9, 9, C)), jnp.float32)
    for stride, bias, k in [(1, True, 3), (2, False, 3), (1, True, 7)]:
        p = k // 2
        ref = nn.Conv(C, (k, k), strides=(stride, stride),
                      padding=((p, p), (p, p)), feature_group_count=C,
                      use_bias=bias, dtype=jnp.float32,
                      param_dtype=jnp.float32,
                      kernel_init=nn.initializers.xavier_uniform(),
                      name="dwconv")
        new = DepthwiseConv(C, (k, k), strides=(stride, stride),
                            padding=((p, p), (p, p)), use_bias=bias,
                            dtype=jnp.float32, name="dwconv")
        v1 = ref.init(jax.random.PRNGKey(0), x)
        v2 = new.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v2)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(v1),
                                   jax.tree_util.tree_leaves_with_path(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(ref.apply(v1, x)),
                                      np.asarray(new.apply(v2, x)))
        g1 = jax.grad(lambda v: jnp.sum(ref.apply(v, x) ** 2))(v1)
        g2 = jax.grad(lambda v: jnp.sum(new.apply(v, x) ** 2))(v2)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                                   jax.tree_util.tree_leaves_with_path(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-5,
                                       err_msg=jax.tree_util.keystr(pa))


def test_dwconv_grad_gating_fast_path_matches_safe_path():
    """The single-chip fast path (set_safe_dwconv_kernel_grad(False) ->
    XLA native conv grads) computes the same gradients as the GSPMD-safe
    VJP up to fp rounding, and the switch restores cleanly."""
    from transception_tpu.ops.common import (
        depthwise_conv_op,
        set_safe_dwconv_kernel_grad,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 9, 9, 8)), jnp.float32)
    k = jnp.asarray(rng.random((3, 3, 1, 8)) - 0.5, jnp.float32)

    def loss(x, k):
        return jnp.sum(depthwise_conv_op(x, k, (1, 1), ((1, 1), (1, 1))) ** 2)

    try:
        set_safe_dwconv_kernel_grad(True)
        gx1, gk1 = jax.grad(loss, argnums=(0, 1))(x, k)
        set_safe_dwconv_kernel_grad(False)
        gx2, gk2 = jax.grad(loss, argnums=(0, 1))(x, k)
    finally:
        set_safe_dwconv_kernel_grad(True)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=2e-6, atol=1e-4)


def test_trainer_mesh_gating_helper():
    """needs_safe_dwconv_grad: multi-axis meshes -> True, 1-axis -> False."""
    from transception_tpu.parallel.mesh import make_mesh, needs_safe_dwconv_grad
    devs = jax.devices("cpu")
    if len(devs) >= 4:
        assert needs_safe_dwconv_grad(make_mesh(2, 2, devices=devs[:4]))
        assert not needs_safe_dwconv_grad(make_mesh(4, 1, devices=devs[:4]))
    assert not needs_safe_dwconv_grad(make_mesh(1, 1, devices=devs[:1]))
