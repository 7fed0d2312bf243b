"""Common token-sequence ops (NHWC / (B, N, C) layouts).

Behavioral reference: networks/MSTr.py:21-77 (DWConv/MixFFN family),
:176-227 (patch expanders), :292-304 (overlap patch embed), :734-752 (CPE).
All modules compute matmuls/convs in `dtype` (bf16 on TPU) with fp32 params
and fp32 LayerNorm, and use jnp reshapes instead of einops-on-torch.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier = nn.initializers.xavier_uniform()


def gelu(x):
    """Exact (erf) GELU to match torch nn.GELU default."""
    import jax
    return jax.nn.gelu(x, approximate=False)


def _fwd_only_barrier_impl(x):
    import jax
    return jax.lax.optimization_barrier(x)


def fwd_only_barrier(x):
    """optimization_barrier in the forward pass only; the backward is a
    plain pass-through. Blocks XLA from fusing a convert into the
    producer matmul (which would materialize the tensor at fp32) without
    constraining how the cotangent graph fuses."""
    import jax

    @jax.custom_vjp
    def _b(x):
        return _fwd_only_barrier_impl(x)

    def _b_fwd(x):
        return _fwd_only_barrier_impl(x), None

    def _b_bwd(_, g):
        return (g,)

    _b.defvjp(_b_fwd, _b_bwd)
    return _b(x)


def _depthwise_conv_raw(x, k, stride, padding):
    import jax
    return jax.lax.conv_general_dilated(
        x, k, stride, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


# The safe kernel-grad VJP below exists for MULTI-AXIS meshes only (the
# jax 0.9 GSPMD bug it works around needs batch sharded on one axis of a
# >=2-axis mesh to bite). It costs ~6 ms on the single-chip bs-24 train
# step (89.5 vs 83.5 ms measured r5) because XLA's fused conv-grad beats
# the explicit shifted multiply-reduces, so the trainer/bench gate it to
# the meshes that need it. Default True: silent x2 kernel grads are worse
# than 7% step time for any caller that never sets the switch.
_SAFE_DWCONV_KERNEL_GRAD = True


def set_safe_dwconv_kernel_grad(on: bool) -> None:
    """Select the depthwise kernel-grad VJP at trace time. True = the
    GSPMD-safe explicit-reduction backward (required when training over a
    mesh with >=2 nontrivial axes, e.g. dp x tp — see depthwise_conv_op);
    False = XLA's native conv grads (faster; correct on single device or
    a single-axis mesh). parallel/mesh.py:needs_safe_dwconv_grad maps a
    mesh to the right setting."""
    global _SAFE_DWCONV_KERNEL_GRAD
    _SAFE_DWCONV_KERNEL_GRAD = bool(on)


def depthwise_conv_op(x, k, stride, padding):
    """Depthwise conv with a GSPMD-safe kernel-gradient VJP.

    jax 0.9 GSPMD bug (minimal repro: tests/test_tp_grads.py): the KERNEL
    gradient of a feature_group_count==C convolution whose batch operand
    is sharded on one mesh axis comes back multiplied by the product of
    the OTHER mesh axis sizes — x2 on a (data=4, model=2) mesh, x4 on
    (2, 4) — i.e. the partitioner's grad all-reduce sums over axes the
    batch sharding never used. Forward and input gradients are correct;
    regular (fgc=1) convs are unaffected. This silently doubled every
    depthwise kernel's gradient in tp>=2 training.

    Forward here is the identical lax call (bit-identical logits).
    Backward: input grad via the standard conv transpose (verified
    correct under the mesh); kernel grad as kh*kw explicit shifted
    multiply-reduces — plain jnp.sum reductions, which GSPMD partitions
    correctly. fp32 accumulation, rounded to the kernel dtype like the
    conv-grad conv would.
    """
    if not _SAFE_DWCONV_KERNEL_GRAD:
        return _depthwise_conv_raw(x, k, tuple(stride),
                                   tuple(map(tuple, padding)))
    return _depthwise_conv_impl(x, k, tuple(stride),
                                tuple(map(tuple, padding)))


def _make_depthwise_impl():
    import functools

    import jax

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def impl(x, k, stride, padding):
        return _depthwise_conv_raw(x, k, stride, padding)

    def fwd(x, k, stride, padding):
        return _depthwise_conv_raw(x, k, stride, padding), (x, k)

    def bwd(stride, padding, res, g):
        x, k = res
        _, vjp_x = jax.vjp(
            lambda xx: _depthwise_conv_raw(xx, k, stride, padding), x)
        dx, = vjp_x(g)
        kh, kw, _, C = k.shape
        (ph0, ph1), (pw0, pw1) = padding
        sh, sw = stride
        xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        Ho, Wo = g.shape[1], g.shape[2]
        gf = g.astype(jnp.float32)
        taps = []
        for di in range(kh):
            for dj in range(kw):
                sl = jax.lax.slice(
                    xp, (0, di, dj, 0),
                    (xp.shape[0], di + (Ho - 1) * sh + 1,
                     dj + (Wo - 1) * sw + 1, C),
                    (1, sh, sw, 1))
                taps.append(jnp.sum(sl.astype(jnp.float32) * gf,
                                    axis=(0, 1, 2)))
        dk = jnp.stack(taps).reshape(kh, kw, 1, C).astype(k.dtype)
        return dx, dk

    impl.defvjp(fwd, bwd)
    return impl


_depthwise_conv_impl = _make_depthwise_impl()


class DepthwiseConv(nn.Module):
    """Drop-in for ``nn.Conv(C, (kh, kw), feature_group_count=C)``: same
    param tree (kernel (kh, kw, 1, C) + optional bias) and bit-identical
    forward, with the GSPMD-safe kernel-grad VJP of depthwise_conv_op."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        kh, kw = self.kernel_size
        kern = self.param("kernel", xavier, (kh, kw, 1, self.features),
                          jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        if params_only:  # fold paths fetch raw params (tree unchanged)
            return kern, b
        y = depthwise_conv_op(x.astype(self.dtype), kern.astype(self.dtype),
                              self.strides, self.padding)
        if self.use_bias:
            y = y + b.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """fp32 LayerNorm returning the input compute dtype."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln")(x)
        return y.astype(self.dtype)


class DWConv(nn.Module):
    """3x3 depthwise conv over a token sequence (MSTr.py:21-31).

    (B, N, C) -> reshape to the (H, W) map -> depthwise conv -> back.
    """

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, N, C = x.shape
        t = x.reshape(B, H, W, C)
        t = DepthwiseConv(C, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, name="dwconv")(t)
        return t.reshape(B, N, C)


class MixFFN(nn.Module):
    """fc1 -> DWConv -> GELU -> fc2 (MSTr.py:35-46)."""

    c1: int
    c2: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int):
        h = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=xavier, name="fc1")(x)
        h = DWConv(self.c2, dtype=self.dtype, name="dwconv")(h, H, W)
        h = gelu(h)
        return nn.Dense(self.c1, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=xavier, name="fc2")(h)


class _DenseParams(nn.Module):
    """Param-holder matching nn.Dense's kernel+bias paths/inits."""

    shape: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", xavier, tuple(self.shape), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.shape[-1],), jnp.float32)
        return k, b


class MixFFNSkip(nn.Module):
    """fc1 -> (DWConv + fc1 skip) -> LN -> GELU -> fc2 (MSTr.py:889-902).

    The hot FFN in every encoder/bridge block; fc1 output is computed once
    and reused for the skip. With use_pallas (and an eligible square map)
    the whole chain runs as one fused kernel
    (ops/pallas/mixffn_kernel.py) — HBM sees only the C-wide input and
    output, never the 4x hidden state; param tree identical to the XLA
    branch.
    """

    c1: int
    c2: int
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int, pre_ln=None,
                 residual: bool = False, params_only: bool = False):
        """pre_ln = (scale, bias, groups, eps): apply the CALLER'S LayerNorm
        (e.g. the bridge's shared norm2, as a grouped LN on this wide
        layout) before fc1; residual=True adds the raw (pre-LN) input to
        the output. Both fold into the fused kernel when eligible —
        removing the caller's full-stream LN pass and separate residual
        add from XLA (the bridge layer's two remaining per-layer stream
        passes, MSTr.py:2402-2407).

        params_only=True creates/returns the raw FFN params without
        computing (the whole-block MHCA kernel path) — same holder names
        as the fused branch, so the checkpoint tree is identical. Input
        width is c1 (true for every MHCA/ETB use)."""
        if params_only:
            w1, b1 = _DenseParams((self.c1, self.c2), name="fc1")()

            class _ConvHolderP(nn.Module):
                c2: int

                @nn.compact
                def __call__(self):
                    return _DenseParams((3, 3, 1, self.c2), name="dwconv")()

            dwk, dwb = _ConvHolderP(self.c2, name="dwconv")()
            ls, lb = _LNParams(self.c2, name="norm1")()
            w2, b2 = _DenseParams((self.c2, self.c1), name="fc2")()
            return w1, b1, dwk, dwb, ls, lb, w2, b2
        if self.use_pallas:
            from transception_tpu.ops.pallas.mixffn import (
                can_fuse,
                can_fuse_ln,
                fused_mixffn,
                fused_mixffn_ln,
            )
            folded = (pre_ln is not None and residual and
                      can_fuse_ln(x.shape, H, W, self.c2, pre_ln[2],
                                  x.dtype))
            if folded or (pre_ln is None and
                          can_fuse(x.shape, H, W, self.c2, x.dtype)):
                w1, b1 = _DenseParams((x.shape[-1], self.c2), name="fc1")()

                class _ConvHolder(nn.Module):
                    c2: int

                    @nn.compact
                    def __call__(self):
                        return _DenseParams((3, 3, 1, self.c2),
                                            name="dwconv")()

                dwk, dwb = _ConvHolder(self.c2, name="dwconv")()
                ls, lb = _LNParams(self.c2, name="norm1")()
                w2, b2 = _DenseParams((self.c2, self.c1), name="fc2")()
                if folded:
                    pls, plb, groups, peps = pre_ln
                    return fused_mixffn_ln(
                        x.astype(self.dtype), jnp.tile(pls, groups),
                        jnp.tile(plb, groups), w1, b1,
                        dwk.reshape(3, 3, self.c2), dwb, ls, lb, w2, b2,
                        s=H, hidden=self.c2, groups=groups, eps_ln=peps)
                return fused_mixffn(
                    x.astype(self.dtype), w1, b1,
                    dwk.reshape(3, 3, self.c2), dwb, ls, lb, w2, b2,
                    s=H, hidden=self.c2)
        x0 = x
        if pre_ln is not None:
            from transception_tpu.ops.pallas.mixffn import group_ln
            pls, plb, groups, peps = pre_ln
            x = group_ln(x.astype(self.dtype), jnp.tile(pls, groups),
                         jnp.tile(plb, groups), groups, peps)
        h = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=xavier, name="fc1")(x)
        d = DWConv(self.c2, dtype=self.dtype, name="dwconv")(h, H, W)
        a = LayerNorm(dtype=self.dtype, name="norm1")(d + h)
        a = gelu(a)
        out = nn.Dense(self.c1, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=xavier, name="fc2")(a)
        if residual:
            out = out + x0.astype(out.dtype)
        return out


class MLPFFN(nn.Module):
    """Plain 2-layer MLP with dropout 0.1 (MSTr.py:63-77)."""

    c1: int
    c2: int
    drop_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=xavier, name="fc1")(x)
        h = gelu(h)
        h = nn.Dropout(self.drop_rate, deterministic=deterministic)(h)
        h = nn.Dense(self.c1, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=xavier, name="fc2")(h)
        return nn.Dropout(self.drop_rate, deterministic=deterministic)(h)


def make_ffn(token_mlp: str, dim: int, hidden: int, dtype, name: str,
             use_pallas: bool = False):
    """FFN factory matching the token_mlp switch (MSTr.py:157-162)."""
    if token_mlp == "mix":
        return MixFFN(dim, hidden, dtype=dtype, name=name)
    if token_mlp == "mix_skip":
        return MixFFNSkip(dim, hidden, use_pallas=use_pallas, dtype=dtype,
                          name=name)
    return MLPFFN(dim, hidden, dtype=dtype, name=name)


class OverlapPatchEmbed(nn.Module):
    """Conv(k=7, s=4, p=3) stem + LN, returns tokens (MSTr.py:292-304)."""

    dim: int
    patch_size: int = 7
    stride: int = 4
    padding: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.padding
        y = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=xavier,
                    name="proj")(x)
        B, H, W, C = y.shape
        t = LayerNorm(dtype=self.dtype, name="norm")(y.reshape(B, H * W, C))
        return t, H, W


class _DenseKernelParam(nn.Module):
    """Param-holder producing the exact path/shape/init of an unbiased
    nn.Dense kernel, so the fused-kernel branch shares checkpoints with
    the XLA branch."""

    shape: Any

    @nn.compact
    def __call__(self):
        return self.param("kernel", xavier, tuple(self.shape), jnp.float32)


class _LNParams(nn.Module):
    """Param-holder matching LayerNorm's norm/ln/{scale,bias} layout."""

    dim: int

    @nn.compact
    def __call__(self):
        class _Inner(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                s = self.param("scale", nn.initializers.ones,
                               (self.dim,), jnp.float32)
                b = self.param("bias", nn.initializers.zeros,
                               (self.dim,), jnp.float32)
                return s, b

        return _Inner(self.dim, name="ln")()


def _expand_epilogue(x, H, W, p, dim_out_c, expand_features, token_c,
                     dtype, use_pallas, barrier=False, pre_shuffle=False):
    """Shared body of PatchExpand/FinalPatchExpandX4: Dense(expand) ->
    LN(norm) -> pixel shuffle, either as the fused Pallas epilogue
    (ops/pallas/expand_kernel.py — the decoder head's XLA lowering cost
    ~16.6 ms of a 144 ms b=128 forward) or the plain XLA chain.

    pre_shuffle=True returns the normalized expansion in PRE-shuffle token
    order (B, N, p², c): per-pixel consumers that commute with the pixel
    shuffle (the decoder's 1x1 head conv + argmax) can run on this layout
    and skip the two (B, N, p²c) layout copies (measured 2.59 + 2.49 ms of
    the b=128 forward)."""
    B, N, C = x.shape
    c = token_c
    y = None
    if use_pallas:
        from transception_tpu.ops.pallas.patch_expand import (
            can_fuse,
            fused_expand,
            fused_expand_pre_shuffle,
        )
        if can_fuse(x.shape, H, W, C, c, p, x.dtype):
            w = _DenseKernelParam((C, expand_features), name="expand")()
            scale, bias = _LNParams(c, name="norm")()
            if pre_shuffle:
                return fused_expand_pre_shuffle(
                    x.astype(dtype), w, scale, bias, H=H, W=W, p=p, c=c
                ).reshape(B, N, p * p, c)
            return fused_expand(x.astype(dtype), w, scale, bias,
                                H=H, W=W, p=p, c=c)
    y = nn.Dense(expand_features, use_bias=False, dtype=dtype,
                 param_dtype=jnp.float32, kernel_init=xavier,
                 name="expand")(x)
    # LN normalizes each c-vector independently and the pixel shuffle
    # permutes whole c-vectors, so LN commutes with the rearrange —
    # applying it first keeps the (p²x-larger) shuffle copies in the
    # compute dtype instead of fp32 (measured HBM win on v5e).
    if barrier:
        y = fwd_only_barrier(y)
    y = LayerNorm(dtype=dtype, name="norm")(
        y.reshape(B, p * p * N, c))
    if pre_shuffle:
        return y.reshape(B, N, p * p, c)
    y = y.reshape(B, H, W, p, p, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, p * p * H * W, c)


class PatchExpand(nn.Module):
    """2x pixel-shuffle upsample: Linear(dim->2dim) + rearrange + LN
    (MSTr.py:176-201). Token layout matches einops
    'b h w (p1 p2 c) -> b (h p1) (w p2) c'.
    """

    dim: int
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int):
        return _expand_epilogue(x, H, W, 2, self.dim, 2 * self.dim,
                                self.dim // 2, self.dtype, self.use_pallas)


class FinalPatchExpandX4(nn.Module):
    """4x upsample: Linear(dim->16dim) + rearrange + LN (MSTr.py:203-227).

    The XLA fallback keeps the 16x expansion in bf16 (fwd-only barrier so
    the LN's fp32 convert can't fuse into the matmul and materialize the
    (B, N, 16*dim) tensor at 4 bytes/elt); with use_pallas the whole
    epilogue runs as one fused kernel."""

    dim: int
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int, pre_shuffle: bool = False):
        return _expand_epilogue(x, H, W, 4, self.dim, 16 * self.dim,
                                self.dim, self.dtype, self.use_pallas,
                                barrier=True, pre_shuffle=pre_shuffle)


class ConvPosEnc(nn.Module):
    """CPVT conditional position encoding: 3x3 depthwise conv + residual on
    the token map (MSTr.py:734-752)."""

    dim: int
    k: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int, params_only: bool = False):
        p = self.k // 2
        proj = DepthwiseConv(self.dim, (self.k, self.k),
                             padding=((p, p), (p, p)), dtype=self.dtype,
                             name="proj")
        if params_only:  # whole-block MHCA kernel fetches raw params
            return proj(None, params_only=True)
        B, N, C = x.shape
        t = x.reshape(B, H, W, C)
        y = proj(t)
        return (y + t).reshape(B, N, C)
