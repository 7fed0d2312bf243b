"""Attention ops — the compute hot path.

Three linear-attention families from the reference, all O(N·d²):
  * EfficientAttention (Shen et al.): softmax(K over N), softmax(Q over d),
    out = softmax-Q · (softmax-Kᵀ V).          networks/MSTr.py:80-143
  * FactorAtt + CRPE (CoaT): softmax(K over N), out = scale·Q·(KᵀV) + CRPE.
                                                networks/MSTr.py:755-886
  * MHCA block/encoder wiring.                  networks/MSTr.py:905-993

TPU-first design: the reference's per-head Python loops (MSTr.py:117-139)
become batched einsums over a head axis; softmaxes accumulate in fp32; the
two chained contractions are MXU matmuls. An optional fused Pallas kernel
(ops/pallas/linear_attention.py) handles the context+output product in VMEM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from transception_tpu.ops.common import LayerNorm, MixFFNSkip, make_ffn, xavier

Dtype = Any


def _softmax_f32(x, axis):
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)


def efficient_linear_attention(q, k, v, *, use_pallas: bool = False):
    """Shen-et-al. linear attention on (B, h, N, d) tensors.

    k is softmax-normalized over tokens (N), q over per-head channels (d);
    context = Kᵀ·V is (d_k, d_v); out = Q·context. Matches the reference's
    per-head loop semantics (MSTr.py:117-139) exactly, batched. With
    use_pallas, the softmaxes and both contractions fuse into one VMEM
    kernel (ops/pallas/linear_attention_kernel.py)."""
    dt = v.dtype
    if use_pallas:
        from transception_tpu.ops.pallas.linear_attention import (
            fused_linear_attention,
        )
        out = fused_linear_attention(q, k, v, q_softmax=True)
        if out is not None:
            return out
    ks = _softmax_f32(k, axis=2).astype(dt)
    qs = _softmax_f32(q, axis=3).astype(dt)
    context = jnp.einsum("bhnk,bhnv->bhkv", ks, v,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bhnk,bhkv->bhnv", qs, context.astype(dt),
                     preferred_element_type=jnp.float32)
    return out.astype(dt)


def factorized_attention(q, k, v, scale: float, *, use_pallas: bool = False):
    """CoaT factorized attention on (B, h, N, d): scale·Q·(softmax-Kᵀ·V)."""
    dt = v.dtype
    if use_pallas:
        from transception_tpu.ops.pallas.linear_attention import (
            fused_linear_attention,
        )
        out = fused_linear_attention(q, k, v, q_softmax=False)
        if out is not None:
            return (scale * out.astype(jnp.float32)).astype(dt)
    ks = _softmax_f32(k, axis=2).astype(dt)
    context = jnp.einsum("bhnk,bhnv->bhkv", ks, v,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bhnk,bhkv->bhnv", q, context.astype(dt),
                     preferred_element_type=jnp.float32)
    return (scale * out).astype(dt)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth on the residual branch (the reference's
    dpr_generator schedule, MSTr.py:1112-1124, runs at rate 0.0; this makes
    the knob real). Per-sample Bernoulli keep with 1/keep rescale."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


def split_heads(x, num_heads: int):
    """(B, N, C) -> (B, h, N, C/h)."""
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    """(B, h, N, d) -> (B, N, h*d)."""
    B, h, N, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, h * d)


class EfficientAttention(nn.Module):
    """Linear attention with 1x1-conv (== dense) QKV (MSTr.py:80-143).

    Operates on token sequences directly; a 1x1 conv over B,C,H,W is a
    Dense over the channel axis, so the reference's reshape round-trips
    vanish. head_count is 1 everywhere it is used (the reference hardcodes
    it at MSTr.py:155)."""

    key_channels: int
    value_channels: int
    head_count: int = 1
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=self.dtype, param_dtype=jnp.float32, kernel_init=xavier,
            name=name)
        k = split_heads(dense(self.key_channels, "keys")(x), self.head_count)
        q = split_heads(dense(self.key_channels, "queries")(x), self.head_count)
        v = split_heads(dense(self.value_channels, "values")(x), self.head_count)
        out = merge_heads(
            efficient_linear_attention(q, k, v, use_pallas=self.use_pallas))
        return dense(C, "reprojection")(out)


class EfficientTransformerBlock(nn.Module):
    """LN -> EfficientAttention -> res -> LN -> FFN -> res (MSTr.py:146-173)."""

    dim: int
    key_dim: int
    value_dim: int
    token_mlp: str = "mix_skip"
    use_pallas: bool = False
    # None -> follow use_pallas (the bridge-fold convention). The whole
    # attention sub-block folds into one kernel; set False to keep the
    # plain (per-op) kernels with use_pallas on.
    attn_fold: object = None
    # None -> follow use_pallas: run norm2+FFN+residual as the fused
    # MixFFN_skip kernel. Set False to leave the FFN sub-block to XLA
    # (separate knob so scripts/measure_folds.py can attribute it).
    ffn_fold: object = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int):
        folded_attn = False
        want_fold = (self.use_pallas if self.attn_fold is None
                     else bool(self.attn_fold))
        if (want_fold and self.key_dim == self.dim
                and self.value_dim == self.dim and x.shape[-1] == self.dim):
            # Whole-block fold (eval path, like the bridge/FFN folds):
            # norm1 + QKV Denses + linear attention + reprojection +
            # residual in ONE kernel — the raw (B, N, C) stream crosses
            # HBM once in, once out, instead of the module chain's ~12
            # full-stream passes. Param holders mirror the module leaves
            # (norm1/ln/*, attn/{keys,queries,values,reprojection}/*) so
            # folded and unfolded structures share one checkpoint tree.
            from transception_tpu.ops.pallas.linear_attention import (
                can_fold_etb,
                fused_etb_attention_folded,
            )
            if can_fold_etb(x.shape, self.dtype):
                from transception_tpu.ops.common import (
                    _DenseParams,
                    _LNParams,
                )

                class _AttnParams(nn.Module):
                    c: int

                    @nn.compact
                    def __call__(self):
                        wk, bk = _DenseParams((self.c, self.c),
                                              name="keys")()
                        wq, bq = _DenseParams((self.c, self.c),
                                              name="queries")()
                        wv, bv = _DenseParams((self.c, self.c),
                                              name="values")()
                        wp, bp = _DenseParams((self.c, self.c),
                                              name="reprojection")()
                        return wq, bq, wk, bk, wv, bv, wp, bp

                ls, lb = _LNParams(self.dim, name="norm1")()
                ps = _AttnParams(self.dim, name="attn")()
                x = fused_etb_attention_folded(
                    x.astype(self.dtype), ls, lb, *ps)
                folded_attn = True
        if not folded_attn:
            h = LayerNorm(dtype=self.dtype, name="norm1")(x)
            h = EfficientAttention(self.key_dim, self.value_dim,
                                   head_count=1,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype, name="attn")(h)
            x = x + h
        want_ffn_fold = (self.use_pallas if self.ffn_fold is None
                         else bool(self.ffn_fold))
        if self.token_mlp == "mix_skip" and want_ffn_fold:
            # norm2 + FFN + residual fold into the fused MixFFN_skip
            # kernel (groups=1 -> plain LN); param tree identical to the
            # unfolded branch (norm2 holder + same "mlp" leaves), so
            # train (unfolded) and eval share one checkpoint.
            from transception_tpu.ops.common import _LNParams
            ls2, lb2 = _LNParams(self.dim, name="norm2")()
            return MixFFNSkip(self.dim, self.dim * 4, use_pallas=True,
                              dtype=self.dtype, name="mlp")(
                x, H, W, pre_ln=(ls2, lb2, 1, 1e-5), residual=True)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        # ffn_fold=False turns the FFN sub-block fully XLA (kernel off
        # too), mirroring the bridge_ffn_use_pallas semantics.
        h = make_ffn(self.token_mlp, self.dim, self.dim * 4, self.dtype,
                     "mlp", use_pallas=self.use_pallas and want_ffn_fold
                     )(h, H, W)
        return x + h


class ConvRelPosEnc(nn.Module):
    """CoaT convolutional relative position encoding (MSTr.py:755-823).

    Per-window-size grouped depthwise convs over V's token map, Hadamard
    with Q. window maps kernel size -> number of heads using it; channel
    order is head-major, matching the reference's
    'B h (H W) Ch -> B (h Ch) H W' rearrange."""

    ch_per_head: int
    num_heads: int
    window: tuple = ((3, 2), (5, 3), (7, 3))
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, v, H: int, W: int, params_only: bool = False):
        from transception_tpu.ops.common import DepthwiseConv
        Ch = self.ch_per_head
        convs = []
        for i, (win, heads) in enumerate(self.window):
            chs = heads * Ch
            p = win // 2
            convs.append((win, DepthwiseConv(
                chs, (win, win), padding=((p, p), (p, p)),
                dtype=self.dtype, name=f"conv_{i}")))
        if params_only:  # whole-block MHCA kernel fetches raw params
            return [(win, *conv(None, params_only=True))
                    for win, conv in convs]
        B, h, N, _ = q.shape
        v_img = v.transpose(0, 2, 1, 3).reshape(B, H, W, h * Ch)
        outs = []
        start = 0
        for win, conv in convs:
            chs = conv.features
            seg = v_img[..., start:start + chs]
            start += chs
            outs.append(conv(seg))
        conv_v = jnp.concatenate(outs, axis=-1)
        conv_v = conv_v.reshape(B, N, h, Ch).transpose(0, 2, 1, 3)
        return q * conv_v


class FactorAttConvRelPosEnc(nn.Module):
    """Factorized attention with CRPE (MSTr.py:826-886).

    The crpe module is shared per MHCAEncoder and passed in bound."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int, crpe: ConvRelPosEnc,
                 params_only: bool = False):
        if params_only:  # whole-block MHCA kernel fetches raw params
            from transception_tpu.ops.common import _DenseParams
            assert self.qkv_bias, "block fold assumes qkv bias"
            wqkv, bqkv = _DenseParams((self.dim, 3 * self.dim),
                                      name="qkv")()
            wp, bp = _DenseParams((self.dim, self.dim), name="proj")()
            return wqkv, bqkv, wp, bp
        B, N, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=xavier,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, C // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (C // h) ** -0.5
        att = factorized_attention(q, k, v, scale, use_pallas=self.use_pallas)
        out = att + crpe(q, v, H, W)
        # NB: reference computes scale*factor_att + crpe (MSTr.py:877);
        # factorized_attention already applied the scale.
        out = merge_heads(out)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=xavier, name="proj")(out)


class MHCABlock(nn.Module):
    """CPE -> LN -> FactorAtt(+CRPE) -> res -> LN -> MixFFN_skip -> res
    (MSTr.py:905-946). cpe/crpe are shared (bound) modules."""

    dim: int
    num_heads: int = 8
    mlp_ratio: int = 3
    drop_path_rate: float = 0.0
    use_pallas: bool = False
    # None -> follow use_pallas (the ETB convention): run norm2 +
    # MixFFN_skip + residual as ONE fused kernel (ops/pallas/mixffn.py,
    # groups=1). These FFNs dominate the MHCA stages' device time — the
    # r4 trace put 28.3 ms of the 124 ms b=128 forward in them, most of
    # it XLA layout roundtrips around the depthwise conv (batch-minor
    # for the conv, channel-minor for the fc dots). The fold runs under
    # the stages' nn.vmap (path-stacked weights batch into the kernel
    # grid).
    ffn_fold: object = None
    # None -> follow use_pallas: run the WHOLE block (CPE -> LN1 ->
    # FactorAtt(+CRPE) -> res -> LN2 -> MixFFN_skip -> res) as ONE Pallas
    # kernel (ops/pallas/mhca_block.py) so XLA layouts only break at
    # stage edges — the fix the r4 fold sweep named for the 28.3 ms of
    # layout roundtrips the per-op folds could not recover. Subsumes
    # ffn_fold when eligible (even map side; stage 4's 7x7 stays XLA).
    block_fold: object = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, H: int, W: int, cpe, crpe,
                 deterministic: bool = True):
        want_block = (self.use_pallas if self.block_fold is None
                      else bool(self.block_fold))
        # drop_path must stay exact when active: fold only when it is a
        # no-op (eval, or rate 0) — training runs the XLA branch anyway
        # (use_pallas_train).
        if want_block and H == W and (deterministic
                                      or self.drop_path_rate == 0.0):
            from transception_tpu.ops.pallas.mhca_block import (
                can_fold_block,
                fused_mhca_block_folded,
            )
            hidden = self.dim * self.mlp_ratio
            window = tuple(crpe.window)
            if can_fold_block(x.shape, self.dim, self.num_heads, hidden,
                              window, self.dtype):
                # Param holders mirror the module leaves exactly (cpe and
                # crpe are the encoder's bound modules; the rest create
                # the same paths the unfolded branch would), so folded
                # and unfolded structures share one checkpoint tree.
                from transception_tpu.ops.common import _LNParams
                cpe_k, cpe_b = cpe(x, H, W, params_only=True)
                ls1, lb1 = _LNParams(self.dim, name="norm1")()
                wqkv, bqkv, wp, bp = FactorAttConvRelPosEnc(
                    self.dim, num_heads=self.num_heads,
                    use_pallas=self.use_pallas, dtype=self.dtype,
                    name="factoratt_crpe")(x, H, W, crpe, params_only=True)
                crpe_params = crpe(None, None, H, W, params_only=True)
                ls2, lb2 = _LNParams(self.dim, name="norm2")()
                w1, b1, dwk, dwb, lns, lnb, w2, b2 = MixFFNSkip(
                    self.dim, hidden, dtype=self.dtype, name="mlp")(
                    x, H, W, params_only=True)
                return fused_mhca_block_folded(
                    x.astype(self.dtype), cpe_k, cpe_b, ls1, lb1,
                    wqkv, bqkv,
                    tuple(p[1] for p in crpe_params),
                    tuple(p[2] for p in crpe_params),
                    wp, bp, ls2, lb2, w1, b1, dwk, dwb, lns, lnb, w2, b2,
                    s=H, heads=self.num_heads, hidden=hidden,
                    window=window)
        dp = lambda b: drop_path(  # noqa: E731
            b, self.drop_path_rate, deterministic,
            self.make_rng("dropout") if (not deterministic
                                         and self.drop_path_rate > 0) else None)
        x = cpe(x, H, W)
        cur = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + dp(FactorAttConvRelPosEnc(
            self.dim, num_heads=self.num_heads, use_pallas=self.use_pallas,
            dtype=self.dtype, name="factoratt_crpe")(cur, H, W, crpe))
        want_ffn_fold = (self.use_pallas if self.ffn_fold is None
                         else bool(self.ffn_fold))
        # drop_path must stay exact when active: fold only when it is a
        # no-op (eval, or rate 0) — training runs the XLA branch anyway
        # (use_pallas_train).
        if want_ffn_fold and (deterministic or self.drop_path_rate == 0.0):
            from transception_tpu.ops.common import _LNParams
            ls2, lb2 = _LNParams(self.dim, name="norm2")()
            return MixFFNSkip(self.dim, self.dim * self.mlp_ratio,
                              use_pallas=True, dtype=self.dtype,
                              name="mlp")(
                x, H, W, pre_ln=(ls2, lb2, 1, 1e-6), residual=True)
        cur = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + dp(make_ffn("mix_skip", self.dim, self.dim * self.mlp_ratio,
                            self.dtype, "mlp",
                            use_pallas=self.use_pallas and want_ffn_fold
                            )(cur, H, W))
        return x


class MHCAEncoder(nn.Module):
    """Stack of MHCABlocks sharing one CPE + one CRPE (MSTr.py:949-993).

    Input (B, H, W, C) map -> tokens -> blocks -> back to map."""

    dim: int
    num_layers: int = 1
    num_heads: int = 8
    mlp_ratio: int = 3
    crpe_window: tuple = ((3, 2), (5, 3), (7, 3))
    drop_path_rates: tuple = ()
    use_pallas: bool = False
    ffn_fold: object = None  # None -> follow use_pallas (see MHCABlock)
    block_fold: object = None  # None -> follow use_pallas (see MHCABlock)
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        from transception_tpu.ops.common import ConvPosEnc
        self.cpe = ConvPosEnc(self.dim, k=3, dtype=self.dtype)
        self.crpe = ConvRelPosEnc(self.dim // self.num_heads, self.num_heads,
                                  window=self.crpe_window, dtype=self.dtype)
        rates = self.drop_path_rates or (0.0,) * self.num_layers
        self.layers = [
            MHCABlock(self.dim, num_heads=self.num_heads,
                      mlp_ratio=self.mlp_ratio, drop_path_rate=rates[i],
                      use_pallas=self.use_pallas, ffn_fold=self.ffn_fold,
                      block_fold=self.block_fold,
                      dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)
        for layer in self.layers:
            t = layer(t, H, W, self.cpe, self.crpe,
                      deterministic=deterministic)
        return t.reshape(B, H, W, C)
