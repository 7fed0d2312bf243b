"""Typed configuration for the TransCeption TPU framework.

The reference's effective config is ~40 argparse flags spread over
train_MSTransception.py:18-95 and semantic mappings done in __main__
(br_config table at train_MSTransception.py:145-159, LR scaling at :123-124).
Here the same knob set is one frozen dataclass tree with validated defaults
matching the published recipe (README.md:61, networks/MSTr.py:2759-2761).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# Convolutional relative position encoding window split, reference
# networks/MSTr.py:958 (crpe_window={3: 2, 5: 3, 7: 3}).
CRPE_WINDOW: Tuple[Tuple[int, int], ...] = ((3, 2), (5, 3), (7, 3))


def br_config_to_ch_att_list(br_config: int) -> Tuple[bool, bool, bool, bool]:
    """Bridge layer channel/spatial attention selection.

    Mirrors train_MSTransception.py:145-159 — True means channel attention,
    False means spatial attention for that bridge layer. The published model
    uses br_config=2 => (c, s, s, s).
    """
    table = {
        0: (False, False, False, False),
        1: (True, True, True, True),
        2: (True, False, False, False),
        3: (False, True, False, True),
    }
    return table.get(br_config, (True, False, True, False))


def use_sa_config_to_list(use_sa_config: int, concat: str, stage_3or4: int
                          ) -> Tuple[bool, ...]:
    """CBAM spatial-attention enable flags per stage.

    Mirrors networks/MSTr.py:2766-2779 including the override that any
    non-cbam concat (or 4-stage model) forces [T, T, T, F].
    """
    table = {
        1: (True, True, False),
        2: (True, False, False),
        3: (False, False, False),
        4: (True, True, True),
    }
    lst = table.get(use_sa_config, (True, True, True, False))
    if concat != "cbam" or stage_3or4 == 4:
        lst = (True, True, True, False)
    return lst


@dataclasses.dataclass(frozen=True)
class TransceptionConfig:
    """Model architecture config for MSTransception (networks/MSTr.py:2759-2823).

    Defaults reproduce the published 82.24-DSC configuration:
    3-stage MSViT backbone, coord IFF, original 4-layer dual bridge with
    br_config 2 (channel, spatial, spatial, spatial), head_count 8.
    """

    num_classes: int = 9
    img_size: int = 224
    in_chans: int = 3  # gray inputs are repeated to 3 channels (MSTr.py:2828-2829)

    # Backbone dims for the 4 feature scales (MSTr.py:2765).
    dims: Tuple[int, int, int, int] = (64, 128, 320, 512)
    # Stage-1 EfficientTransformerBlock count (layers[0]=2, MSTr.py:2765,1668-1670).
    stage1_layers: int = 2
    # MHCA stages 2-4: paths / layers / heads (MSViT_config, MSTr.py:1574-1586).
    num_path: Tuple[int, ...] = (3, 3, 3)
    num_layers: Tuple[int, ...] = (3, 8, 3)
    num_heads: Tuple[int, ...] = (8, 8, 8)
    mlp_ratio: int = 4  # MSTr.py:1590

    head_count: int = 8  # API-parity knob; stage-1/decoder attention forces 1
    # head (reference hardcodes head_count=1 at MSTr.py:155)
    token_mlp: str = "mix_skip"  # mix | mix_skip | mlp
    concat: str = "coord"  # IFF: normal|3d|se|skn|cbam|coord|cam|cam_fact
    have_bridge: str = "original"  # original | sp | para | none
    br_ch_att_list: Tuple[bool, bool, bool, bool] = (True, False, False, False)
    stage_3or4: int = 3  # 3 | 4 | anything-else => casa variant
    use_sa_config: int = 1
    sa_ker: int = 7
    inter: str = "res"  # casa CBAM interface: res | out
    num_sp: int = 1  # spatial-aware layers in the 'sp' bridge
    dil_conv: int = 1  # legacy Transception encoder dilation switch

    # Bridge internals (MSTr.py:2800-2809).
    bridge_dim: int = 64
    bridge_heads: int = 1
    reduction_ratios: Tuple[int, int, int, int] = (1, 2, 4, 8)
    # Sequence parallelism for the bridge: shard the fused token sequence
    # on this mesh axis (requires an installed mesh; '' disables).
    bridge_seq_shard_axis: str = ""

    # TPU dtype policy: compute dtype for matmuls/convs; params and
    # norm/softmax accumulators stay fp32.
    dtype: str = "bfloat16"
    # Rematerialize encoder stages to trade FLOPs for HBM (jax.checkpoint).
    remat: bool = False
    # Use fused Pallas kernels for linear attention where shapes allow.
    use_pallas: bool = True
    # Kernels in the TRAINING step: off by default — the fused forwards
    # carry recompute-style custom-VJP backwards that cost more than
    # XLA's joint-optimized fwd+bwd (measured +13 ms/step at bs=24 on
    # v5e, r2). Inference keeps the kernels. Flip when Pallas backward
    # kernels land.
    use_pallas_train: bool = False
    # Overrides use_pallas for the BRIDGE only (None => follow
    # use_pallas). The trainer sets this when building the train-step
    # model so the bridge attention — the one op with a real flash-style
    # Pallas backward (ops/pallas/bridge_attention_kernel.py) — keeps its
    # kernels in training while the other ops (whose custom-VJP backwards
    # lose to XLA's joint fwd+bwd) fall back.
    bridge_use_pallas: object = None  # Optional[bool]
    # Overrides the bridge's per-scale MixFFN_skip kernels only (None =>
    # follow the bridge's resolved use_pallas). Default False since the
    # r4 fold-attribution sweep (scripts/measure_folds.py, b=128 device
    # trace): the full-combination table shows the best graph keeps ONLY
    # the ETB fold (124.0 ms) — the FFN kernels and the attention fold
    # each measure as net losses in the full graph, though the one-off
    # deltas are non-additive (README fold table). The trainer also sets
    # False (its custom-VJP backward loses to XLA's joint fwd+bwd).
    bridge_ffn_use_pallas: object = False  # Optional[bool]
    # Folds the bridge attention's q/out projections + layer residual
    # into the attention kernel (None => follow the bridge's resolved
    # use_pallas). Default False per the same r4 sweep (a -1.8 ms loss
    # at b=128 vs the plain bridge-attention kernel). The trainer sets
    # False too: the fold's backward would recompute the attention,
    # losing to the plain kernel's flash Pallas backward.
    bridge_attn_fold: object = False  # Optional[bool]
    # Folds each EfficientTransformerBlock's norm1 + QKV Denses + linear
    # attention + reprojection + residual into ONE kernel (stage-1 and
    # decoder blocks; None => follow use_pallas). The one fold the r4
    # sweep confirms as a win (+3.5 to +6.8 ms depending on combo); the
    # trainer's use_pallas=False keeps it off in the train step.
    etb_attn_fold: object = None  # Optional[bool]
    # Runs each EfficientTransformerBlock's norm2 + MixFFN_skip + residual
    # as the fused MixFFN kernel (None => follow use_pallas; False =>
    # that FFN sub-block goes fully XLA, kernel included) — separate axis
    # so scripts/measure_folds.py can attribute it like the bridge knobs.
    etb_ffn_fold: object = None  # Optional[bool]
    # Runs each MHCA block's norm2 + MixFFN_skip + residual as the fused
    # MixFFN kernel, under the stages' nn.vmap (path-stacked weights
    # batch into the kernel grid). Default False — a MEASURED full-graph
    # loss despite 2x isolated kernel wins: the MHCA FFNs were the
    # largest device-time family of the r4 b=128 trace (28.3 ms of
    # 124 ms, mostly layout roundtrips around the depthwise conv), and
    # isolated v5e probes beat XLA 2.67 vs 5.25 ms (stage-2 geometry) /
    # 1.12 vs 2.33 (stage-3) — but in the full graph fold-ON measures
    # 128.3 vs 124.6 ms: XLA lays the whole stage out batch-minor
    # (C = 64 half-fills the 128 lanes, batch fills them), and each
    # kernel's row-major boundary re-imposes relayout copies on the
    # attention/CPE neighbors (+2.7 ms stage-2, +0.55 stage-3). The one
    # fix that would pay is chaining whole-block kernels so layouts
    # only break at stage edges — blocked on a Pallas CRPE (49-tap
    # shifted-add depthwise would be VPU-bound far past XLA's conv
    # emitter). Stage 4 (7x7 maps) is always XLA — odd map sides fail
    # Mosaic's shape-cast (mixffn_kernel._pick_rows).
    mhca_ffn_fold: object = False  # Optional[bool]
    # Runs each WHOLE MHCA block (CPE -> LN1 -> FactorAtt+CRPE -> res ->
    # LN2 -> MixFFN_skip -> res) as ONE Pallas kernel
    # (ops/pallas/mhca_block_kernel.py) so XLA layouts only break at
    # stage edges — the structural fix the r4 sweep named for the
    # 28.3 ms of MHCA layout roundtrips that per-op folds (mhca_ffn_fold)
    # could not recover. Covers stages 2-3 (even map sides); stage 4's
    # 7x7 maps stay XLA (Mosaic shape-cast). Subsumes mhca_ffn_fold
    # where eligible. Default True — a MEASURED r5 full-graph win:
    # 124.0 -> 117.0 ms b=128 (probe_block_fold), after the stage-2
    # C=64 geometry got lane-packing (two batch rows per 128 lanes,
    # mhca_block_kernel pack=2: standalone 6.78 -> 4.72 ms/call;
    # stripped-kernel attribution in scripts/probe_mhca_parts.py).
    # None => follow use_pallas.
    mhca_block_fold: object = True  # Optional[bool]
    # Keep the fused MixFFN_skip kernels ON in the TRAIN step (ETB +
    # MHCA folds and the bridge per-scale FFNs), paired with the flash
    # Pallas backward (mixffn_kernel._bwd_kernel_ln): recompute-in-VMEM
    # per row tile, weight grads accumulated on-chip — unlike the r2
    # custom-VJPs, the hidden stream never crosses HBM in either
    # direction. Resolved by train_step_model; default pending a bs-24
    # device measurement (scripts/measure_train.py --flash).
    ffn_flash_train: bool = False
    # Execute the num_path MHCA encoders of each stage as one vmapped
    # (path-stacked-params) call instead of sequentially — same math,
    # measured +14% inference / +81% training on v5e. Changes the param
    # tree layout (mhca_blks_stacked vs mhca_blks_{i}); the .pth converter
    # handles both. Set False for the reference-mirroring layout.
    vectorize_paths: bool = True
    drop_rate: float = 0.1  # MLP_FFN dropout (MSTr.py:69)
    # Stochastic depth; the reference's dpr_generator runs at 0.0
    # (MSTr.py:1592) — here the knob is functional.
    drop_path_rate: float = 0.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def use_sa_list(self) -> Tuple[bool, ...]:
        return use_sa_config_to_list(self.use_sa_config, self.concat,
                                     self.stage_3or4)

    @property
    def stage1_res(self) -> int:
        """Stage-1 token map side (img/4 via the overlapping 7/4/3 stem)."""
        return self.img_size // 4

    def bridge_token_splits(self) -> Tuple[int, ...]:
        """Token counts of each scale in the fused bridge sequence, measured
        in bridge_dim(=64)-channel tokens.

        The reference hardcodes 3136/1568/980/392 for 224 inputs
        (MSTr.py:2394-2397); here they derive from img_size so non-224
        inputs work.
        """
        c_mults = tuple(d // self.bridge_dim for d in self.dims)  # (1,2,5,8)
        sides = tuple(self.stage1_res // (1 << i) for i in range(4))
        return tuple(s * s * m for s, m in zip(sides, c_mults))

    def decoder_in_chans(self) -> Tuple[int, int, int, int]:
        """Per-stage decoder 'dims' (in_out_chan[0], MSTr.py:2814-2823),
        derived from `dims` instead of the reference's hardcoded
        512/288/144/32: each stage's concat width is (previous out_dim / 2
        after PatchExpand) + skip dim, and in_out_chan[0] is that width
        divided by the concat multiplier (2, or 4 at the last stage).
        Defaults reproduce (512, 288, 144, 32) exactly."""
        d = self.dims
        return (d[3],
                (d[3] // 2 + d[2]) // 2,
                (d[2] // 2 + d[1]) // 2,
                (d[1] // 2 + d[0]) // 4)

    def validate(self) -> "TransceptionConfig":
        assert self.img_size % 32 == 0, "img_size must be divisible by 32"
        assert self.token_mlp in ("mix", "mix_skip", "mlp")
        assert self.have_bridge in ("original", "sp", "para", "none", "None")
        assert len(self.num_path) == len(self.num_layers) == len(self.num_heads)
        for d in self.dims:
            assert d % self.bridge_dim == 0 or d == self.dims[0], (
                "bridge requires dims to be multiples of bridge_dim")
        return self


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Synapse/ISIC data pipeline config (datasets/dataset_synapse.py:75-128)."""

    dataset: str = "synapse"  # synapse | isic | synthetic
    root_path: str = "./data/Synapse/train_npz"
    test_path: str = "./data/Synapse/test_vol_h5"
    list_dir: str = "./lists/lists_Synapse"
    img_size: int = 224
    num_classes: int = 9
    num_workers: int = 4
    augment: bool = True
    # Synthetic fallback: deterministic random data for envs with no dataset.
    synthetic_len: int = 2211  # matches lists_Synapse/train.txt
    # Generate synthetic training batches ON DEVICE (jitted PRNG) instead
    # of streaming them from the host. Zero H2D per step — required for
    # long recipe runs on this image, where the axon tunnel leaks host RSS
    # on every transfer (see data/device_synthetic.py). synthetic only.
    device_data: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (README.md:61; trainer.py:123-157)."""

    base_lr: float = 0.05
    batch_size: int = 24  # global batch (train_MSTransception.py:35)
    max_epochs: int = 400
    momentum: float = 0.9
    weight_decay: float = 1e-4
    use_scheduler: bool = True  # cosine per-iteration (trainer.py:126-127)
    grad_clipping: bool = False  # clip_grad_norm max 5 (trainer.py:147-148)
    grad_accum_steps: int = 1  # real impl of the reference's dead flag
    ce_weight: float = 0.4  # trainer.py:143
    dice_weight: float = 0.6
    seed: int = 1234
    eval_interval: int = 20
    # 'interval': simple every-N-epochs knobs (ckpt_every/eval_interval).
    # 'reference': the recipe-exact two-phase cadence of trainer.py:179-226
    # (every 20 epochs in [max/2, max-100), every eval_interval after).
    eval_schedule: str = "interval"
    output_dir: str = "./output"
    model_name: str = "transception_tpu"
    # Mesh: data-parallel size (<=0 => all devices); optional model axis.
    dp_size: int = -1
    tp_size: int = 1
    # Checkpointing (orbax): save every N epochs; auto-resume if present.
    ckpt_every: int = 20
    resume: bool = True
    # In-training eval: run the protocol's order-3 spline input resample
    # on device (exact scipy-derived operator matmuls; ~1e-6 input
    # tolerance — see eval/inference.py:_zoom_operator). Cuts the host
    # spline out of every periodic eval pass; model-selection decisions
    # are insensitive at this tolerance. Final published numbers should
    # still come from cli/test.py's default host-spline path.
    eval_device_resample: bool = False
    # Train-step loss in PRE-pixel-shuffle token order: the final-expand
    # shuffle + LN re-tiling copies (measured ~14 ms of the 104 ms bs-24
    # step backward) drop out of the graph; the no-grad labels are
    # permuted instead. Loss equals the standard layout up to fp32
    # reduction order (train/trainer.py make_train_step wide_head;
    # tests/test_wide_head.py). MSTransception only — ignored otherwise.
    wide_loss: bool = True

    def scaled_lr(self) -> float:
        """LR linear scaling rule (train_MSTransception.py:123-124)."""
        if self.batch_size != 24 and self.batch_size % 5 == 0:
            return self.base_lr * self.batch_size / 24
        return self.base_lr


# Kernel-fallback ladder: config overrides to try in order when a Pallas
# kernel fails to compile on the current Mosaic/libtpu build — first the
# eval-only folds come off, then every hand kernel. Shared by bench.py,
# __graft_entry__.py and the eval predictor so the three entry points can
# never drift apart.
KERNEL_FALLBACK_OVERRIDES: Tuple[dict, ...] = (
    {},
    dict(bridge_attn_fold=False, bridge_ffn_use_pallas=False,
         etb_attn_fold=False, etb_ffn_fold=False, mhca_ffn_fold=False,
         mhca_block_fold=False),
    dict(use_pallas=False, mhca_block_fold=False),
)


def iter_kernel_fallbacks(cfg):
    """Yield (config, overrides) down the kernel-fallback ladder."""
    for over in KERNEL_FALLBACK_OVERRIDES:
        yield (dataclasses.replace(cfg, **over) if over else cfg), over
