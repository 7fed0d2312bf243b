from transception_tpu.ops.common import (  # noqa: F401
    DWConv,
    MixFFN,
    MixFFNSkip,
    MLPFFN,
    OverlapPatchEmbed,
    PatchExpand,
    FinalPatchExpandX4,
    ConvPosEnc,
    make_ffn,
)
from transception_tpu.ops.conv import (  # noqa: F401
    Conv2dBN,
    DWConv2dBN,
    DWCPatchEmbed,
    PatchEmbedStage,
    ResBlock,
)
from transception_tpu.ops.attention import (  # noqa: F401
    efficient_linear_attention,
    factorized_attention,
    EfficientAttention,
    EfficientTransformerBlock,
    ConvRelPosEnc,
    FactorAttConvRelPosEnc,
    MHCAEncoder,
)
from transception_tpu.ops.fusion import (  # noqa: F401
    CoordAtt,
    SEBlock,
    SKBlock,
    CBAMBlock,
    CBAMBlockCasa,
    CAMModule,
    CAMFactorizedModule,
    Conv3dBNConcat,
    Conv3dBNChannelAttentionConcat,
)
