from transeditor_tpu.nn.layers import (
    EqualConv2d,
    EqualLinear,
    ModulatedConv2d,
    StyledConv,
    ToRGB,
    TokenMapping,
    layer_norm_tokens,
    pixel_norm,
)
from transeditor_tpu.nn.attention import Attention, AttentionBlock
