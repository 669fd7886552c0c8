from transeditor_tpu.ops.act import fused_leaky_relu
from transeditor_tpu.ops.resample import (
    blur,
    downsample_2d,
    make_resample_kernel,
    upfirdn2d,
    upsample_2d,
)
from transeditor_tpu.ops.modconv import modulated_conv2d
