"""Primitive ops: layers, normalization, ConvRNN cells, CDNA/DNA/flow kernels.

TPU-native counterpart of the reference's ``video_prediction/ops.py``,
``rnn_ops.py`` and ``flow_ops.py``. Everything is NHWC, pure-functional, and
XLA-friendly (static shapes, no data-dependent Python control flow).
"""

from video_prediction_tpu.ops.layers import (  # noqa: F401
    Dense,
    Conv2D,
    Conv3D,
    ConvTranspose2D,
    UpsampleConv2D,
    ConvPool2D,
    Local2D,
    SeparableLocal2D,
    local2d_apply,
    separable_local2d_apply,
    lrelu,
    pool2d,
    upsample2d,
    get_norm_layer,
    get_activation,
    get_upsample_layer,
    get_downsample_layer,
)
from video_prediction_tpu.ops.spectral import SpectralDense, SpectralConv2D, SpectralConv3D, spectral_normalize  # noqa: F401
from video_prediction_tpu.ops.rnn import ConvLSTMCell, ConvGRUCell  # noqa: F401
from video_prediction_tpu.ops.cdna import (  # noqa: F401
    apply_cdna_kernels,
    apply_dna_kernels,
    identity_kernel,
    normalize_kernels,
)
from video_prediction_tpu.ops.warp import (  # noqa: F401
    apply_affine_kernels,
    bilinear_sample,
    flow_to_warp_grid,
    image_warp,
)
