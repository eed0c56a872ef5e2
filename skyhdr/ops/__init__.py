"""Pure-JAX numeric ops: the TPU-native equivalent of the reference's
tf_utils.py / ops.py / distortion_aware_ops.py layer (SURVEY.md L2/L3)."""

from skyhdr.ops.geometry import (  # noqa: F401
    sphere2world,
    sunpose_bins,
    vmf_pdf,
)
from skyhdr.ops.hdr import (  # noqa: F401
    hdr_log_compression,
    hdr_log_decompression,
    rgb2gray,
    rgb2bgr,
    bgr2rgb,
)
from skyhdr.ops.crf import apply_rf, interp1d_batched  # noqa: F401
from skyhdr.ops.dog import dog_pyramid, gaussian_filter2d  # noqa: F401
from skyhdr.ops.emd import wasserstein_1d, compare_luminance  # noqa: F401
from skyhdr.ops.resize import resize_bilinear  # noqa: F401
from skyhdr.ops.jpeg import jpeg_simulate, quant_table  # noqa: F401
from skyhdr.ops.distortion import (  # noqa: F401
    DAConv,
    DADeconv,
    deformable_conv2d,
    distortion_offsets,
    gather_tables,
)
from skyhdr.ops.geometry import positional_encoding  # noqa: F401
from skyhdr.ops.crf import apply_rf_chebyshev, chebyshev_fit  # noqa: F401
from skyhdr.ops.dog import dog_l1_loss  # noqa: F401
