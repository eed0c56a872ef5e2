"""Pallas TPU kernels for the hot ops."""

from skyhdr.ops.pallas.deform_conv import (  # noqa: F401
    deformable_conv2d_pallas,
    pallas_supported,
)
