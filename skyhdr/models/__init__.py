"""Flax model zoo (the reference's L4, SURVEY.md §1)."""

from skyhdr.models.generator import Generator, ResBlock  # noqa: F401
from skyhdr.models.discriminator import Discriminator  # noqa: F401
from skyhdr.models.sunpose import SunPoseNet  # noqa: F401
from skyhdr.models.sunrad import SunRadNet  # noqa: F401
from skyhdr.models.gradcam import sunpose_with_cams  # noqa: F401
from skyhdr.models.vgg16 import (  # noqa: F401
    load_vgg16_npy,
    random_vgg16_weights,
    vgg16_features,
    perceptual_l1,
)
