"""skyhdr — TPU-native HDR sky-panorama reconstruction framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
TF2 codebase "HDR-Map-Reconstruction-From-a-Single-LDR-Sky-Panoramic-Image-
For-Outdoor-Illumination-Estimation" (see /root/reference): it reconstructs an
HDR radiance map from a single LDR sky-dome panorama by treating the sun and
sky separately — a sun-pose classifier + Grad-CAM attention + analytic
Dirac-delta sun-radiance head reconstruct the sun peak, while an
encoder/decoder GAN reconstructs the sky dome; the two are alpha-blended.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  skyhdr.ops       — pure-JAX numerics: sphere geometry, vMF ground truth,
                     mu-law HDR log compression, DoG pyramid, CRF application,
                     EMD metric, distortion-aware (deformable equirectangular)
                     convolution, on-device JPEG simulation.
  skyhdr.models    — Flax modules: Generator, PatchGAN discriminator,
                     SunPoseNet, SunRadNet, frozen VGG16, Grad-CAM.
  skyhdr.data      — TFRecord-compatible codec (TF-free), Laval Sky DB
                     extraction, host input pipeline, LDR degradation model.
  skyhdr.train     — losses, jitted train/eval steps, optimizers, Orbax
                     checkpoints, metrics, TensorBoard event writer.
  skyhdr.parallel  — device mesh, data-parallel and width-sharded spatial
                     parallelism with cyclic halo exchange (360° wraparound).
  skyhdr.cli       — entry points mirroring the reference scripts.
"""

__version__ = "0.1.0"

from skyhdr.config import Config, ModelConfig, TrainConfig, DataConfig  # noqa: F401
