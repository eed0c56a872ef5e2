"""Typed configuration tree shared by all entry points.

The reference spreads overlapping argparse flags and mutated module globals
across its scripts (reference train.py:531-543, train_sun.py:478-488,
inference.py:126-130, datasetGenerator.py:31-35). Here one frozen dataclass
tree carries every knob; CLI layers parse into it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture knobs (reference generator.py:52, sunpose_net.py:33)."""

    im_height: int = 32
    im_width: int = 128
    channels: int = 3
    # Encoder/decoder widths (reference generator.py:60-87).
    enc_filters: Tuple[int, int, int] = (32, 64, 128)
    num_res_blocks: int = 6
    dec_filters: Tuple[int, int] = (64, 32)
    # Distortion-aware conv: kernel size / dilation (reference
    # distortion_aware_ops.py:9,24). use_da_conv=False matches the
    # reference's *active* code path (generator.py:13-14 comments the DA
    # conv out in favor of plain conv); True enables the paper's op.
    da_kernel_size: int = 3
    dilation_rate: int = 1
    use_da_conv: bool = False
    # DA-conv execution path: 'auto' (Pallas on TPU when the shape fits
    # VMEM, XLA otherwise), 'pallas' (forced — combine with
    # pltpu.force_tpu_interpret_mode() off-TPU), or 'xla'.
    da_backend: str = "auto"
    # Width-fold tiny-output convs onto the MXU lane axis (ops/foldconv.py,
    # exact; the 7x7->3ch decoders otherwise run at 3/128 lane occupancy).
    # MUST be False when the panorama width is GSPMD-sharded together with
    # the batch: XLA's SPMD partitioner miscompiles the folded stride-F conv
    # on a (data>=2, width>=2) mesh (wrong values, verified 2026-08-19 on
    # the 8-device CPU mesh) — the parallel wrappers flip this off
    # automatically (parallel/dp.py:_mesh_cfg).
    fold_tiny_convs: bool = True
    # Fused InstanceNorm(+activation) Pallas kernel (ops/pallas/instnorm.py):
    # one HBM pass forward instead of XLA's reduce-then-normalize two reads.
    # DEFAULT OFF (measured 2026-08-19, tools/exp_instnorm.py on the real
    # TPU): the backward kernel VMEM-OOMs at AOT compile on the flagship
    # encoder level (c=32 lane-pads 4x to 128 lanes; ~8 live f32 slabs hit
    # the 16 MB scoped limit at b128) — the exact cause of BENCH_r04's
    # failed train_step_bf16_b128 stage — and the unfused XLA composition
    # already multi-output-fuses the moment pass, so no measured win
    # justifies the kernel. Opt-in for experiments; the parallel wrappers
    # force it off under GSPMD sharding regardless (parallel/dp.py:_mesh_cfg).
    fused_instance_norm: bool = False
    # Numerics: conv stacks may run bf16; the radiance path (values up to
    # 3e4, reference sunrad_net.py:69) always stays f32.
    compute_dtype: str = "float32"
    # HDR mu-law valid dynamic range (reference tf_utils.py:263).
    valid_dr: float = 10.0
    # Alpha-blend threshold on linear sky prediction (reference train.py:247).
    alpha_threshold: float = 0.12
    # Sun-radiance Dirac-delta clip (reference sunrad_net.py:69).
    sun_rad_clip: float = 30000.0
    # vMF concentration for the sun-pose ground truth (reference train.py:42).
    vmf_kappa: float = 80.0

    @property
    def imshape(self) -> Tuple[int, int, int]:
        return (self.im_height, self.im_width, self.channels)

    @property
    def num_bins(self) -> int:
        return self.im_height * self.im_width


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset + degradation pipeline (reference train.py:54-133)."""

    dataset_dir: str = "dataset_128_32/tfrecord"
    batch_size: int = 32
    shuffle_buffer: int = 10000
    # Exposure sweep 2**linspace(-3,3) (reference utils.py:86-91).
    n_train_exposures: int = 600
    n_test_exposures: int = 7
    # DoRF camera response curves: first 175 train / rest test
    # (reference utils.py:105-116).
    dorf_path: Optional[str] = None
    # JPEG-simulation quality ramp lo..hi across the batch
    # (reference train.py:89: i/(b-1)*10+90).
    jpeg_quality_lo: float = 90.0
    jpeg_quality_hi: float = 100.0
    jpeg_chroma_subsample: bool = True
    # Noise model (reference train.py:67-69).
    sigma_s_scale: float = 0.08 / 6.0
    sigma_c_scale: float = 0.005
    # Laval extraction: first N images -> train split
    # (reference DataGeneration/loadLavalSkyDB.py:68).
    train_split_count: int = 30000
    img_bias: float = 0.00955794  # reference datasetGenerator.py:13


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization + orchestration (reference train.py:29-36,201-202)."""

    learning_rate: float = 1e-4
    epochs: int = 1000
    # Loss weights (reference train.py:331).
    w_sun: float = 1.0
    w_dog: float = 1000.0
    w_adv: float = 1.0
    w_l1: float = 10.0
    w_perceptual: float = 0.01
    # Checkpointing (reference train.py:215,516; tf_utils.py:313).
    ckpt_every_epochs: int = 10
    ckpt_max_to_keep: int = 5
    checkpoint_dir: str = "checkpoints"
    tensorboard_dir: str = "tensorboard"
    vgg_path: Optional[str] = None
    seed: int = 0
    # Optimizer-moment storage dtype. 'bfloat16' halves the optimizer slice
    # of HBM residency and checkpoint bytes (RMSprop nu at 64x256: 3.3 ->
    # 1.65 GB; sun-pretrain Adam mu+nu: 6.4 -> 3.2 GB — the reference's own
    # h*w-wide sunpose FCs, sunpose_net.py:36, dominate both) and the
    # per-step moment streaming at rest. Update math still runs in f32, so
    # only the at-rest quantization (bf16 has ~3 significant digits) differs
    # from the f32 path; measured perf-NEUTRAL per step at 64x256 b32 —
    # this is a residency/checkpoint-bytes knob, not a speed knob
    # (BASELINE.md "bf16 optimizer state ... perf-NEUTRAL"). One-step
    # agreement with f32 is bounded in tests/test_opt_state_dtype.py;
    # end-to-end quality at 64x256 (with grad_dtype=bf16 too) measured
    # -1.30 dB PSNR vs f32 state on a single 60-epoch run (BASELINE.md
    # quality table).
    opt_state_dtype: str = "float32"
    # Stored MODEL-parameter dtype for training (VERDICT r4 item 7).
    # 'bfloat16' stores the params the forward/backward actually stream at
    # bf16 (at 64x256 the 3.2 GB sunpose FCs, reference sunpose_net.py:36,
    # dominate) while the optimizer keeps an f32 MASTER copy in its state
    # (engine._with_param_master): updates accumulate in f32, the stored
    # params are re-derived as round_bf16(master) each step, so no update
    # stagnates in the 2^-8 bf16 mantissa. NB grads w.r.t. bf16 leaves
    # arrive bf16-rounded regardless of grad_dtype (the dtype-cast's vjp)
    # — the same <=2^-8 relative band grad_dtype='bfloat16' carries.
    # Net HBM residency is ~unchanged
    # (bf16 params + f32 master ~= f32 params); the lever is per-step
    # parameter/gradient STREAMING, not residency. Perf on the real TPU:
    # see BASELINE.md (measured this round); one-step agreement with the
    # f32 path is bounded in tests/test_param_dtype.py.
    param_dtype: str = "float32"
    # Gradient staging dtype. 'bfloat16' casts the loss gradients before the
    # optimizer update (the bf16 exponent range matches f32, so no loss
    # scaling is needed; optimizer math still runs in f32). Measured
    # perf-NEUTRAL at 64x256 b32 (BASELINE.md); kept as an HBM-staging
    # knob with one-step f32 agreement bounded in
    # tests/test_opt_state_dtype.py. Orthogonal to opt_state_dtype.
    grad_dtype: str = "float32"
    # Steps executed per device dispatch (TrainLoop scans this many batches
    # in ONE jitted call; the key sequence and update order are identical to
    # the per-step path, and the epoch tail flushes per-step). Default 1:
    # measured on the tunneled v5e (tools/exp_chunk.py, 2026-08-18), chunking
    # does NOT win — the per-step path already pipelines dispatches, so only
    # per-batch transfer cost is addressable, and host-stacked chunks of 8
    # measured 39-57 ms/step vs 44-54 per-step (noise) while chunks of 16
    # REGRESSED to 68-113 ms/step (bigger synchronous host stacks stall the
    # feed). Kept as an option for runtimes where dispatch is the true
    # bottleneck.
    steps_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. New capability vs. the reference (SURVEY.md §2.3):
    data parallelism over `data`, width-sharded spatial parallelism over
    `width` with cyclic halo exchange for the 360° wraparound."""

    data_parallel: int = 1
    width_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
