"""Jitted train/eval steps for the GAN stage and the sun-pose pretrain stage.

Orchestration parity with reference train.py / train_sun.py, with the three
TPU-first deviations SURVEY.md §7 prescribes:
  1. the LDR degradation runs inside the jitted step (no host py_function);
  2. the vMF ground truth expands on device from the elevation scalar;
  3. RNG is one threaded jax.random key.

Update topology preserved exactly (train.py:382-415):
  * ONE RMSprop update over generator+sun variables jointly from the total
    generator loss (the pretrained sun net is fine-tuned, train.py:402-403);
  * a separate RMSprop update for the discriminator;
  * the generator's adversarial term uses a disc forward with FROZEN
    BatchNorm statistics (training=False, train.py:302), while the disc
    update uses batch statistics and refreshes the running averages on both
    its real and fake forwards (train.py:360-361).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import unfreeze

from skyhdr.config import Config
from skyhdr.data.degradation import DegradationBanks, degrade_batch
from skyhdr.models.discriminator import Discriminator
from skyhdr.models.generator import Generator
from skyhdr.models.gradcam import sunpose_with_cams
from skyhdr.models.sunpose import SunPoseNet
from skyhdr.models.vgg16 import perceptual_l1
from skyhdr.ops.dog import dog_l1_loss
from skyhdr.ops.geometry import sunpose_bins, vmf_pdf
from skyhdr.ops.hdr import hdr_log_compression, hdr_log_decompression
from skyhdr.train import losses


class GanState(struct.PyTreeNode):
    """SKY-stage state: generator + sun (jointly optimized) + discriminator.

    Mirrors the reference's composite checkpoint contents
    (train.py:208-215: epoch, gen/dis models, both optimizers; plus the SUN
    checkpoint restored into the same process, train.py:223-230)."""

    gen_vars: Any          # {'params', 'batch_stats'} (BN in SunRadNet)
    sun_vars: Any          # {'params'}
    disc_vars: Any         # {'params', 'batch_stats'}
    opt_gen: optax.OptState
    opt_disc: optax.OptState
    step: jnp.ndarray
    epoch: jnp.ndarray


class SunState(struct.PyTreeNode):
    """SUN-pretrain state (reference tf_utils.py:308-311)."""

    sun_vars: Any
    opt: optax.OptState
    step: jnp.ndarray
    epoch: jnp.ndarray


def _cast_floating(tree, dtype):
    """Cast every floating leaf of an optax state tree; ints (step counts)
    pass through."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def _with_state_dtype(tx: optax.GradientTransformation,
                      dtype: str) -> optax.GradientTransformation:
    """Store optimizer moments at `dtype` while computing updates in f32.

    The upcast/downcast converts fuse into the optimizer's elementwise HLO,
    so the HBM traffic for the moments is at the narrow dtype — at 64x256
    the RMSprop nu alone is 3.3 GB f32 (TrainConfig.opt_state_dtype)."""
    if dtype in (None, "float32"):
        return tx
    store = jnp.dtype(dtype)

    def init(params):
        return _cast_floating(tx.init(params), store)

    def update(updates, state, params=None):
        new_updates, new_state = tx.update(
            updates, _cast_floating(state, jnp.float32), params)
        return new_updates, _cast_floating(new_state, store)

    return optax.GradientTransformation(init, update)


class MasterParamsState(NamedTuple):
    """Optimizer state for `_with_param_master`: the wrapped transform's
    state plus the f32 master copy of the (bf16-stored) model params."""

    inner: Any
    master: Any


def _with_param_master(tx: optax.GradientTransformation,
                       param_dtype: str) -> optax.GradientTransformation:
    """Mixed-precision parameter storage (TrainConfig.param_dtype).

    The MODEL params live at `param_dtype` (what the forward/backward
    streams from HBM — at 64x256 the 3.2 GB sunpose FCs, reference
    sunpose_net.py:36); the optimizer keeps an f32 MASTER in its state.
    Each step: upcast grads -> inner update on the master -> new params =
    round_bf16(new master). The emitted update is constructed so that
    `optax.apply_updates(params_bf16, update)` lands EXACTLY on
    round_bf16(master): both operands of the f32 subtraction/addition are
    bf16-representable, so the arithmetic is exact (tests/test_param_dtype).

    `init` must receive the f32 params (create_*_state calls it before
    casting the stored copy) so the master starts at full precision.
    `update` requires `params` (the stored narrow copy).
    """
    if param_dtype in (None, "float32"):
        return tx
    store = jnp.dtype(param_dtype)

    def init(params):
        master = _cast_floating(params, jnp.float32)
        return MasterParamsState(inner=tx.init(master), master=master)

    def update(updates, state, params=None):
        assert params is not None, "param_dtype!=f32 requires params in update"
        u32 = _cast_floating(updates, jnp.float32)
        inner_u, new_inner = tx.update(u32, state.inner, state.master)
        new_master = optax.apply_updates(state.master, inner_u)

        def emit(m, p):
            if not jnp.issubdtype(p.dtype, jnp.floating):
                return jnp.zeros_like(p)
            return m.astype(store).astype(jnp.float32) - p.astype(jnp.float32)

        emitted = jax.tree_util.tree_map(emit, new_master, params)
        return emitted, MasterParamsState(inner=new_inner, master=new_master)

    return optax.GradientTransformation(init, update)


def _rmsprop(lr: float, state_dtype: str = "float32",
             param_dtype: str = "float32") -> optax.GradientTransformation:
    # Keras RMSprop defaults (train.py:201-202): rho=0.9, eps=1e-7.
    return _with_param_master(
        _with_state_dtype(optax.rmsprop(lr, decay=0.9, eps=1e-7), state_dtype),
        param_dtype)


def _adam(lr: float, state_dtype: str = "float32",
          param_dtype: str = "float32") -> optax.GradientTransformation:
    # Keras Adam defaults (tf_utils.py:324).
    return _with_param_master(
        _with_state_dtype(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-7),
                          state_dtype),
        param_dtype)


def _store_params(tree, param_dtype: str):
    """Cast a `params` collection to the stored dtype (never batch_stats)."""
    if param_dtype in (None, "float32"):
        return tree
    return _cast_floating(tree, jnp.dtype(param_dtype))


def build_models(cfg: Config):
    gen = Generator(cfg.model)
    sun = SunPoseNet(cfg.model)
    disc = Discriminator()
    return gen, sun, disc


def create_gan_state(cfg: Config, rng) -> GanState:
    gen, sun, disc = build_models(cfg)
    h, w, c = cfg.model.imshape
    b = cfg.data.batch_size

    # The whole init runs as ONE jitted executable: an eager flax .init
    # dispatches every parameter fill separately, which costs ~60 s of
    # relay round-trips on the tunneled TPU (measured 2026-08-19) — a
    # startup tax on every CLI and bench stage. Under jax.eval_shape (the
    # host-restore template path, cli/common.py) the jit traces abstractly
    # and allocates nothing.
    def init(rng):
        x = jnp.zeros((b, h, w, c), jnp.float32)
        k1, k2, k3 = jax.random.split(rng, 3)
        gen_vars = unfreeze(gen.init(k1, x))
        sun_vars = unfreeze(sun.init(k2, x))
        disc_vars = unfreeze(disc.init(k3, x, x, train=False))
        # Optimizer init sees the f32 params (the f32 master snapshots them);
        # the STORED copy is cast to param_dtype afterwards.
        opt_gen = _rmsprop(cfg.train.learning_rate,
                           cfg.train.opt_state_dtype,
                           cfg.train.param_dtype).init(
            (gen_vars["params"], sun_vars["params"])
        )
        opt_disc = _rmsprop(cfg.train.learning_rate,
                            cfg.train.opt_state_dtype,
                            cfg.train.param_dtype).init(disc_vars["params"])
        pd = cfg.train.param_dtype
        gen_vars["params"] = _store_params(gen_vars["params"], pd)
        sun_vars["params"] = _store_params(sun_vars["params"], pd)
        disc_vars["params"] = _store_params(disc_vars["params"], pd)
        return GanState(
            gen_vars=gen_vars, sun_vars=sun_vars, disc_vars=disc_vars,
            opt_gen=opt_gen, opt_disc=opt_disc,
            step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
        )

    return jax.jit(init)(rng)


def create_sun_state(cfg: Config, rng) -> SunState:
    sun = SunPoseNet(cfg.model)
    h, w, c = cfg.model.imshape
    b = cfg.data.batch_size

    def init(rng):
        x = jnp.zeros((b, h, w, c), jnp.float32)
        sun_vars = unfreeze(sun.init(rng, x))
        opt = _adam(cfg.train.learning_rate,
                    cfg.train.opt_state_dtype,
                    cfg.train.param_dtype).init(sun_vars["params"])
        sun_vars["params"] = _store_params(sun_vars["params"],
                                           cfg.train.param_dtype)
        return SunState(sun_vars=sun_vars, opt=opt,
                        step=jnp.zeros((), jnp.int32),
                        epoch=jnp.zeros((), jnp.int32))

    return jax.jit(init)(rng)


def replace_sun_params(cfg: Config, state: GanState, sun_params) -> GanState:
    """SUN->GAN weight handoff (reference train.py:223-230) that keeps the
    stored-param dtype AND the optimizer's f32 master consistent.

    `sun_params` is the f32 tree restored from the SUN checkpoint. Under
    param_dtype=bfloat16 the GanState stores bf16 params while opt_gen's
    MasterParamsState carries the f32 master for (gen, sun) — replacing only
    the stored copy would leave the master at the fresh init and the first
    update would silently revert the handoff."""
    pd = cfg.train.param_dtype
    sun_f32 = _cast_floating(sun_params, jnp.float32)
    state = state.replace(
        sun_vars={"params": _store_params(sun_f32, pd)})
    if pd not in (None, "float32"):
        opt = state.opt_gen
        assert isinstance(opt, MasterParamsState)
        gen_master, _ = opt.master
        state = state.replace(opt_gen=MasterParamsState(
            inner=opt.inner, master=(gen_master, sun_f32)))
    return state


def _degrade(cfg: Config, banks: DegradationBanks, key, hdr):
    """Single point applying DataConfig's degradation knobs — train, eval and
    sun steps must all draw from the same input distribution (a round-1
    review found eval/sun steps silently dropping sigma_{s,c}_scale)."""
    return degrade_batch(
        key, hdr, banks,
        jpeg_lo=cfg.data.jpeg_quality_lo, jpeg_hi=cfg.data.jpeg_quality_hi,
        sigma_s_scale=cfg.data.sigma_s_scale,
        sigma_c_scale=cfg.data.sigma_c_scale,
        chroma_subsample=cfg.data.jpeg_chroma_subsample,
    )


def _sunpose_gt_from_elevation(cfg: Config, elevation):
    """vMF GT on device; azimuth pinned to the center column
    (train.py:32,112: loadLavalSkyDB rolled the sun there)."""
    h, w = cfg.model.im_height, cfg.model.im_width
    azimuth = w * 0.5 - 1.0
    bins = sunpose_bins(h, w)
    return vmf_pdf(jnp.full_like(elevation, azimuth), elevation, h, w,
                   kappa=cfg.model.vmf_kappa, bins=bins)


def generator_forward(cfg: Config, gen: Generator, sun: SunPoseNet,
                      disc: Discriminator, gen_vars, sun_vars, disc_vars,
                      ldr, hdr_t, sunpose_gt, vgg_weights, train: bool):
    """The full generator-side graph + losses (reference train.py:239-349,
    generator_in_step). Returns (total_gen_loss, aux dict)."""
    thr = cfg.model.alpha_threshold
    vdr = cfg.model.valid_dr

    hdr_t_gamma = hdr_log_compression(hdr_t, vdr)

    gen_params = {"params": gen_vars["params"],
                  "batch_stats": gen_vars["batch_stats"]}

    res_out = gen.apply(gen_params, ldr, method=Generator.encode)
    sky_pred_gamma = gen.apply(gen_params, res_out, ldr,
                               method=Generator.sky_decode)
    sky_pred_lin = hdr_log_decompression(sky_pred_gamma, vdr)

    # Sun pose + Grad-CAM attention (train.py:253-271). CAMs and alpha are
    # gradient-stopped like the reference's stop_recording block.
    sun_apply = lambda v, x, eps: sun.apply(v, x, eps)
    sm, (cam1, cam2, cam3) = sunpose_with_cams(sun_apply, sun_vars, ldr,
                                               sunpose_gt)
    h, w = cfg.model.im_height, cfg.model.im_width
    sunpose_pred = sm.reshape(-1, h, w, 1)

    alpha = jnp.max(sky_pred_lin, axis=3)
    alpha = jnp.minimum(1.0, jnp.maximum(0.0, alpha - 1.0 + thr) / thr)
    alpha_c3 = jax.lax.stop_gradient(
        jnp.broadcast_to(alpha[..., None], sky_pred_lin.shape)
    )

    # Sun radiance + sun decode (train.py:288-290). SunRadNet's BatchNorm
    # refreshes running stats in training.
    if train:
        (sun_rad_lin, gamma, beta), gen_mut = gen.apply(
            gen_params, ldr, cam1, cam2, cam3, sunpose_pred, True,
            method=Generator.sun_rad_estimation, mutable=["batch_stats"],
        )
        new_gen_batch_stats = gen_mut["batch_stats"]
    else:
        sun_rad_lin, gamma, beta = gen.apply(
            gen_params, ldr, cam1, cam2, cam3, sunpose_pred, False,
            method=Generator.sun_rad_estimation,
        )
        new_gen_batch_stats = gen_vars["batch_stats"]

    sun_rad_gamma = hdr_log_compression(sun_rad_lin, vdr)
    sun_pred_gamma = gen.apply(gen_params, res_out, sun_rad_gamma,
                               method=Generator.sun_decode)

    # Alpha blend in gamma domain (train.py:293-299).
    sky_pred_gamma = (1.0 - alpha_c3) * sky_pred_gamma
    sky_pred_lin = hdr_log_decompression(sky_pred_gamma, vdr)
    sun_pred_gamma = alpha_c3 * sun_pred_gamma
    sun_pred_lin = hdr_log_decompression(sun_pred_gamma, vdr)
    y_final_gamma = gen.apply(gen_params, sky_pred_gamma, sun_pred_gamma,
                              method=Generator.blending)
    y_final_lin = hdr_log_decompression(y_final_gamma, vdr)

    # Adversarial forward with frozen disc BN stats (train.py:302).
    disc_generated = disc.apply(
        {"params": disc_vars["params"], "batch_stats": disc_vars["batch_stats"]},
        ldr, y_final_lin, train=False,
    )

    # Losses (train.py:304-331).
    sun_loss = losses.kl_divergence(sunpose_gt, sm)
    # Frozen backbone follows the conv-stack compute dtype: bf16 halves the
    # VGG slice of the step (6 of 28 ms at 32x128 b128 bf16, profiler
    # 2026-08-19) and only feeds an L1 loss; f32 compute stays bit-identical.
    vgg_dt = (jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16"
              else jnp.float32)
    perceptual = perceptual_l1(vgg_weights, y_final_gamma, hdr_t_gamma,
                               dtype=vgg_dt)
    dog = dog_l1_loss(y_final_lin, hdr_t)
    l1 = losses.l1_loss(y_final_lin, hdr_t)
    adv = losses.lsgan_gen_loss(disc_generated)
    total = (cfg.train.w_sun * sun_loss + cfg.train.w_dog * dog
             + cfg.train.w_adv * adv + cfg.train.w_l1 * l1
             + cfg.train.w_perceptual * perceptual)

    aux = {
        "y_final_gamma": y_final_gamma,
        "y_final_lin": y_final_lin,
        "sky_pred_lin": sky_pred_lin,
        "sun_pred_lin": sun_pred_lin,
        "alpha_c3": alpha_c3,
        "sunpose_pred": sunpose_pred,
        "cams": (cam1, cam2, cam3),
        "sun_rad_lin": sun_rad_lin,
        "gamma_max": jnp.max(gamma),
        "beta_max": jnp.max(beta),
        "new_gen_batch_stats": new_gen_batch_stats,
        "losses": {
            "gen_total": total, "l1": l1, "kl": sun_loss, "dog": dog,
            "adv": adv, "perceptual": perceptual,
        },
    }
    return total, aux


def make_gan_train_step(cfg: Config, banks: DegradationBanks, vgg_weights,
                        jit: bool = True):
    """Build the jitted SKY train step: batch {hdr, elevation} + key ->
    (new_state, metrics). Degradation, vMF GT, both model updates and the
    BN-stat refreshes all live in one compiled graph. jit=False returns the
    raw python step for callers that re-jit with explicit shardings
    (skyhdr.parallel.dp)."""
    gen, sun, disc = build_models(cfg)
    tx_gen = _rmsprop(cfg.train.learning_rate, cfg.train.opt_state_dtype,
                      cfg.train.param_dtype)
    tx_disc = _rmsprop(cfg.train.learning_rate, cfg.train.opt_state_dtype,
                       cfg.train.param_dtype)
    # bf16 gradient staging (TrainConfig.grad_dtype): the cast fuses into
    # the gradient producers, halving the param-sized dW HBM writes/reads.
    grad_store = (None if cfg.train.grad_dtype in (None, "float32")
                  else jnp.dtype(cfg.train.grad_dtype))

    def step(state: GanState, batch, key):
        sunpose_gt = _sunpose_gt_from_elevation(cfg, batch["elevation"])
        hdr_t, ldr = _degrade(cfg, banks, key, batch["hdr"])

        def gen_loss_fn(trainable):
            gen_p, sun_p = trainable
            gv = {"params": gen_p, "batch_stats": state.gen_vars["batch_stats"]}
            sv = {"params": sun_p}
            total, aux = generator_forward(
                cfg, gen, sun, disc, gv, sv, state.disc_vars,
                ldr, hdr_t, sunpose_gt, vgg_weights, train=True,
            )
            return total, aux

        (gen_total, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            (state.gen_vars["params"], state.sun_vars["params"])
        )
        if grad_store is not None:
            grads = _cast_floating(grads, grad_store)
        updates, new_opt_gen = tx_gen.update(
            grads, state.opt_gen,
            (state.gen_vars["params"], state.sun_vars["params"]))
        new_gen_p, new_sun_p = optax.apply_updates(
            (state.gen_vars["params"], state.sun_vars["params"]), updates
        )

        y_final_lin = jax.lax.stop_gradient(aux["y_final_lin"])

        def disc_loss_fn(disc_p):
            dv = {"params": disc_p, "batch_stats": state.disc_vars["batch_stats"]}
            real, mut = disc.apply(dv, ldr, hdr_t, train=True,
                                   mutable=["batch_stats"])
            dv2 = {"params": disc_p, "batch_stats": mut["batch_stats"]}
            generated, mut2 = disc.apply(dv2, ldr, y_final_lin, train=True,
                                         mutable=["batch_stats"])
            total, real_l, gen_l = losses.lsgan_disc_loss(real, generated)
            return total, (mut2["batch_stats"], real_l, gen_l)

        (disc_total, (new_disc_bs, real_l, gen_l)), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_vars["params"])
        if grad_store is not None:
            dgrads = _cast_floating(dgrads, grad_store)
        dupdates, new_opt_disc = tx_disc.update(dgrads, state.opt_disc,
                                                state.disc_vars["params"])
        new_disc_p = optax.apply_updates(state.disc_vars["params"], dupdates)

        new_state = state.replace(
            gen_vars={"params": new_gen_p,
                      "batch_stats": aux["new_gen_batch_stats"]},
            sun_vars={"params": new_sun_p},
            disc_vars={"params": new_disc_p, "batch_stats": new_disc_bs},
            opt_gen=new_opt_gen, opt_disc=new_opt_disc,
            step=state.step + 1,
        )
        metrics = dict(aux["losses"])
        metrics.update(disc_total=disc_total, disc_real=real_l,
                       disc_generated=gen_l,
                       g_out=aux["gamma_max"], b_out=aux["beta_max"])
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_gan_eval_step(cfg: Config, banks: DegradationBanks, vgg_weights):
    """Test step (train.py:417-442): same losses, no updates, frozen stats."""
    gen, sun, disc = build_models(cfg)

    def step(state: GanState, batch, key):
        sunpose_gt = _sunpose_gt_from_elevation(cfg, batch["elevation"])
        hdr_t, ldr = _degrade(cfg, banks, key, batch["hdr"])
        total, aux = generator_forward(
            cfg, gen, sun, disc, state.gen_vars, state.sun_vars,
            state.disc_vars, ldr, hdr_t, sunpose_gt, vgg_weights, train=False,
        )
        dv = {"params": state.disc_vars["params"],
              "batch_stats": state.disc_vars["batch_stats"]}
        real = disc.apply(dv, ldr, hdr_t, train=False)
        generated = disc.apply(dv, ldr, aux["y_final_lin"], train=False)
        disc_total, real_l, gen_l = losses.lsgan_disc_loss(real, generated)
        metrics = dict(aux["losses"])
        metrics.update(disc_total=disc_total, disc_real=real_l,
                       disc_generated=gen_l,
                       g_out=aux["gamma_max"], b_out=aux["beta_max"])
        outputs = {k: aux[k] for k in
                   ("y_final_lin", "sky_pred_lin", "sun_pred_lin", "alpha_c3",
                    "sunpose_pred", "sun_rad_lin")}
        return metrics, outputs

    return jax.jit(step)


# ---------------------------------------------------------------------------
# SUN pretraining (reference train_sun.py:220-302)
# ---------------------------------------------------------------------------

def _sun_losses(cfg: Config, sun: SunPoseNet, sun_vars, ldr, sunpose_gt):
    sun_apply = lambda v, x, eps: sun.apply(v, x, eps)
    sm, cams = sunpose_with_cams(sun_apply, sun_vars, ldr, sunpose_gt)
    h, w = cfg.model.im_height, cfg.model.im_width
    pred_img = sm.reshape(-1, h, w, 1)
    gt_img = sunpose_gt.reshape(-1, h, w, 1)
    kl = losses.kl_divergence(sunpose_gt, sm)
    dog = dog_l1_loss(pred_img, gt_img)
    total = kl + dog  # unweighted sum (train_sun.py:258)
    return total, (kl, dog, pred_img, gt_img, cams)


def make_sun_train_step(cfg: Config, banks: DegradationBanks,
                        jit: bool = True):
    sun = SunPoseNet(cfg.model)
    tx = _adam(cfg.train.learning_rate, cfg.train.opt_state_dtype,
               cfg.train.param_dtype)
    grad_store = (None if cfg.train.grad_dtype in (None, "float32")
                  else jnp.dtype(cfg.train.grad_dtype))

    def step(state: SunState, batch, key):
        sunpose_gt = _sunpose_gt_from_elevation(cfg, batch["elevation"])
        _, ldr = _degrade(cfg, banks, key, batch["hdr"])

        def loss_fn(params):
            total, aux = _sun_losses(cfg, sun, {"params": params}, ldr,
                                     sunpose_gt)
            return total, aux

        (total, (kl, dog, pred_img, gt_img, cams)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.sun_vars["params"])
        )
        if grad_store is not None:
            grads = _cast_floating(grads, grad_store)
        updates, new_opt = tx.update(grads, state.opt,
                                     state.sun_vars["params"])
        new_params = optax.apply_updates(state.sun_vars["params"], updates)
        new_state = state.replace(sun_vars={"params": new_params},
                                  opt=new_opt, step=state.step + 1)
        metrics = {"sun_total": total, "kl": kl, "dog": dog}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_sun_eval_step(cfg: Config, banks: DegradationBanks):
    sun = SunPoseNet(cfg.model)

    def step(state: SunState, batch, key):
        sunpose_gt = _sunpose_gt_from_elevation(cfg, batch["elevation"])
        _, ldr = _degrade(cfg, banks, key, batch["hdr"])
        total, (kl, dog, pred_img, gt_img, cams) = _sun_losses(
            cfg, sun, state.sun_vars, ldr, sunpose_gt
        )
        return ({"sun_total": total, "kl": kl, "dog": dog},
                {"pred": pred_img, "gt": gt_img, "cams": cams})

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Inference (reference inference.py:81-115)
# ---------------------------------------------------------------------------

def make_inference_fn(cfg: Config, jit: bool = True):
    """LDR [b,h,w,3] in [0,1] -> HDR prediction dict. Models built ONCE and
    closed over (the reference rebuilds + restores per image,
    inference.py:50-79 — a perf bug SURVEY.md §3.3 says not to reproduce)."""
    gen, sun, disc = build_models(cfg)
    vdr = cfg.model.valid_dr
    thr = cfg.model.alpha_threshold

    def forward(gen_vars, sun_vars, ldr):
        gv = {"params": gen_vars["params"],
              "batch_stats": gen_vars["batch_stats"]}
        res_out = gen.apply(gv, ldr, method=Generator.encode)
        sky_pred_gamma = gen.apply(gv, res_out, ldr, method=Generator.sky_decode)
        sky_pred_lin = hdr_log_decompression(sky_pred_gamma, vdr)

        sun_apply = lambda v, x, eps: sun.apply(v, x, eps)
        # y_c = max probability (inference.py:98).
        sm, (cam1, cam2, cam3) = sunpose_with_cams(sun_apply, sun_vars, ldr, None)
        h, w = cfg.model.im_height, cfg.model.im_width
        sunpose_pred = sm.reshape(-1, h, w, 1)

        alpha = jnp.max(sky_pred_lin, axis=3)
        alpha = jnp.minimum(1.0, jnp.maximum(0.0, alpha - 1.0 + thr) / thr)
        alpha_c3 = jnp.broadcast_to(alpha[..., None], sky_pred_lin.shape)

        sun_rad_lin, gamma, beta = gen.apply(
            gv, ldr, cam1, cam2, cam3, sunpose_pred, False,
            method=Generator.sun_rad_estimation,
        )
        sun_rad_gamma = hdr_log_compression(sun_rad_lin, vdr)
        sun_pred_gamma = gen.apply(gv, res_out, sun_rad_gamma,
                                   method=Generator.sun_decode)

        sky_pred_gamma = (1.0 - alpha_c3) * sky_pred_gamma
        sun_pred_gamma = alpha_c3 * sun_pred_gamma
        y_final_gamma = gen.apply(gv, sky_pred_gamma, sun_pred_gamma,
                                  method=Generator.blending)
        y_final_lin = hdr_log_decompression(y_final_gamma, vdr)
        return {
            "y_final_lin": y_final_lin,
            "sky_pred_lin": hdr_log_decompression(sky_pred_gamma, vdr),
            "sun_pred_lin": hdr_log_decompression(sun_pred_gamma, vdr),
            "alpha": alpha_c3,
            "sunpose_pred": sunpose_pred,
        }

    return jax.jit(forward) if jit else forward
