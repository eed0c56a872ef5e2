"""Training engine (the reference's L5, SURVEY.md §1)."""

from skyhdr.train.losses import kl_divergence, lsgan_gen_loss, lsgan_disc_loss  # noqa: F401
from skyhdr.train.engine import (  # noqa: F401
    GanState,
    SunState,
    create_gan_state,
    create_sun_state,
    generator_forward,
    make_gan_train_step,
    make_gan_eval_step,
    make_sun_train_step,
    make_sun_eval_step,
    make_inference_fn,
)
