"""Training harness: losses, jit-compiled steps, checkpointing."""

from rnr_tpu.train.losses import (
    image_l1_loss,
    lighting_loss,
    albedo_prior_loss,
)
from rnr_tpu.train.steps import (
    TrainState,
    create_rnr_state,
    make_rnr_train_step,
    make_rnr_eval_step,
    create_dnr_state,
    make_dnr_train_step,
    make_dnr_eval_step,
)
from rnr_tpu.train.checkpoint import save_checkpoint, load_checkpoint
