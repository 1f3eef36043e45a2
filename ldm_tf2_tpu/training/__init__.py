"""Training steps and loops (stage-1 autoencoder, stage-2 LDM)."""

from ldm_tf2_tpu.training.ldm_trainer import (
    LDMTrainState,
    make_ldm_train_step,
)

__all__ = ["LDMTrainState", "make_ldm_train_step"]
