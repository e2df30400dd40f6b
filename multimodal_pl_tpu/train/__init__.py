"""Training: state pytree, fused jit step, epoch loop, checkpointing."""

from multimodal_pl_tpu.train.state import TrainState, create_train_state, StepConfig
from multimodal_pl_tpu.train.step import make_train_step, poly_lr
