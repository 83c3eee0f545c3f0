from prifit_tpu.train.schedules import (
    lr_schedule,
    bn_momentum_schedule,
    lambda_schedule,
)
from prifit_tpu.train.state import TrainState, create_train_state
from prifit_tpu.train.steps import make_supervised_step, make_selfsup_step
from prifit_tpu.train.checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "lr_schedule",
    "bn_momentum_schedule",
    "lambda_schedule",
    "TrainState",
    "create_train_state",
    "make_supervised_step",
    "make_selfsup_step",
    "save_checkpoint",
    "restore_checkpoint",
]
