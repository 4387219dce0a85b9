from sinnerf_tpu.train.loop import SinNeRFTrainer, build_render_settings
from sinnerf_tpu.train.optimizers import (
    get_learning_rate,
    get_optimizer,
    lr_for_epoch,
    set_lr,
)
from sinnerf_tpu.train.step import TrainConfig, TrainState, train_step

__all__ = [
    "SinNeRFTrainer",
    "build_render_settings",
    "get_learning_rate",
    "get_optimizer",
    "lr_for_epoch",
    "set_lr",
    "TrainConfig",
    "TrainState",
    "train_step",
]
