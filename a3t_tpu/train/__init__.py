from a3t_tpu.train.optim import OptimConfig, noam_schedule, make_optimizer
from a3t_tpu.train.train_step import TrainState, make_train_step, make_eval_step, create_train_state
from a3t_tpu.train.reporter import Reporter
from a3t_tpu.train.trainer import Trainer, TrainerConfig
from a3t_tpu.train.vocoder import (
    VocoderTrainConfig,
    load_vocoder,
    train_vocoder,
)

__all__ = [
    "OptimConfig",
    "noam_schedule",
    "make_optimizer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "create_train_state",
    "Reporter",
    "Trainer",
    "TrainerConfig",
    "VocoderTrainConfig",
    "load_vocoder",
    "train_vocoder",
]
