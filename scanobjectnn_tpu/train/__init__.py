from scanobjectnn_tpu.train.schedules import (  # noqa: F401
    exponential_decay_lr,
    bn_momentum_schedule,
)
from scanobjectnn_tpu.train.trainer import Trainer, TrainerConfig, TrainState  # noqa: F401
