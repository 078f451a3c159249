from .loop import main_function  # noqa: F401
from .schedules import get_learning_rate_schedules  # noqa: F401
from .step import (  # noqa: F401
    TrainConfig, TrainState, init_train_state, train_epoch, train_step,
    train_step_batch,
)
