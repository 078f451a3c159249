from .loop import main_function  # noqa: F401
from .schedules import get_learning_rate_schedules  # noqa: F401
from .step import TrainConfig, TrainState, init_train_state, train_step  # noqa: F401
