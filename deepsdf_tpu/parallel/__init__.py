from .mesh import (  # noqa: F401
    data_sharded,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_train_state,
    train_state_shardings,
)
