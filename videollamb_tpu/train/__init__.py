from videollamb_tpu.train.step import (  # noqa: F401
    TrainState,
    create_optimizer,
    create_train_state,
    make_train_step,
)
