from occnet_tpu.training.train import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_lr_schedule,
)
