from eabnet_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from eabnet_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
