"""Training: state, optimizer/schedule, distributed train step, checkpointing."""

from tf_face_toolbox_tpu.train.state import TrainState  # noqa: F401
from tf_face_toolbox_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    create_train_state,
    make_train_step,
)
