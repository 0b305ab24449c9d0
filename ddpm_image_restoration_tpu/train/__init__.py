from ddpm_image_restoration_tpu.train.schedules import cosine_warm_restarts  # noqa: F401
from ddpm_image_restoration_tpu.train.steps import (  # noqa: F401
    create_train_state,
    make_train_step,
)
from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from ddpm_image_restoration_tpu.train.loop import train_model  # noqa: F401
