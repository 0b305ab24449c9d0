from ddpm_image_restoration_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    state_shardings,
    shard_train_step,
)
