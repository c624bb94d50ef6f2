from raytracing_tpu.parallel.shard import (  # noqa: F401
    RAY_AXIS,
    make_device_mesh,
    make_train_step,
    render_sharded,
)
