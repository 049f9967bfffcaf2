from core_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, render_sharded, train_step_sharded,
)
