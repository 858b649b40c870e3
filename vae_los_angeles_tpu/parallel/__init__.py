"""Parallelism layer: device mesh + shardings (SPMD over ICI) and vmapped
fold/trial populations."""

from vae_los_angeles_tpu.parallel.sharding import (  # noqa: F401
    data_sharding,
    make_mesh,
    make_sharded_train_state,
    param_specs,
    shard_arrays,
    shard_params,
    sharded_train_step,
)
from vae_los_angeles_tpu.parallel.vmap_meta import fit_folds, fit_trials  # noqa: F401
