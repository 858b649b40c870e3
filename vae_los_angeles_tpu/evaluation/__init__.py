"""Evaluation & benchmarking layer: evaluate CLI, imputation comparisons,
k-fold CV, HPO, kNN comparison, downstream classification, clustering."""

from vae_los_angeles_tpu.evaluation.evaluate import (  # noqa: F401
    get_run_id,
    load_model_and_data,
)
