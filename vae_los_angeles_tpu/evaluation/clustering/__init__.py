"""Clustering evaluation subpackage (reference src/clustering_evaluation)."""

from vae_los_angeles_tpu.evaluation.clustering.metrics_utils import (  # noqa: F401
    calculate_neighborhood_hit,
)
