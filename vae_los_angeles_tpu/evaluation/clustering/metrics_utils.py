"""Clustering-quality metrics (reference
``src/clustering_evaluation/metrics_utils.py:4-41``)."""

from __future__ import annotations

import numpy as np


def calculate_neighborhood_hit(features, labels, k: int = 5) -> float:
    """Neighborhood Hit: mean fraction of each point's k nearest neighbors
    (self excluded) sharing its label.

    ``EVAL_BACKEND=tpu`` (alias ``KNN_BACKEND``) routes the O(n²·dim)
    neighbor search through the chunked MXU distance kernel
    (ops/cluster_metrics.py); the default stays host sklearn,
    reference-exact."""
    from vae_los_angeles_tpu.ops.backend import tpu_eval_backend

    labels = np.asarray(labels)
    if len(features) < k + 1:
        return 0.0
    try:
        if tpu_eval_backend(len(features)):
            # features may already be a device array (cluster_scores scales
            # on device) — the TPU path consumes it without a host round-trip
            from vae_los_angeles_tpu.ops.cluster_metrics import (
                neighborhood_hit_tpu,
            )

            return neighborhood_hit_tpu(features, labels, k=k)
        features = np.asarray(features)
        from sklearn.neighbors import NearestNeighbors

        nbrs = NearestNeighbors(n_neighbors=k + 1, algorithm="auto").fit(features)
        _, indices = nbrs.kneighbors(features)
        neighbor_labels = labels[indices[:, 1:]]  # drop self
        hits = neighbor_labels == labels[:, None]
        return float(np.mean(np.mean(hits, axis=1)))
    except Exception as e:  # pragma: no cover - defensive like the reference
        print(f"Warning: Could not calculate NH ({e}).")
        return 0.0
