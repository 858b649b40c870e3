"""Parity tests for the MXU clustering metrics (ops/cluster_metrics.py)
against live sklearn oracles — silhouette and neighborhood hit, the scores
the clustering scripts report (reference
src/clustering_evaluation/cluster_reconstructed.py:296-318,
metrics_utils.py:4-41)."""

import numpy as np
import pytest
from sklearn.metrics import silhouette_score
from sklearn.neighbors import NearestNeighbors

from vae_los_angeles_tpu.ops.cluster_metrics import (
    neighborhood_hit_tpu,
    resolve_silhouette,
    silhouette_score_tpu,
)


def _nh_oracle(features, labels, k=5):
    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(features)
    _, indices = nbrs.kneighbors(features)
    neighbor_labels = labels[indices[:, 1:]]
    return float(np.mean(neighbor_labels == labels[:, None]))


def _blobs(n, dim, n_labels, seed, spread=3.0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)) * spread
    x = (centers[labels] + rng.normal(size=(n, dim))).astype(np.float32)
    return x, labels


@pytest.mark.parametrize("n,dim,n_labels", [(60, 7, 3), (257, 33, 5),
                                            (1100, 17, 24)])
def test_silhouette_parity(n, dim, n_labels):
    x, labels = _blobs(n, dim, n_labels, seed=n)
    got = silhouette_score_tpu(x, labels, chunk_size=128)
    want = silhouette_score(x, labels)
    assert got == pytest.approx(want, abs=2e-5)


def test_silhouette_singleton_cluster():
    """A one-member cluster scores 0 for that sample (sklearn convention)."""
    x, labels = _blobs(50, 5, 3, seed=1)
    labels = labels.copy()
    labels[7] = 99  # singleton
    got = silhouette_score_tpu(x, labels)
    want = silhouette_score(x, labels)
    assert got == pytest.approx(want, abs=2e-5)


def test_silhouette_noncontiguous_string_labels():
    x, labels = _blobs(80, 6, 4, seed=3)
    names = np.array(["Lung", "Breast", "Kidney", "Brain"])[labels]
    got = silhouette_score_tpu(x, names)
    want = silhouette_score(x, names)
    assert got == pytest.approx(want, abs=2e-5)


def test_silhouette_rejects_single_label():
    x, _ = _blobs(20, 4, 2, seed=4)
    with pytest.raises(ValueError):
        silhouette_score_tpu(x, np.zeros(20, np.int64))


@pytest.mark.parametrize("n,dim,k", [(40, 6, 5), (300, 21, 5), (513, 9, 11)])
def test_nh_parity(n, dim, k):
    x, labels = _blobs(n, dim, 4, seed=n + 1)
    got = neighborhood_hit_tpu(x, labels, k=k, chunk_size=100)
    want = _nh_oracle(x, labels, k=k)
    assert got == pytest.approx(want, abs=1e-9)


def test_nh_small_cohort_guard():
    x, labels = _blobs(4, 3, 2, seed=9)
    assert neighborhood_hit_tpu(x, labels, k=5) == 0.0


def test_metrics_utils_routes_backend(monkeypatch):
    """calculate_neighborhood_hit honors KNN_BACKEND=tpu and matches the
    sklearn path it replaces."""
    from vae_los_angeles_tpu.evaluation.clustering.metrics_utils import (
        calculate_neighborhood_hit,
    )

    x, labels = _blobs(120, 8, 3, seed=12)
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    want = calculate_neighborhood_hit(x, labels)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    got = calculate_neighborhood_hit(x, labels)
    assert got == pytest.approx(want, abs=1e-9)


def test_cluster_scores_tpu_backend(monkeypatch):
    """cluster_scores runs end-to-end on the TPU backend and matches the
    sklearn scores (identical math, different executor)."""
    from vae_los_angeles_tpu.evaluation.clustering.common import cluster_scores

    x, labels = _blobs(90, 60, 4, seed=21)
    rng = np.random.default_rng(0)
    pca2 = rng.normal(size=(90, 2)).astype(np.float32)
    tsne2 = rng.normal(size=(90, 2)).astype(np.float32)
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    want = cluster_scores(x, labels, pca2, tsne2)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    got = cluster_scores(x, labels, pca2, tsne2)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=5e-5), key


def test_resolve_silhouette(monkeypatch):
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    assert resolve_silhouette() is silhouette_score_tpu
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    assert resolve_silhouette() is silhouette_score
    monkeypatch.setenv("KNN_BACKEND", "bogus")
    with pytest.raises(ValueError):
        resolve_silhouette()
