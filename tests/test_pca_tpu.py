"""Parity tests for the TPU standardize + Gram-PCA path (ops/pca.py)
against live sklearn oracles — the reduction step of the clustering
scripts (reference cluster_reconstructed.py:140-187)."""

import numpy as np
import pytest
from sklearn.decomposition import PCA
from sklearn.preprocessing import StandardScaler

from vae_los_angeles_tpu.ops.pca import PCATPU, standardize_tpu


def _data(n, dim, seed=0, n_labels=4, spread=2.0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)) * spread
    return (centers[labels] + rng.normal(size=(n, dim))).astype(np.float32)


def _align_signs(got, want):
    """PCA columns are sign-ambiguous; align per-component before compare."""
    signs = np.sign(np.sum(got * want, axis=0))
    signs[signs == 0] = 1.0
    return got * signs[None, :]


@pytest.mark.parametrize("n,dim", [(80, 7), (130, 512), (64, 2000)])
def test_standardize_parity(n, dim):
    x = _data(n, dim, seed=n)
    got = np.asarray(standardize_tpu(x))
    want = StandardScaler().fit_transform(x)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_standardize_zero_variance_feature():
    x = _data(50, 6, seed=3)
    x[:, 2] = 7.0  # constant column: sklearn scales by 1 -> zeros
    got = np.asarray(standardize_tpu(x))
    want = StandardScaler().fit_transform(x)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("n,dim,k", [(90, 11, 2), (120, 700, 2),
                                     (100, 340, 50)])
def test_pca_scores_parity_vs_full_svd(n, dim, k):
    x = StandardScaler().fit_transform(_data(n, dim, seed=n + k))
    pca = PCATPU(n_components=k)
    got = pca.fit_transform(x.astype(np.float32))
    oracle = PCA(n_components=k, svd_solver="full")
    want = oracle.fit_transform(x)
    np.testing.assert_allclose(
        _align_signs(got, want), want, atol=5e-3 * np.abs(want).max()
    )
    np.testing.assert_allclose(
        pca.explained_variance_ratio_, oracle.explained_variance_ratio_,
        rtol=1e-3,
    )


def test_pca_component_clamp():
    """n_components larger than min(n, d) is clamped, like the scripts'
    min(50, *shape) guard expects."""
    x = _data(10, 6, seed=5)
    out = PCATPU(n_components=50).fit_transform(x)
    assert out.shape == (10, 6)


def test_reduction_backend_e2e(monkeypatch):
    """perform_dimensionality_reduction produces equivalent PCA embeddings
    (up to sign) and a working t-SNE on both backends."""
    from vae_los_angeles_tpu.evaluation.clustering.common import (
        perform_dimensionality_reduction,
    )

    x = _data(70, 120, seed=9)
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    pca_skl, tsne_skl = perform_dimensionality_reduction(x)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    pca_tpu, tsne_tpu = perform_dimensionality_reduction(x)
    assert tsne_tpu.shape == tsne_skl.shape == (70, 2)
    np.testing.assert_allclose(
        _align_signs(pca_tpu, pca_skl), pca_skl,
        atol=5e-3 * np.abs(pca_skl).max(),
    )


def test_cluster_scores_device_scaled_path(monkeypatch):
    """cluster_scores on the TPU backend (device-side scaling) matches the
    sklearn backend's scores."""
    from vae_los_angeles_tpu.evaluation.clustering.common import cluster_scores

    rng = np.random.default_rng(1)
    labels = rng.integers(0, 5, 110)
    centers = rng.normal(size=(5, 90)) * 2.5
    x = (centers[labels] + rng.normal(size=(110, 90))).astype(np.float32)
    pca2 = rng.normal(size=(110, 2)).astype(np.float32)
    tsne2 = rng.normal(size=(110, 2)).astype(np.float32)
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    want = cluster_scores(x, labels, pca2, tsne2)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    got = cluster_scores(x, labels, pca2, tsne2)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=5e-4), key
