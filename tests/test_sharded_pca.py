"""Feature-axis-sharded scale→PCA (ops/pca.device_scaled_features +
PCATPU over a column-sharded matrix) on the virtual 8-device CPU mesh.

The feature dimension is the domain's "long-context" axis (450k at
whole-methylome width); column sharding makes per-feature scaling local
and turns the n×n Gram contraction into local partials + one all-reduce
under GSPMD. These tests pin: sklearn parity through the sharded path,
pad-column inertness (ragged widths), equality with the single-chip
device path, and the col-sharded → row-sharded handoff the clustering
scripts' cluster_scores performs (scaled matrix into the silhouette/NH
kernels)."""

import numpy as np
import pytest
from sklearn.decomposition import PCA
from sklearn.preprocessing import StandardScaler

from vae_los_angeles_tpu.ops.pca import PCATPU, device_scaled_features


def _data(n, dim, seed=0, n_labels=4, spread=2.5):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)) * spread
    x = (centers[labels] + rng.normal(size=(n, dim))).astype(np.float32)
    return x, labels


def _align_signs(got, want):
    signs = np.sign(np.sum(got * want, axis=0))
    signs[signs == 0] = 1.0
    return got * signs[None, :]


def test_mesh_is_active():
    from vae_los_angeles_tpu.ops.knn import _eval_mesh

    assert _eval_mesh(None) is not None


@pytest.mark.parametrize("dim", [96, 93])  # divisible and ragged vs 8 chips
def test_sharded_standardize_matches_sklearn(dim):
    x, _ = _data(110, dim, seed=dim)
    dev = device_scaled_features(x, shard=True)
    got = np.asarray(dev)[:, :dim]  # drop inert pad columns
    want = StandardScaler().fit_transform(x)
    np.testing.assert_allclose(got, want, atol=1e-4)
    # pad columns are exactly zero
    assert np.all(np.asarray(dev)[:, dim:] == 0.0)


@pytest.mark.parametrize("dim,k", [(200, 2), (93, 50)])
def test_sharded_pca_matches_sklearn_and_single_chip(dim, k):
    x, _ = _data(120, dim, seed=dim + k)
    scaled_sh = device_scaled_features(x, shard=True)
    scaled_single = device_scaled_features(x, shard=False)
    pca_sh = PCATPU(n_components=k)
    got_sh = pca_sh.fit_transform(scaled_sh)
    pca_single = PCATPU(n_components=k)
    got_single = pca_single.fit_transform(scaled_single)
    # sharded ≡ single-chip (same deterministic Gram eigh, all-reduced)
    np.testing.assert_allclose(got_sh, got_single, atol=2e-3)
    np.testing.assert_allclose(
        pca_sh.explained_variance_ratio_,
        pca_single.explained_variance_ratio_, rtol=1e-4, atol=1e-7,
    )
    # and ≡ sklearn full SVD up to sign
    want = PCA(n_components=k, svd_solver="full").fit_transform(
        StandardScaler().fit_transform(x))
    np.testing.assert_allclose(
        _align_signs(got_sh, want), want, atol=5e-3 * np.abs(want).max())


def test_reduction_and_scores_e2e_on_mesh(monkeypatch):
    """perform_dimensionality_reduction + cluster_scores run the sharded
    scale→PCA (and the col-sharded scaled matrix hands off to the
    row-sharded silhouette/NH kernels) with sklearn-parity results."""
    from vae_los_angeles_tpu.evaluation.clustering.common import (
        cluster_scores,
        perform_dimensionality_reduction,
    )

    x, labels = _data(100, 93, seed=11)  # ragged width exercises pad cols
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    pca_skl, tsne_skl = perform_dimensionality_reduction(x)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    pca_tpu, tsne_tpu = perform_dimensionality_reduction(x)
    assert tsne_tpu.shape == tsne_skl.shape == (100, 2)
    np.testing.assert_allclose(
        _align_signs(pca_tpu, pca_skl), pca_skl,
        atol=5e-3 * np.abs(pca_skl).max())

    pca2 = np.random.default_rng(0).normal(size=(100, 2)).astype(np.float32)
    tsne2 = np.random.default_rng(1).normal(size=(100, 2)).astype(np.float32)
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    want = cluster_scores(x, labels, pca2, tsne2)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    got = cluster_scores(x, labels, pca2, tsne2)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=5e-4), key
