"""Parity + quality tests for the TPU exact t-SNE (ops/tsne.py) against
live sklearn oracles — the embedding step of the clustering and kNN
comparison scripts (reference cluster_reconstructed.py:178,
run_comparison.py:185).

Two-tier strategy (the embedding itself is stochastic-algorithm output):
the deterministic affinity stage is tested numerically against sklearn's
own Cython binary search; the full embedding is tested on QUALITY metrics
(trustworthiness, embedding-space silhouette, KL) against a live sklearn
run on the same data.
"""

import numpy as np
import pytest
from sklearn.manifold import TSNE, trustworthiness
from sklearn.manifold import _utils as skl_tsne_utils
from sklearn.metrics import pairwise_distances, silhouette_score
from scipy.spatial.distance import squareform

from vae_los_angeles_tpu.ops.tsne import (
    TSNETPU,
    _conditional_probabilities,
    _joint_probabilities,
    _sq_distances,
    resolve_tsne,
)


def _blobs(n=240, dim=24, n_labels=5, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)) * spread
    x = (centers[labels] + rng.normal(size=(n, dim))).astype(np.float32)
    return x, labels


# ---------------------------------------------------------------- affinities


@pytest.mark.parametrize("n,perplexity", [(60, 12.0), (150, 30.0), (40, 5.0)])
def test_conditional_probabilities_match_sklearn_cython(n, perplexity):
    """The vectorized perplexity binary search reproduces sklearn's
    per-point Cython search on the same distance matrix."""
    x, _ = _blobs(n=n, dim=16, seed=n)
    d2 = pairwise_distances(x, metric="euclidean", squared=True).astype(
        np.float32
    )
    want = skl_tsne_utils._binary_search_perplexity(d2.copy(), perplexity, 0)
    got = np.asarray(_conditional_probabilities(d2, np.float32(perplexity)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # rows are probability distributions
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-4)
    assert np.all(np.diag(got) == 0.0)


def test_joint_probabilities_match_sklearn(monkeypatch):
    """Symmetrization + normalization + eps floor match
    sklearn.manifold._t_sne._joint_probabilities."""
    from sklearn.manifold import _t_sne as skl_tsne

    x, _ = _blobs(n=90, dim=12, seed=7)
    d2 = pairwise_distances(x, squared=True).astype(np.float32)
    want = squareform(skl_tsne._joint_probabilities(d2.copy(), 20.0, 0))
    got = np.asarray(_joint_probabilities(d2, np.float32(20.0)))
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert np.all(np.diag(got) == 0.0)


def test_sq_distances_identity():
    x, _ = _blobs(n=50, dim=33, seed=3)
    got = np.asarray(_sq_distances(x))
    want = pairwise_distances(x, squared=True)
    np.testing.assert_allclose(got, want, atol=1e-2 * want.max())
    assert np.all(np.diag(got) == 0.0)


# ----------------------------------------------------------------- embedding


def test_embedding_quality_vs_sklearn():
    """Trustworthiness (rank preservation of input neighborhoods) and
    embedding-space cluster separation are on par with a live sklearn run
    of the same spec the scripts use (n_components=2, random_state=42,
    perplexity=min(30, n-1))."""
    x, labels = _blobs(n=220, dim=30, seed=1)
    perp = min(30, len(x) - 1)
    ours = TSNETPU(n_components=2, random_state=42, perplexity=perp,
                   shard=False)
    y_tpu = ours.fit_transform(x)
    y_skl = TSNE(
        n_components=2, random_state=42, perplexity=perp
    ).fit_transform(x)
    t_tpu = trustworthiness(x, y_tpu)
    t_skl = trustworthiness(x, y_skl)
    assert t_tpu >= 0.85
    assert t_tpu >= t_skl - 0.03
    s_tpu = silhouette_score(y_tpu, labels)
    s_skl = silhouette_score(y_skl, labels)
    assert s_tpu >= 0.5
    assert s_tpu >= s_skl - 0.1
    assert np.isfinite(ours.kl_divergence_)
    assert ours.kl_divergence_ > 0.0


def test_kl_divergence_comparable_to_sklearn_exact():
    """Against sklearn's exact method (the formulation this kernel
    implements) the final KL is equal or better within slack."""
    x, _ = _blobs(n=120, dim=10, seed=9)
    perp = 15.0
    ours = TSNETPU(n_components=2, random_state=42, perplexity=perp,
                   shard=False)
    ours.fit_transform(x)
    skl = TSNE(
        n_components=2, random_state=42, perplexity=perp, method="exact"
    )
    skl.fit_transform(x)
    assert ours.kl_divergence_ <= skl.kl_divergence_ * 1.25 + 0.05


def test_deterministic():
    x, _ = _blobs(n=80, dim=8, seed=5)
    a = TSNETPU(random_state=42, perplexity=10.0, shard=False).fit_transform(x)
    b = TSNETPU(random_state=42, perplexity=10.0, shard=False).fit_transform(x)
    np.testing.assert_array_equal(a, b)


def test_random_init_seeded():
    x, _ = _blobs(n=70, dim=8, seed=6)
    a = TSNETPU(init="random", random_state=0, perplexity=10.0,
                shard=False).fit_transform(x)
    b = TSNETPU(init="random", random_state=0, perplexity=10.0,
                shard=False).fit_transform(x)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (70, 2)


def test_small_cohort_and_script_perplexity_clamp():
    """The scripts pass perplexity=min(30, n-1); a tiny cohort must work."""
    x, _ = _blobs(n=12, dim=6, seed=2)
    y = TSNETPU(
        n_components=2, random_state=42, perplexity=min(30, len(x) - 1),
        shard=False,
    ).fit_transform(x)
    assert y.shape == (12, 2)
    assert np.all(np.isfinite(y))


def test_validation_errors():
    x, _ = _blobs(n=20, dim=4, seed=4)
    with pytest.raises(ValueError, match="perplexity"):
        TSNETPU(perplexity=30.0).fit_transform(x)  # 30 >= n
    with pytest.raises(ValueError, match="euclidean"):
        TSNETPU(metric="manhattan")
    with pytest.raises(ValueError, match="init"):
        TSNETPU(init="bogus", perplexity=5.0).fit_transform(x)


def test_resolver(monkeypatch):
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    assert resolve_tsne() is TSNE
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    assert resolve_tsne() is TSNETPU
    monkeypatch.setenv("KNN_BACKEND", "bogus")
    with pytest.raises(ValueError):
        resolve_tsne()


def test_knn_comparison_tsne_plot_uses_backend(monkeypatch, tmp_path):
    """compute_and_plot_tsne runs end-to-end on the TPU backend and writes
    the reference-named plot artifact."""
    from vae_los_angeles_tpu.evaluation.knn_comparison import (
        compute_and_plot_tsne,
    )

    x, labels = _blobs(n=60, dim=9, seed=8)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    compute_and_plot_tsne(
        x, [f"site{i}" for i in labels], "unit", "unit", str(tmp_path)
    )
    assert (tmp_path / "comparison" / "tsne_unit.png").exists()
