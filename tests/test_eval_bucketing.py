"""Row-count bucketing for the evaluation kernels (round 4, VERDICT r3 #3).

Every evaluation program's executable is keyed on cohort row count; on the
relay a never-seen program costs minutes. `ops/backend.bucket_rows` pads
rows up a geometric ladder with exact masking so near-sized cohorts share
every compiled program. Contracts: the ladder's shape, mask-exact scores
(bucketed == unbucketed == sklearn), and actual executable sharing
(measured via jit cache misses) between two cohorts in one bucket.
"""

import jax
import numpy as np
import pytest
from sklearn.metrics import silhouette_score

from vae_los_angeles_tpu.ops.backend import bucket_rows
from vae_los_angeles_tpu.ops.cluster_metrics import (
    cluster_scores_tpu,
    neighborhood_hit_tpu,
    silhouette_score_tpu,
)


def _blobs(n, dim, n_labels, seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)) * 3.0
    x = (centers[labels] + rng.normal(size=(n, dim))).astype(np.float32)
    return x, labels


def test_ladder_shape():
    # identity below 32, ladder {16,18,21,24,28}·2^e above
    for n in (2, 17, 31, 32):
        assert bucket_rows(n) == n
    assert bucket_rows(33) == 36
    assert bucket_rows(36) == 36
    assert bucket_rows(37) == 42
    assert bucket_rows(100) == 112
    assert bucket_rows(850) == 896
    assert bucket_rows(897) == 1024
    assert bucket_rows(1000) == 1024
    # consecutive steps within 17% (bounded pad waste)
    prev = 32
    for n in range(33, 5000):
        b = bucket_rows(n)
        assert b >= n
        assert b / n <= 1.18, (n, b)
    # disabled → identity
    assert bucket_rows(1000, enabled=False) == 1000


def test_env_toggle(monkeypatch):
    monkeypatch.setenv("EVAL_BUCKET", "0")
    assert bucket_rows(1000) == 1000
    monkeypatch.delenv("EVAL_BUCKET", raising=False)
    assert bucket_rows(1000) == 1024


@pytest.mark.parametrize("shard", [False, True])
def test_bucketed_scores_exact(monkeypatch, shard):
    """Bucketed metric scores equal the unbucketed program's and sklearn's
    (pad rows are mask-exact): n=850 pads to 896 (or the mesh multiple)."""
    x, labels = _blobs(850, 30, 5, seed=3)
    monkeypatch.setenv("EVAL_BUCKET", "0")
    sil_plain, nh_plain = cluster_scores_tpu(x, labels, shard=shard)
    monkeypatch.setenv("EVAL_BUCKET", "1")
    sil_b, nh_b = cluster_scores_tpu(x, labels, shard=shard)
    assert sil_b == pytest.approx(sil_plain, abs=2e-6)
    assert nh_b == pytest.approx(nh_plain, abs=1e-9)
    assert sil_b == pytest.approx(silhouette_score(x, labels), abs=2e-5)


def test_bucketed_standalone_metrics_exact():
    x, labels = _blobs(123, 16, 4, seed=4)
    want_sil = silhouette_score(x, labels)
    got_sil = silhouette_score_tpu(x, labels, shard=False)
    got_nh = neighborhood_hit_tpu(x, labels, shard=False)
    assert got_sil == pytest.approx(want_sil, abs=2e-5)
    from sklearn.neighbors import NearestNeighbors

    nbrs = NearestNeighbors(n_neighbors=6).fit(x)
    _, idx = nbrs.kneighbors(x)
    want_nh = float(np.mean(labels[idx[:, 1:]] == labels[:, None]))
    assert got_nh == pytest.approx(want_nh, abs=1e-9)


def test_bucketed_pca_exact():
    """Masked Gram-PCA on the padded matrix reproduces the unbucketed
    scores for the valid rows (zero rows add only zero eigenvalues)."""
    from vae_los_angeles_tpu.ops.pca import PCATPU

    x, _ = _blobs(850, 40, 5, seed=5)
    import os

    os.environ["EVAL_BUCKET"] = "0"
    try:
        plain = PCATPU(n_components=2).fit_transform(x)
    finally:
        os.environ.pop("EVAL_BUCKET")
    bucketed = PCATPU(n_components=2).fit_transform(x)
    assert bucketed.shape == (850, 2)
    np.testing.assert_allclose(np.abs(bucketed), np.abs(plain),
                               rtol=1e-3, atol=1e-3)
    from sklearn.decomposition import PCA

    sk = PCA(n_components=2).fit_transform(x)
    np.testing.assert_allclose(np.abs(bucketed), np.abs(sk),
                               rtol=1e-2, atol=1e-2)


def test_bucketed_scaler_exact():
    from sklearn.preprocessing import StandardScaler

    from vae_los_angeles_tpu.ops.pca import device_scaled_features

    x, _ = _blobs(850, 25, 5, seed=6)
    got = np.asarray(jax.device_get(device_scaled_features(x, shard=False)))
    assert got.shape == x.shape
    want = StandardScaler().fit_transform(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bucketed_tsne_quality():
    """Auto-policy t-SNE on a non-bucket n routes through the mask-exact
    row-block program; embedding quality matches the plain program's."""
    from vae_los_angeles_tpu.ops.tsne import TSNETPU

    x, labels = _blobs(130, 12, 3, seed=7)
    assert bucket_rows(130) == 144  # routes through the padded program
    emb = TSNETPU(perplexity=10.0, max_iter=250).fit_transform(x)
    assert emb.shape == (130, 2)
    assert np.isfinite(emb).all()
    plain = TSNETPU(perplexity=10.0, max_iter=250,
                    shard=False).fit_transform(x)
    sil_b = silhouette_score(emb, labels)
    sil_p = silhouette_score(plain, labels)
    assert sil_b >= sil_p - 0.1  # same quality basin


def test_executable_sharing_across_cohort_sizes():
    """THE point of bucketing: two cohorts whose row counts land in one
    bucket (850 and 890 → 896) run the fused metric program with ZERO new
    jit cache misses for the second cohort."""
    x1, l1 = _blobs(850, 30, 5, seed=8)
    x2, l2 = _blobs(890, 30, 5, seed=9)
    assert bucket_rows(850) == bucket_rows(890) == 896

    cluster_scores_tpu(x1, l1, shard=False)
    from vae_los_angeles_tpu.ops.cluster_metrics import _scores_chunk

    size_before = _scores_chunk._cache_size()
    cluster_scores_tpu(x2, l2, shard=False)
    assert _scores_chunk._cache_size() == size_before  # no new executable


def test_knn_bucketed_parity_and_sharing():
    """kNN fit matrices bucket too: predictions stay sklearn-exact and two
    near-sized training sets share the chunk executable."""
    from sklearn.neighbors import KNeighborsRegressor

    from vae_los_angeles_tpu.ops.knn import KNNRegressorTPU, _knn_chunk

    rng = np.random.default_rng(12)
    q = rng.normal(size=(64, 20)).astype(np.float32)
    for weights in ("uniform", "distance"):
        x1 = rng.normal(size=(850, 20)).astype(np.float32)
        y1 = rng.normal(size=(850, 3)).astype(np.float32)
        want = KNeighborsRegressor(5, weights=weights).fit(x1, y1).predict(q)
        got = KNNRegressorTPU(5, weights=weights, shard=False).fit(
            x1, y1).predict(q)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    size_before = _knn_chunk._cache_size()
    x2 = rng.normal(size=(890, 20)).astype(np.float32)  # same 896 bucket
    y2 = rng.normal(size=(890, 3)).astype(np.float32)
    KNNRegressorTPU(5, shard=False).fit(x2, y2).predict(q)
    assert _knn_chunk._cache_size() == size_before


def test_conditioned_knn_bucketed_parity():
    """Conditioned kNN buckets via site=-1 padding (pad rows match no real
    site): parity with the reference sklearn-loop implementation."""
    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )
    from vae_los_angeles_tpu.ops.knn import ConditionedKNNRegressorTPU

    rng = np.random.default_rng(13)
    n = 123  # buckets to 126? -> ladder: 112,128 -> 128
    x = rng.normal(size=(n, 11)).astype(np.float32)
    sites = rng.integers(0, 4, n).astype(np.float32)
    X = np.concatenate([x, sites[:, None]], axis=1)
    y = rng.normal(size=(n,)).astype(np.float32)
    q = np.concatenate(
        [rng.normal(size=(40, 11)).astype(np.float32),
         rng.integers(0, 5, 40).astype(np.float32)[:, None]], axis=1,
    )  # site 4 unseen -> zero rows
    want = ConditionedKNeighborsRegressor(n_neighbors=5).fit(X, y).predict(q)
    got = ConditionedKNNRegressorTPU(n_neighbors=5, shard=False).fit(
        X, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
