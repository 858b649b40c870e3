"""Multi-chip sharded evaluation kernels (parallel/sharded_eval.py) vs the
single-chip path and live sklearn oracles.

The conftest mesh gives 8 virtual CPU devices, so `shard=None` (auto, the
scripts' configuration) takes the sharded path here; `shard=False` pins the
single-chip kernels for the equivalence halves. The merged top-k is exact
(same neighbor set as a global top-k), so predictions must agree to float
summation order."""

import numpy as np
import pytest
from sklearn.neighbors import KNeighborsRegressor

from vae_los_angeles_tpu.models.conditioned_knn import (
    ConditionedKNeighborsRegressor,
)
from vae_los_angeles_tpu.ops.cluster_metrics import (
    neighborhood_hit_tpu,
    silhouette_score_tpu,
)
from vae_los_angeles_tpu.ops.knn import (
    ConditionedKNNRegressorTPU,
    KNNRegressorTPU,
)


def _data(n, d, t, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, d)).astype(np.float32),
            rng.normal(size=(n, t)).astype(np.float32),
            rng.normal(size=(37, d)).astype(np.float32))


@pytest.mark.parametrize("weights", ["uniform", "distance"])
@pytest.mark.parametrize("n", [120, 123])  # 123: rows pad to 128 over 8 chips
def test_knn_sharded_matches_single_chip(weights, n):
    x, y, q = _data(n, 17, 3, seed=n)
    sharded = KNNRegressorTPU(5, weights=weights, shard=True).fit(x, y)
    single = KNNRegressorTPU(5, weights=weights, shard=False).fit(x, y)
    assert sharded._mesh is not None and single._mesh is None
    np.testing.assert_allclose(
        sharded.predict(q), single.predict(q), rtol=1e-5, atol=1e-6
    )
    want = KNeighborsRegressor(5, weights=weights).fit(x, y).predict(q)
    np.testing.assert_allclose(sharded.predict(q), want, rtol=2e-4, atol=2e-5)


def test_knn_sharded_k_exceeds_local_rows():
    """k larger than each chip's shard (n=40 over 8 chips -> 5 local rows,
    k=12): local top-k clamps, the merged candidate strip still holds the
    true k nearest."""
    x, y, q = _data(40, 9, 2, seed=3)
    got = KNNRegressorTPU(12, shard=True).fit(x, y).predict(q)
    want = KNeighborsRegressor(12).fit(x, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_knn_sharded_zero_distance_rule():
    """Queries equal to training rows hit sklearn's zero-distance weighting
    under the psum-refined exact distances."""
    x, y, _ = _data(64, 11, 2, seed=4)
    q = x[[3, 40, 63]].copy()
    got = KNNRegressorTPU(5, weights="distance", shard=True).fit(
        x, y).predict(q)
    want = KNeighborsRegressor(5, weights="distance").fit(x, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("weights", ["uniform", "distance"])
def test_conditioned_sharded_matches_reference(weights):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(90, 13)).astype(np.float32)
    sites = rng.integers(0, 4, 90)
    y = rng.normal(size=(90, 5)).astype(np.float32)
    xc = np.column_stack([x, sites]).astype(np.float32)
    qs = rng.normal(size=(25, 13)).astype(np.float32)
    # include an unseen site id (9): reference predicts zeros for it
    q_sites = np.concatenate([rng.integers(0, 4, 24), [9]])
    qc = np.column_stack([qs, q_sites]).astype(np.float32)
    sharded = ConditionedKNNRegressorTPU(
        7, weights=weights, shard=True).fit(xc, y)
    assert sharded._mesh is not None
    got = sharded.predict(qc)
    want = ConditionedKNeighborsRegressor(
        n_neighbors=7, weights=weights).fit(xc, y).predict(qc)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert np.all(got[-1] == 0.0)  # unseen site -> zeros


def _blobs(n, dim, n_labels, seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_labels, n)
    centers = rng.normal(size=(n_labels, dim)) * 3.0
    return (centers[labels] + rng.normal(size=(n, dim))).astype(
        np.float32), labels


@pytest.mark.parametrize("n", [200, 203])
def test_silhouette_sharded_matches_single_chip(n):
    x, labels = _blobs(n, 19, 5, seed=n)
    got = silhouette_score_tpu(x, labels, chunk_size=64, shard=True)
    want = silhouette_score_tpu(x, labels, chunk_size=64, shard=False)
    assert got == pytest.approx(want, abs=1e-5)


@pytest.mark.parametrize("n,k", [(150, 5), (77, 11)])
def test_nh_sharded_matches_single_chip(n, k):
    x, labels = _blobs(n, 12, 4, seed=n + k)
    got = neighborhood_hit_tpu(x, labels, k=k, chunk_size=50, shard=True)
    want = neighborhood_hit_tpu(x, labels, k=k, chunk_size=50, shard=False)
    assert got == pytest.approx(want, abs=1e-9)


def test_shard_true_requires_mesh(monkeypatch):
    from vae_los_angeles_tpu.ops import knn as knn_mod

    monkeypatch.setattr(
        "vae_los_angeles_tpu.parallel.vmap_meta.population_mesh",
        lambda devices=None: None,
    )
    with pytest.raises(ValueError):
        knn_mod._eval_mesh(True)
    assert knn_mod._eval_mesh(None) is None
    assert knn_mod._eval_mesh(False) is None
