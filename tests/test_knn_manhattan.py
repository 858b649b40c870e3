"""Manhattan (L1) metric on the TPU kNN backends (round-5 verdict item #3).

The reference grid searches metric ∈ {euclidean, manhattan}
(`/root/reference/src/knn_comparison/run_comparison.py:62-66`); through
round 4 the TPU backend silently dropped the manhattan half (8 of 16
combos). L1 has no matmul identity, so `ops/knn._l1_dists` is a blocked
VPU broadcast-abs-reduce feeding the SAME top-k / prefix-grid machinery
and the sharded all-gather merge. Everything here is pinned against the
live sklearn oracle, single-chip and on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.neighbors import KNeighborsRegressor

from vae_los_angeles_tpu.models.conditioned_knn import (
    ConditionedKNeighborsRegressor,
)
from vae_los_angeles_tpu.ops import knn


def _fixture(n=300, m=60, d=700, t=6, seed=0):
    # d > L1_FEAT_BLOCK so the blocked scan path is exercised
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    Y = rng.normal(size=(n, t)).astype(np.float32)
    Q = rng.normal(size=(m, d)).astype(np.float32)
    Q[0] = X[17]  # exact duplicate → zero-distance rule must fire
    Yva = rng.normal(size=(m, t)).astype(np.float32)
    return X, Y, Q, Yva


def test_l1_dists_blocked_matches_direct():
    """The feature-block scan is a pure summation-order refactor of the
    direct broadcast reduce, including at non-multiple widths."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(37, 1177)).astype(np.float32)  # odd width
    Q = rng.normal(size=(11, 1177)).astype(np.float32)
    got = np.asarray(knn._l1_dists(jnp.asarray(X), jnp.asarray(Q)))
    want = np.abs(Q[:, None, :] - X[None, :, :]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
    assert float(knn._l1_dists(jnp.asarray(X), jnp.asarray(X[:11]))[0, 0]) == 0.0


@pytest.mark.parametrize("weights", ["uniform", "distance"])
def test_manhattan_predict_matches_sklearn(weights):
    X, Y, Q, _ = _fixture()
    got = knn.KNNRegressorTPU(
        n_neighbors=7, weights=weights, metric="manhattan", shard=False,
    ).fit(X, Y).predict(Q)
    want = KNeighborsRegressor(
        n_neighbors=7, weights=weights, metric="manhattan",
    ).fit(X, Y).predict(Q)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("weights", ["uniform", "distance"])
def test_manhattan_conditioned_matches_reference(weights):
    X, Y, Q, _ = _fixture(seed=2)
    rng = np.random.default_rng(3)
    sites = rng.integers(0, 4, size=len(X)).astype(np.float32)
    q_sites = rng.integers(0, 5, size=len(Q)).astype(np.float32)  # site 4 unseen? no: train has 0-3, queries 0-4 → site-4 rows exercise the zero-row path
    Xtr = np.column_stack([X, sites])
    Xva = np.column_stack([Q, q_sites])
    got = knn.ConditionedKNNRegressorTPU(
        n_neighbors=5, weights=weights, metric="manhattan", shard=False,
    ).fit(Xtr, Y).predict(Xva)
    want = ConditionedKNeighborsRegressor(
        n_neighbors=5, weights=weights, metric="manhattan",
    ).fit(Xtr, Y).predict(Xva)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("metric", ["euclidean", "manhattan"])
def test_fused_grid_matches_sklearn_per_combo(metric):
    X, Y, Q, Yva = _fixture(seed=4)
    grid = knn.knn_grid_mse_tpu(
        X, Y, Q, Yva, ks=(3, 7), modes=("uniform", "distance"),
        shard=False, metric=metric,
    )
    assert len(grid) == 4
    for (k, mode), mse in grid.items():
        pred = KNeighborsRegressor(
            n_neighbors=k, weights=mode, metric=metric,
        ).fit(X, Y).predict(Q)
        assert abs(mse - float(np.mean((pred - Yva) ** 2))) < 1e-5, (k, mode)


def test_manhattan_sharded_matches_single_chip():
    X, Y, Q, Yva = _fixture(seed=5)
    for weights in ("uniform", "distance"):
        single = knn.KNNRegressorTPU(
            5, weights=weights, metric="manhattan", shard=False,
        ).fit(X, Y).predict(Q)
        sharded = knn.KNNRegressorTPU(
            5, weights=weights, metric="manhattan", shard=True,
        ).fit(X, Y).predict(Q)
        np.testing.assert_allclose(sharded, single, atol=2e-5)
    g1 = knn.knn_grid_mse_tpu(X, Y, Q, Yva, ks=(3, 7),
                              modes=("uniform", "distance"),
                              shard=False, metric="manhattan")
    g2 = knn.knn_grid_mse_tpu(X, Y, Q, Yva, ks=(3, 7),
                              modes=("uniform", "distance"),
                              shard=True, metric="manhattan")
    for key in g1:
        assert abs(g1[key] - g2[key]) < 1e-5, key


def test_manhattan_conditioned_sharded_matches_single_chip():
    X, Y, Q, Yva = _fixture(seed=6)
    rng = np.random.default_rng(7)
    Xtr = np.column_stack([X, rng.integers(0, 4, len(X)).astype(np.float32)])
    Xva = np.column_stack([Q, rng.integers(0, 4, len(Q)).astype(np.float32)])
    g1 = knn.knn_grid_mse_tpu(Xtr, Y, Xva, Yva, ks=(3, 7),
                              modes=("uniform", "distance"),
                              conditioned=True, shard=False,
                              metric="manhattan")
    g2 = knn.knn_grid_mse_tpu(Xtr, Y, Xva, Yva, ks=(3, 7),
                              modes=("uniform", "distance"),
                              conditioned=True, shard=True,
                              metric="manhattan")
    for key in g1:
        assert abs(g1[key] - g2[key]) < 1e-5, key


def test_optimize_knn_searches_all_16_combos(capsys):
    """The TPU grid no longer narrows the reference search space: all 16
    combos are evaluated and manhattan CAN win. Data is crafted so L1
    ranking beats L2 (one huge-variance noise column dominates squared
    distances but not absolute ones)."""
    from vae_los_angeles_tpu.evaluation.knn_comparison import (
        KNN_GRID,
        optimize_knn,
    )

    assert "manhattan" in KNN_GRID["metric"]
    rng = np.random.default_rng(8)
    n, m, d = 200, 50, 20
    X = rng.normal(size=(n, d)).astype(np.float32)
    X[:, 0] *= 40.0  # L2 is dominated by this column; L1 is not
    Y = (X[:, 1:5] ** 2).astype(np.float32)
    Q = rng.normal(size=(m, d)).astype(np.float32)
    Q[:, 0] *= 40.0
    Yva = (Q[:, 1:5] ** 2).astype(np.float32)
    model = optimize_knn(X, Y, Q, Yva, name="test",
                         model_class=knn.KNNRegressorTPU)
    out = capsys.readouterr().out
    assert "skipped" not in out  # the round-4 narrowing notice is gone
    assert model.metric in ("euclidean", "manhattan")
    # the fused grids must agree with sklearn on the best combo choice
    best = {"mse": np.inf, "params": None}
    for metric in KNN_GRID["metric"]:
        for k in KNN_GRID["n_neighbors"]:
            for w in KNN_GRID["weights"]:
                pred = KNeighborsRegressor(
                    n_neighbors=min(k, n), weights=w, metric=metric,
                ).fit(X, Y).predict(Q)
                mse = float(np.mean((pred - Yva) ** 2))
                if mse < best["mse"]:
                    best = {"mse": mse,
                            "params": (min(k, n), w, metric)}
    assert (model.n_neighbors, model.weights, model.metric) == best["params"]


def test_unsupported_metric_rejected():
    with pytest.raises(ValueError, match="unsupported metric"):
        knn.KNNRegressorTPU(metric="chebyshev")
    with pytest.raises(ValueError, match="unsupported metric"):
        knn.ConditionedKNNRegressorTPU(metric="cosine")
