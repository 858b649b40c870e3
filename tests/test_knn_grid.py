"""Fused grid-search kernel parity: one distance pass must reproduce the
per-combo sklearn loop's validation MSEs and best-param selection
(reference `src/knn_comparison/run_comparison.py:56-94`)."""

import numpy as np
import pytest

from vae_los_angeles_tpu.ops.knn import (
    ConditionedKNNRegressorTPU,
    KNNRegressorTPU,
    knn_grid_mse_tpu,
)


@pytest.fixture
def regression_data():
    rng = np.random.default_rng(21)
    x = rng.normal(size=(180, 16)).astype(np.float32)
    y = (x @ rng.normal(size=(16, 4)) + 0.1 * rng.normal(size=(180, 4))
         ).astype(np.float32)
    q = rng.normal(size=(70, 16)).astype(np.float32)
    yq = (q @ rng.normal(size=(16, 4))).astype(np.float32)
    return x, y, q, yq


def test_grid_mse_matches_sklearn_loop(regression_data):
    from sklearn.metrics import mean_squared_error
    from sklearn.neighbors import KNeighborsRegressor

    x, y, q, yq = regression_data
    ks, modes = (5, 10, 20, 50), ("uniform", "distance")
    got = knn_grid_mse_tpu(x, y, q, yq, ks, modes)
    for k in ks:
        for mode in modes:
            want = mean_squared_error(
                yq, KNeighborsRegressor(k, weights=mode).fit(x, y).predict(q)
            )
            assert got[(k, mode)] == pytest.approx(want, rel=1e-4), (k, mode)


def test_grid_mse_zero_distance_rule(regression_data):
    """Queries equal to training rows exercise the sklearn exact-match
    weighting inside the prefix reduction."""
    from sklearn.metrics import mean_squared_error
    from sklearn.neighbors import KNeighborsRegressor

    x, y, q, yq = regression_data
    q2 = np.concatenate([x[:10], q])
    yq2 = np.concatenate([y[:10], yq])
    got = knn_grid_mse_tpu(x, y, q2, yq2, (5, 20), ("distance",))
    for k in (5, 20):
        want = mean_squared_error(
            yq2,
            KNeighborsRegressor(k, weights="distance").fit(x, y).predict(q2),
        )
        assert got[(k, "distance")] == pytest.approx(want, rel=1e-4)


def test_grid_k_clamps_to_train_size():
    from sklearn.metrics import mean_squared_error
    from sklearn.neighbors import KNeighborsRegressor

    rng = np.random.default_rng(5)
    x = rng.normal(size=(12, 6)).astype(np.float32)
    y = rng.normal(size=(12, 2)).astype(np.float32)
    q = rng.normal(size=(9, 6)).astype(np.float32)
    yq = rng.normal(size=(9, 2)).astype(np.float32)
    got = knn_grid_mse_tpu(x, y, q, yq, (5, 50), ("uniform",))
    assert set(got) == {(5, "uniform"), (12, "uniform")}  # 50 → n=12
    want = mean_squared_error(
        yq, KNeighborsRegressor(12).fit(x, y).predict(q))
    assert got[(12, "uniform")] == pytest.approx(want, rel=1e-4)


def test_conditioned_grid_matches_reference_loop():
    from sklearn.metrics import mean_squared_error

    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )

    rng = np.random.default_rng(8)
    n = 160
    feats = rng.normal(size=(n, 10)).astype(np.float32)
    sites = rng.integers(0, 6, n).astype(np.float32)  # some groups < 20
    X = np.column_stack([feats, sites])
    y = rng.normal(size=(n,)).astype(np.float32)
    qf = rng.normal(size=(50, 10)).astype(np.float32)
    qs = rng.integers(0, 7, 50).astype(np.float32)  # site 6 unseen → zeros
    Q = np.column_stack([qf, qs])
    yq = rng.normal(size=(50,)).astype(np.float32)

    ks, modes = (5, 20), ("uniform", "distance")
    got = knn_grid_mse_tpu(X, y, Q, yq, ks, modes, conditioned=True)
    for k in ks:
        for mode in modes:
            ref = ConditionedKNeighborsRegressor(
                n_neighbors=k, weights=mode).fit(X, y)
            want = mean_squared_error(yq, ref.predict(Q))
            assert got[(k, mode)] == pytest.approx(want, rel=1e-4), (k, mode)


def _sklearn_grid_best(model_cls, x, y, q, yq):
    """Reference grid-loop best over the FULL 16-combo grid (since round 5
    the TPU path evaluates the manhattan half too — ops/knn._l1_dists)."""
    import itertools

    from sklearn.metrics import mean_squared_error

    from vae_los_angeles_tpu.evaluation.knn_comparison import KNN_GRID

    best_mse, best = float("inf"), None
    for k, mode, metric in itertools.product(KNN_GRID["n_neighbors"],
                                             KNN_GRID["weights"],
                                             KNN_GRID["metric"]):
        model = model_cls(n_neighbors=min(k, len(x)), weights=mode,
                          metric=metric).fit(x, y)
        mse = mean_squared_error(yq, model.predict(q))
        if mse < best_mse:
            best_mse, best = mse, model
    return best


def test_optimize_knn_fused_selects_same_params(regression_data, monkeypatch):
    """optimize_knn under EVAL_BACKEND=tpu (fused grid) must pick the same
    best params as the sklearn per-combo loop, and return a fitted model
    whose predictions match the best sklearn model."""
    from sklearn.neighbors import KNeighborsRegressor

    from vae_los_angeles_tpu.evaluation.knn_comparison import optimize_knn

    x, y, q, yq = regression_data
    sk_best = _sklearn_grid_best(KNeighborsRegressor, x, y, q, yq)

    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    tpu_best = optimize_knn(x, y, q, yq, model_class=KNNRegressorTPU)
    assert isinstance(tpu_best, KNNRegressorTPU)
    assert tpu_best.n_neighbors == sk_best.n_neighbors
    assert tpu_best.weights == sk_best.weights
    assert tpu_best.metric == sk_best.metric
    np.testing.assert_allclose(
        tpu_best.predict(q), sk_best.predict(q), rtol=1e-4, atol=1e-4)


def test_optimize_knn_fused_conditioned(monkeypatch):
    from vae_los_angeles_tpu.evaluation.knn_comparison import optimize_knn
    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )

    rng = np.random.default_rng(17)
    n = 140
    X = np.column_stack([
        rng.normal(size=(n, 8)).astype(np.float32),
        rng.integers(0, 5, n).astype(np.float32),
    ])
    y = rng.normal(size=(n,)).astype(np.float32)
    Q = np.column_stack([
        rng.normal(size=(40, 8)).astype(np.float32),
        rng.integers(0, 5, 40).astype(np.float32),
    ])
    yq = rng.normal(size=(40,)).astype(np.float32)

    sk_best = _sklearn_grid_best(
        ConditionedKNeighborsRegressor, X, y, Q, yq)
    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    tpu_best = optimize_knn(X, y, Q, yq,
                            model_class=ConditionedKNNRegressorTPU)
    assert tpu_best.n_neighbors == sk_best.n_neighbors
    assert tpu_best.weights == sk_best.weights
    assert tpu_best.metric == sk_best.metric
    np.testing.assert_allclose(
        tpu_best.predict(Q), sk_best.predict(Q), rtol=1e-4, atol=1e-4)


def test_predict_multi_k_matches_per_k(regression_data):
    from sklearn.neighbors import KNeighborsRegressor

    x, y, q, _ = regression_data
    for weights in ("uniform", "distance"):
        reg = KNNRegressorTPU(weights=weights, shard=False).fit(x, y)
        multi = reg.predict_multi_k(q, (5, 10, 50))
        assert set(multi) == {5, 10, 50}
        for k in (5, 10, 50):
            want = KNeighborsRegressor(k, weights=weights).fit(x, y).predict(q)
            np.testing.assert_allclose(multi[k], want, rtol=1e-4, atol=1e-4)


def test_predict_multi_k_clamps_and_squeezes():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(14, 5)).astype(np.float32)
    y = rng.normal(size=14).astype(np.float32)  # 1-D → squeezed output
    q = rng.normal(size=(6, 5)).astype(np.float32)
    multi = KNNRegressorTPU(shard=False).fit(x, y).predict_multi_k(q, (5, 50))
    assert set(multi) == {5, 14}
    assert multi[5].shape == (6,)
    want = KNNRegressorTPU(5, shard=False).fit(x, y).predict(q)
    np.testing.assert_allclose(multi[5], want, rtol=1e-5, atol=1e-6)


def test_cv_knn_sweep_fused_matches_sklearn(monkeypatch):
    """run_cross_validation('knn') under EVAL_BACKEND=tpu (fused multi-k)
    must reproduce the sklearn per-k sweep's fold metrics."""
    from sklearn.model_selection import KFold

    from vae_los_angeles_tpu.evaluation.cross_modality_cv import (
        run_cross_validation,
    )

    rng = np.random.default_rng(31)
    n = 120
    X = rng.normal(size=(n, 12)).astype(np.float32)
    y = (X @ rng.normal(size=(12, 7))).astype(np.float32)
    site = rng.integers(0, 4, n)
    folds = list(KFold(n_splits=3, shuffle=True, random_state=0).split(X))

    monkeypatch.delenv("EVAL_BACKEND", raising=False)
    monkeypatch.delenv("KNN_BACKEND", raising=False)
    want = run_cross_validation(X, y, site, [5, 10], folds,
                                "RNA -> DNA", "knn")
    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    got = run_cross_validation(X, y, site, [5, 10], folds,
                               "RNA -> DNA", "knn")
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g["param_value"] == w["param_value"]
        for metric, scores in w["fold_metrics"].items():
            np.testing.assert_allclose(
                g["fold_metrics"][metric], scores, rtol=1e-4, atol=1e-5)


def test_sharded_grid_matches_single_chip(regression_data):
    """On the 8-device mesh, the sharded fused grid (exact all-gather
    top-k merge + psum'd prefix numerators) must reproduce the single-chip
    kernel's MSEs for every combo — and both run in this suite: shard=None
    auto-detects the mesh, shard=False forces the single-chip program."""
    x, y, q, yq = regression_data
    ks, modes = (5, 10, 20, 50), ("uniform", "distance")
    sharded = knn_grid_mse_tpu(x, y, q, yq, ks, modes, shard=True)
    single = knn_grid_mse_tpu(x, y, q, yq, ks, modes, shard=False)
    for combo, mse in single.items():
        assert sharded[combo] == pytest.approx(mse, rel=1e-5), combo


def test_sharded_conditioned_grid_matches_single_chip():
    """Conditioned variant, incl. unseen-site queries (zero rows) and
    per-site k clamping, sharded vs single-chip."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(90, 8)).astype(np.float32)
    y = rng.normal(size=(90, 3)).astype(np.float32)
    sites = rng.integers(0, 4, 90).astype(np.float32)  # site 4 never trains
    q = rng.normal(size=(40, 8)).astype(np.float32)
    yq = rng.normal(size=(40, 3)).astype(np.float32)
    q_sites = rng.integers(0, 5, 40).astype(np.float32)
    xt = np.concatenate([x, sites[:, None]], axis=1)
    xv = np.concatenate([q, q_sites[:, None]], axis=1)
    ks, modes = (5, 20, 50), ("uniform", "distance")
    sharded = knn_grid_mse_tpu(xt, y, xv, yq, ks, modes, conditioned=True,
                               shard=True)
    single = knn_grid_mse_tpu(xt, y, xv, yq, ks, modes, conditioned=True,
                              shard=False)
    for combo, mse in single.items():
        assert sharded[combo] == pytest.approx(mse, rel=1e-5), combo


@pytest.mark.parametrize("weights", ["uniform", "distance"])
def test_sharded_multi_k_matches_single_chip(regression_data, weights):
    """predict_multi_k on the mesh (one sharded pass, exact top-k merge)
    vs the single-chip kernel and the per-k sharded predictors, both
    weighting modes — 'distance' includes zero-distance queries (exact
    training rows) to exercise the sklearn override inside the sharded
    prefix reduction."""
    x, y, q, yq = regression_data
    if weights == "distance":
        q = np.concatenate([x[:7], q])  # exact matches → zero distances
    ks = (5, 10, 20, 50)
    sharded = KNNRegressorTPU(weights=weights, shard=True).fit(
        x, y).predict_multi_k(q, ks)
    single = KNNRegressorTPU(weights=weights, shard=False).fit(
        x, y).predict_multi_k(q, ks)
    for k in ks:
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-5,
                                   atol=1e-6)
        per_k = KNNRegressorTPU(
            n_neighbors=k, weights=weights, shard=True).fit(x, y).predict(q)
        np.testing.assert_allclose(sharded[k], per_k, rtol=1e-5, atol=1e-6)
