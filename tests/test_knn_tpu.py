"""KNNRegressorTPU parity vs the live sklearn oracle.

The MXU-matmul distance identity must reproduce
``sklearn.neighbors.KNeighborsRegressor`` exactly (up to fp32 distance
rounding) for both weighting modes, multi-target outputs, k clamping, and
query chunking — the evaluation scripts swap it in via KNN_BACKEND=tpu."""

import numpy as np
import pytest
from sklearn.neighbors import KNeighborsRegressor

from vae_los_angeles_tpu.ops.knn import KNNRegressorTPU, resolve_knn_regressor


def _data(n=120, m=35, d=17, t=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(size=(n, t)).astype(np.float32)
    q = rng.normal(size=(m, d)).astype(np.float32)
    return x, y, q


@pytest.mark.parametrize("weights", ["uniform", "distance"])
@pytest.mark.parametrize("k", [1, 5, 12])
def test_matches_sklearn(weights, k):
    x, y, q = _data(seed=k)
    want = KNeighborsRegressor(n_neighbors=k, weights=weights).fit(x, y).predict(q)
    got = KNNRegressorTPU(n_neighbors=k, weights=weights).fit(x, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_single_target_squeeze_and_clamped_k():
    x, y, q = _data(n=8, t=1, seed=3)
    y1 = y[:, 0]
    want = KNeighborsRegressor(n_neighbors=8).fit(x, y1).predict(q)
    # n_neighbors beyond the training size clamps instead of raising
    got = KNNRegressorTPU(n_neighbors=50).fit(x, y1).predict(q)
    assert got.shape == want.shape == (len(q),)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_query_chunking_is_invisible():
    x, y, q = _data(m=101, seed=4)
    whole = KNNRegressorTPU(n_neighbors=5).fit(x, y).predict(q)
    chunked = KNNRegressorTPU(n_neighbors=5, chunk_size=16).fit(x, y).predict(q)
    np.testing.assert_allclose(whole, chunked, rtol=1e-6)


def test_distance_weight_exact_match_rows():
    """A query identical to a training row: sklearn averages only the
    zero-distance neighbors — the TPU path must agree, not divide by zero."""
    x, y, _ = _data(seed=5)
    q = np.concatenate([x[:3], x[:1] + 10.0])
    want = KNeighborsRegressor(n_neighbors=4, weights="distance").fit(x, y).predict(q)
    got = KNNRegressorTPU(n_neighbors=4, weights="distance").fit(x, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_device_resident_queries_match_host():
    """predict(jax.Array) skips the host roundtrip but must agree with the
    numpy path (the cost-free composition with on-device decoder outputs)."""
    import jax.numpy as jnp

    x, y, q = _data(m=70, seed=6)
    model = KNNRegressorTPU(n_neighbors=5, weights="distance",
                            chunk_size=32).fit(x, y)
    host = model.predict(q)
    dev = model.predict(jnp.asarray(q))
    assert isinstance(dev, np.ndarray)
    np.testing.assert_allclose(dev, host, rtol=1e-6)


def test_fit_transfer_cache_reuse_and_mutation_guard():
    """Refitting on the SAME host arrays (the grid-search pattern) reuses the
    cached device copy; in-place mutation is detected and re-transfers."""
    x, y, q = _data(seed=7)
    a = KNNRegressorTPU(n_neighbors=5).fit(x, y)
    b = KNNRegressorTPU(n_neighbors=10).fit(x, y)
    assert a._x is b._x and a._y is b._y  # cache hit, no second transfer
    before = b.predict(q)
    x[:] = x[::-1]  # in-place mutation must invalidate the fingerprint
    c = KNNRegressorTPU(n_neighbors=10).fit(x, y)
    assert c._x is not b._x
    after = c.predict(q)
    assert not np.allclose(before, after)
    want = KNeighborsRegressor(n_neighbors=10).fit(x, y).predict(q)
    np.testing.assert_allclose(after, want, rtol=2e-4, atol=2e-5)


def test_repeated_query_predicts_reuse_device_copy():
    """The grid-search pattern — same X_val predicted per param combo —
    transfers the queries once (cache keyed on the caller's array)."""
    from vae_los_angeles_tpu.ops.knn import _PUT_CACHE

    x, y, q = _data(seed=8)
    model = KNNRegressorTPU(n_neighbors=5).fit(x, y)
    first = model.predict(q)
    # cache keys are (id(host array), pad salt) since round-4 bucketing
    q_keys = [k for k in _PUT_CACHE if k[0] == id(q)]
    assert q_keys
    cached_dev = _PUT_CACHE[q_keys[0]][2]
    again = KNNRegressorTPU(n_neighbors=3).fit(x, y).predict(q)
    assert _PUT_CACHE[q_keys[0]][2] is cached_dev  # no re-transfer
    assert first.shape == again.shape


def test_resolve_backend(monkeypatch):
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    assert resolve_knn_regressor() is KNNRegressorTPU
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    assert resolve_knn_regressor() is KNeighborsRegressor
    monkeypatch.setenv("KNN_BACKEND", "bogus")
    with pytest.raises(ValueError):
        resolve_knn_regressor()


def _sited_data(n=140, m=40, d=13, t=4, n_sites=5, seed=0):
    """Features with the reference's site-id-as-last-column convention."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    site = rng.integers(0, n_sites, size=n).astype(np.float32)
    y = rng.normal(size=(n, t)).astype(np.float32)
    q = rng.normal(size=(m, d)).astype(np.float32)
    q_site = rng.integers(0, n_sites, size=m).astype(np.float32)
    return (np.concatenate([x, site[:, None]], 1), y,
            np.concatenate([q, q_site[:, None]], 1))


@pytest.mark.parametrize("weights", ["uniform", "distance"])
@pytest.mark.parametrize("k", [1, 5, 60])
def test_conditioned_matches_sklearn_loop(weights, k):
    """The masked-distance kernel must reproduce the reference semantics'
    per-site sklearn loop, including per-site k clamping (k=60 exceeds
    every group size here)."""
    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )
    from vae_los_angeles_tpu.ops.knn import ConditionedKNNRegressorTPU

    X, y, q = _sited_data(seed=k)
    want = ConditionedKNeighborsRegressor(
        n_neighbors=k, weights=weights).fit(X, y).predict(q)
    got = ConditionedKNNRegressorTPU(
        n_neighbors=k, weights=weights).fit(X, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_conditioned_unseen_site_zeros_and_ravel():
    from vae_los_angeles_tpu.ops.knn import ConditionedKNNRegressorTPU

    X, y, q = _sited_data(n_sites=3, t=1, seed=9)
    q[:5, -1] = 7.0  # site never seen at fit time
    model = ConditionedKNNRegressorTPU(n_neighbors=4).fit(X, y[:, 0])
    out = model.predict(q)
    assert out.shape == (len(q),)  # single-output ravel, reference :65-66
    np.testing.assert_array_equal(out[:5], 0.0)
    assert np.all(out[5:] != 0.0)


def test_conditioned_chunking_and_resolver(monkeypatch):
    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )
    from vae_los_angeles_tpu.ops.knn import (
        ConditionedKNNRegressorTPU,
        resolve_conditioned_knn,
    )

    X, y, q = _sited_data(m=53, seed=11)
    whole = ConditionedKNNRegressorTPU(n_neighbors=3).fit(X, y).predict(q)
    chunked = ConditionedKNNRegressorTPU(
        n_neighbors=3, chunk_size=16).fit(X, y).predict(q)
    np.testing.assert_allclose(whole, chunked, rtol=1e-6)
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    assert resolve_conditioned_knn() is ConditionedKNNRegressorTPU
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    assert resolve_conditioned_knn() is ConditionedKNeighborsRegressor


def test_conditioned_distance_weight_exact_match():
    """A query equal to a training row of the same site: only the
    zero-distance neighbors are averaged (sklearn semantics per site)."""
    from vae_los_angeles_tpu.models.conditioned_knn import (
        ConditionedKNeighborsRegressor,
    )
    from vae_los_angeles_tpu.ops.knn import ConditionedKNNRegressorTPU

    X, y, _ = _sited_data(seed=12)
    q = X[:6].copy()
    want = ConditionedKNeighborsRegressor(
        n_neighbors=4, weights="distance").fit(X, y).predict(q)
    got = ConditionedKNNRegressorTPU(
        n_neighbors=4, weights="distance").fit(X, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sklearn_surface():
    m = KNNRegressorTPU(n_neighbors=7, weights="distance")
    p = m.get_params()
    assert p["n_neighbors"] == 7
    m.set_params(n_neighbors=3, weights="uniform")
    assert m.n_neighbors == 3 and m.weights == "uniform"
    with pytest.raises(ValueError):
        KNNRegressorTPU(weights="gaussian")
    KNNRegressorTPU(metric="manhattan")  # supported since round 5
    with pytest.raises(ValueError):
        KNNRegressorTPU(metric="chebyshev")


def test_cv_knn_sweep_with_tpu_backend(monkeypatch, tmp_path):
    """The CV harness's kNN sweep runs end-to-end on the TPU backend and
    lands in the same quality regime as sklearn's (identical math)."""
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    from vae_los_angeles_tpu.evaluation.cross_modality_cv import (
        run_cross_validation,
    )
    from vae_los_angeles_tpu.data.splits import kfold_indices

    rng = np.random.default_rng(0)
    X = rng.normal(size=(90, 11)).astype(np.float32)
    y = (X @ rng.normal(size=(11, 13)) * 0.1).astype(np.float32)
    site = rng.integers(0, 3, size=90)
    folds = kfold_indices(90, 3, seed=42)
    tpu_rows = run_cross_validation(
        X, y, site, [5], folds, "RNA -> DNA", model_type="knn"
    )
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    skl_rows = run_cross_validation(
        X, y, site, [5], folds, "RNA -> DNA", model_type="knn"
    )
    np.testing.assert_allclose(
        tpu_rows[0]["mean_MSE"], skl_rows[0]["mean_MSE"], rtol=1e-4
    )
