"""Metric parity vs sklearn/scipy (the reference's implementations)."""

import numpy as np
from scipy.stats import pearsonr
from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score
from sklearn.metrics.pairwise import cosine_similarity

from vae_los_angeles_tpu.ops import metrics


def _data(rng, n=40, d=17):
    y_true = rng.normal(size=(n, d)).astype(np.float32)
    y_pred = (y_true + 0.3 * rng.normal(size=(n, d))).astype(np.float32)
    return y_true, y_pred


def test_imputation_metrics_match_reference(rng):
    y_true, y_pred = _data(rng)
    got = metrics.compute_imputation_metrics(y_true, y_pred, "DNA", "VAE")

    yt, yp = y_true.flatten(), y_pred.flatten()
    assert got["Modality"] == "DNA" and got["Model"] == "VAE"
    np.testing.assert_allclose(got["MAE"], mean_absolute_error(yt, yp), rtol=1e-5)
    np.testing.assert_allclose(got["MSE"], mean_squared_error(yt, yp), rtol=1e-5)
    np.testing.assert_allclose(got["RMSE"], np.sqrt(mean_squared_error(yt, yp)), rtol=1e-5)
    np.testing.assert_allclose(got["R2"], r2_score(yt, yp), rtol=1e-4)
    np.testing.assert_allclose(
        got["CosineSimilarity"],
        float(np.diag(cosine_similarity(y_true, y_pred)).mean()),
        rtol=1e-5,
    )
    pearson_all = [pearsonr(y_true[i], y_pred[i])[0] for i in range(len(y_true))]
    np.testing.assert_allclose(got["PearsonMean"], np.mean(pearson_all), rtol=1e-4)
    np.testing.assert_allclose(got["PearsonStd"], np.std(pearson_all), rtol=1e-3)


def test_cv_metrics_match_reference(rng):
    y_true, y_pred = _data(rng)
    got = metrics.compute_cv_metrics(y_true, y_pred)
    np.testing.assert_allclose(got["Mean R2"], r2_score(y_true, y_pred), rtol=1e-4)
    np.testing.assert_allclose(
        got["Global R2"], r2_score(y_true.flatten(), y_pred.flatten()), rtol=1e-4
    )
    np.testing.assert_allclose(
        got["MSE"], mean_squared_error(y_true.flatten(), y_pred.flatten()), rtol=1e-5
    )
    np.testing.assert_allclose(
        got["MAE"], mean_absolute_error(y_true.flatten(), y_pred.flatten()), rtol=1e-5
    )
    tn = y_true / np.linalg.norm(y_true, axis=1, keepdims=True)
    pn = y_pred / np.linalg.norm(y_pred, axis=1, keepdims=True)
    np.testing.assert_allclose(got["Cosine Sim"], np.sum(tn * pn, axis=1).mean(), rtol=1e-5)
    pearson_all = [pearsonr(y_true[i], y_pred[i])[0] for i in range(len(y_true))]
    np.testing.assert_allclose(got["Pearson"], np.mean(pearson_all), rtol=1e-4)


def test_metrics_match_reference_fuzz(rng):
    """Random shapes, scales and degeneracies (constant rows/columns,
    near-identical pred, anticorrelated pred) vs the sklearn/scipy oracles."""
    import warnings

    for trial in range(25):
        n = int(rng.integers(2, 60))
        d = int(rng.integers(2, 50))
        scale = float(10.0 ** rng.integers(-2, 3))
        y_true = (scale * rng.normal(size=(n, d))).astype(np.float32)
        mode = trial % 4
        if mode == 0:
            y_pred = (y_true + 0.3 * scale * rng.normal(size=(n, d))).astype(np.float32)
        elif mode == 1:
            y_pred = (scale * rng.normal(size=(n, d))).astype(np.float32)  # unrelated
        elif mode == 2:
            y_pred = (-y_true + 1e-3).astype(np.float32)  # anticorrelated
        else:
            y_pred = y_true.copy()  # perfect
            # degenerate features use exactly-representable constants: with a
            # value like 0.1 the fp32 column mean rounds, sklearn's R²
            # denominator becomes denormal-but-nonzero and its score explodes
            # to ±1e13 — an sklearn artifact, not a convention to replicate
            y_true[rng.integers(n)] = 1.0  # constant true row
            if d >= 3:
                y_true[:, int(rng.integers(d))] = -2.0  # constant column

        got = metrics.compute_imputation_metrics(y_true, y_pred)
        cv = metrics.compute_cv_metrics(y_true, y_pred)
        yt, yp = y_true.flatten(), y_pred.flatten()
        np.testing.assert_allclose(
            got["MAE"], mean_absolute_error(yt, yp), rtol=1e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            got["MSE"], mean_squared_error(yt, yp), rtol=1e-4, atol=1e-7
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            np.testing.assert_allclose(
                cv["Mean R2"], r2_score(y_true, y_pred), rtol=1e-3, atol=1e-5
            )
            valid = [
                pearsonr(y_true[i], y_pred[i])[0]
                for i in range(n)
                if np.std(y_true[i]) > 0 and np.std(y_pred[i]) > 0
            ]
        if valid:
            np.testing.assert_allclose(
                got["PearsonMean"], np.mean(valid), rtol=1e-3, atol=1e-5,
                err_msg=f"trial {trial} mode {mode} n={n} d={d}",
            )


def test_pearson_skips_constant_rows(rng):
    """Reference skips NaN correlations (constant rows) — ours masks them."""
    y_true, y_pred = _data(rng, n=10)
    y_true[3] = 1.0  # constant row → undefined pearson
    got = metrics.compute_imputation_metrics(y_true, y_pred)
    valid = [
        pearsonr(y_true[i], y_pred[i])[0]
        for i in range(len(y_true))
        if np.std(y_true[i]) > 0
    ]
    np.testing.assert_allclose(got["PearsonMean"], np.mean(valid), rtol=1e-4)


def test_mean_r2_constant_column(rng):
    """sklearn convention: zero-variance true column contributes R²=0."""
    y_true, y_pred = _data(rng, n=12, d=5)
    y_true[:, 2] = 7.0
    got = metrics.compute_cv_metrics(y_true, y_pred)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = r2_score(y_true, y_pred)
    np.testing.assert_allclose(got["Mean R2"], want, rtol=1e-4)
