"""Vectorized evaluation metrics.

One jnp expression each, replacing the reference's host-side
sklearn/scipy implementations — in particular the per-sample scipy
``pearsonr`` Python loop (reference vae_cross_modality_cv.py:92-98 and
compare_directional_imputation.py:184-190, the #2 hot loop in SURVEY §3.4)
becomes a single reduction over the batch axis.

Semantics match sklearn/scipy:
  * ``r2`` on flattened arrays ↔ ``r2_score(y_true.flatten(), ...)``;
    ``mean_r2`` ↔ ``r2_score(y_true, y_pred)`` (uniform average of
    per-column R², with sklearn's ss_tot==0 → 0 convention).
  * ``pearson_per_sample`` drops rows whose correlation is undefined
    (zero variance), like the reference's NaN-skipping try/except.
  * ``cosine_rowwise`` is the diagonal of sklearn's pairwise
    cosine_similarity.

`compute_imputation_metrics` reproduces the exact dict structure of
``compare_directional_imputation.py:195-205`` (MAE/MSE/RMSE/R2/
CosineSimilarity/PearsonMean/PearsonStd); `compute_cv_metrics` reproduces
``vae_cross_modality_cv.py:101-108`` (Mean R2/Global R2/MSE/MAE/Cosine Sim/
Pearson).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 0.0  # exact parity: no fudge terms; undefined rows are masked instead


def mse(y_true, y_pred):
    return jnp.mean(jnp.square(y_true - y_pred))


def mae(y_true, y_pred):
    return jnp.mean(jnp.abs(y_true - y_pred))


def r2_global(y_true, y_pred):
    """R² over the flattened arrays."""
    yt = y_true.reshape(-1)
    yp = y_pred.reshape(-1)
    ss_res = jnp.sum(jnp.square(yt - yp))
    ss_tot = jnp.sum(jnp.square(yt - jnp.mean(yt)))
    return jnp.where(ss_tot > 0, 1.0 - ss_res / jnp.where(ss_tot > 0, ss_tot, 1.0), 0.0)


def r2_mean(y_true, y_pred):
    """Uniform average of per-column R² (sklearn multioutput default).

    sklearn's constant-column rule: ss_tot==0 scores 1.0 when the residual
    is also ~0 (perfect prediction of a constant) and 0.0 otherwise.
    """
    ss_res = jnp.sum(jnp.square(y_true - y_pred), axis=0)
    ss_tot = jnp.sum(jnp.square(y_true - jnp.mean(y_true, axis=0)), axis=0)
    degenerate = jnp.where(ss_res < 1e-12, 1.0, 0.0)
    r2_cols = jnp.where(
        ss_tot > 0,
        1.0 - ss_res / jnp.where(ss_tot > 0, ss_tot, 1.0),
        degenerate,
    )
    return jnp.mean(r2_cols)


def cosine_rowwise_mean(y_true, y_pred):
    """Mean over samples of cosine similarity between matching rows.

    Zero-norm rows contribute 0, matching sklearn's ``cosine_similarity``
    (whose ``normalize`` leaves all-zero rows as zero vectors).
    """
    t_norm = jnp.linalg.norm(y_true, axis=1, keepdims=True)
    p_norm = jnp.linalg.norm(y_pred, axis=1, keepdims=True)
    tn = y_true / jnp.where(t_norm > 0, t_norm, 1.0)
    pn = y_pred / jnp.where(p_norm > 0, p_norm, 1.0)
    return jnp.mean(jnp.sum(tn * pn, axis=1))


def pearson_per_sample(y_true, y_pred):
    """Per-row Pearson r and a validity mask (False where undefined)."""
    tc = y_true - jnp.mean(y_true, axis=1, keepdims=True)
    pc = y_pred - jnp.mean(y_pred, axis=1, keepdims=True)
    num = jnp.sum(tc * pc, axis=1)
    den = jnp.sqrt(jnp.sum(jnp.square(tc), axis=1) * jnp.sum(jnp.square(pc), axis=1))
    valid = den > 0
    r = jnp.where(valid, num / jnp.where(valid, den, 1.0), 0.0)
    return r, valid


def pearson_mean_std(y_true, y_pred):
    """Mean and population std of valid per-sample Pearson correlations."""
    r, valid = pearson_per_sample(y_true, y_pred)
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(jnp.where(valid, r, 0.0)) / n
    var = jnp.sum(jnp.where(valid, jnp.square(r - mean), 0.0)) / n
    return mean, jnp.sqrt(var)


@jax.jit
def _imputation_metrics_device(y_true, y_pred):
    m_mse = mse(y_true, y_pred)
    pm, ps = pearson_mean_std(y_true, y_pred)
    return {
        "MAE": mae(y_true, y_pred),
        "MSE": m_mse,
        "RMSE": jnp.sqrt(m_mse),
        "R2": r2_global(y_true, y_pred),
        "CosineSimilarity": cosine_rowwise_mean(y_true, y_pred),
        "PearsonMean": pm,
        "PearsonStd": ps,
    }


def compute_imputation_metrics(y_true, y_pred, modality_name=None, model_name=None):
    """Metric dict matching compare_directional_imputation.py:195-205."""
    vals = jax.device_get(
        _imputation_metrics_device(jnp.asarray(y_true), jnp.asarray(y_pred))
    )
    out = {}
    if modality_name is not None:
        out["Modality"] = modality_name
    if model_name is not None:
        out["Model"] = model_name
    out.update({k: float(v) for k, v in vals.items()})
    return out


@jax.jit
def _cv_metrics_device(y_true, y_pred):
    pm, _ = pearson_mean_std(y_true, y_pred)
    return {
        "Mean R2": r2_mean(y_true, y_pred),
        "Global R2": r2_global(y_true, y_pred),
        "MSE": mse(y_true, y_pred),
        "MAE": mae(y_true, y_pred),
        "Cosine Sim": cosine_rowwise_mean(y_true, y_pred),
        "Pearson": pm,
    }


def compute_cv_metrics(y_true, y_pred):
    """Metric dict matching vae_cross_modality_cv.py:101-108."""
    vals = jax.device_get(_cv_metrics_device(jnp.asarray(y_true), jnp.asarray(y_pred)))
    return {k: float(v) for k, v in vals.items()}
