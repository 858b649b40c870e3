"""TPU standardization + PCA for the clustering scripts' reduction step.

The reference reduces the FULL-WIDTH feature matrix with host sklearn
StandardScaler → PCA before plotting/scoring (`/root/reference/src/
clustering_evaluation/cluster_reconstructed.py:140-187`; the t-SNE branch
PCA-50-preprocesses >50-dim inputs the same way). At cohort×methylome
scale that is an O(n·d·min(n,d)) host SVD on a matrix that, under
``KNN_BACKEND=tpu``, is already resident on the device for the metric
kernels (ops/cluster_metrics.py).

TPU-first formulation: with n ≪ d (thousands of samples, 20k-450k
features), the economy SVD of the centered matrix is the eigendecomposition
of its n×n Gram matrix — one MXU matmul (X_c X_cᵀ) plus an `eigh` whose
cost is independent of feature width. Scores = U_k·S_k, explained variance
ratio = λ_k / trace(G); the feature-space components are never formed
(nothing downstream uses them — the scripts consume scores only).

Sign convention: each score column is flipped so its max-|·| entry is
positive — deterministic, but NOT sklearn's svd_flip (which keys on the
randomized-solver factors). Downstream consumers (scatter plots, t-SNE
preprocessing, silhouette on embeddings) are sign-invariant; the parity
tests align signs before comparing.

Default stays host sklearn (reference-exact); ``KNN_BACKEND=tpu`` — the
repo's single evaluation-backend switch — opts in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.ops.knn import _device_put_cached


@jax.jit
def standardize_tpu(x) -> jax.Array:
    """sklearn-StandardScaler semantics on device: per-feature zero mean,
    population std (ddof=0); zero-variance features get scale 1."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    centered = x - mean
    std = jnp.sqrt(jnp.mean(centered * centered, axis=0, keepdims=True))
    return centered / jnp.where(std == 0.0, 1.0, std)


@functools.partial(jax.jit, static_argnames=("n_components",))
def _pca_gram(x, n_components: int):
    """(scores, explained_variance_ratio) via the n×n Gram eigh."""
    x = x.astype(jnp.float32)
    x_c = x - jnp.mean(x, axis=0, keepdims=True)
    gram = jnp.dot(x_c, x_c.T, preferred_element_type=jnp.float32)
    eigval, eigvec = jnp.linalg.eigh(gram)           # ascending
    lam = jnp.maximum(eigval[::-1][:n_components], 0.0)
    u = eigvec[:, ::-1][:, :n_components]
    scores = u * jnp.sqrt(lam)[None, :]
    # deterministic signs: max-|·| entry of each score column positive
    flip_idx = jnp.argmax(jnp.abs(scores), axis=0)
    signs = jnp.sign(
        jnp.take_along_axis(scores, flip_idx[None, :], axis=0)[0]
    )
    scores = scores * jnp.where(signs == 0.0, 1.0, signs)[None, :]
    total = jnp.maximum(jnp.trace(gram), jnp.finfo(jnp.float32).tiny)
    return scores, lam / total


class PCATPU:
    """sklearn-`PCA` surface for the fit_transform-only way the clustering
    scripts use it; `random_state` accepted for call-site compatibility
    (the Gram path is deterministic)."""

    def __init__(self, n_components: int = 2, random_state=None):
        self.n_components = n_components
        self.random_state = random_state
        self.explained_variance_ratio_ = None

    def fit_transform(self, X) -> np.ndarray:
        if isinstance(X, jax.Array):
            dev = X
        elif isinstance(X, np.ndarray):
            dev = _device_put_cached(X, lambda: np.asarray(X, np.float32))
        else:
            dev = jnp.asarray(np.asarray(X, np.float32))
        k = min(self.n_components, *dev.shape)
        scores, evr = _pca_gram(dev, k)
        self.explained_variance_ratio_ = np.asarray(jax.device_get(evr))
        return np.asarray(jax.device_get(scores))
