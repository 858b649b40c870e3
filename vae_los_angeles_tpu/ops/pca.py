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

Routed by the ``EVAL_BACKEND`` policy (alias ``KNN_BACKEND``):
``auto`` by default — host sklearn below the measured ~1k-row crossover
(reference scale stays reference-exact) and on non-TPU hosts, the device
kernels above it on the chip; ``sklearn``/``tpu`` force a side
(ops/backend.resolve_eval_backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.ops.knn import _device_put_cached, _eval_mesh


def _col_sharded_features(features, mesh, n_pad=None) -> jax.Array:
    """FEATURE-axis-sharded device copy, columns padded to a multiple of
    the mesh size with zeros (and rows optionally bucket-padded to
    ``n_pad`` for executable sharing).

    The feature dimension is this domain's "long-context" axis (SURVEY §5:
    no sequence axis exists; width is what grows, to 450k at whole-methylome
    scale), and it is the natural shard for the reduction step: per-feature
    scaling sees all rows of its local columns (zero collectives), and the
    n×n Gram contraction sums over features, so GSPMD turns the col-sharded
    matmul into local partial Grams + one all-reduce. Zero pad columns are
    exactly inert: scale-1 zero features contribute nothing to the Gram or
    its trace. Host numpy inputs reuse the put cache (keyed on sharding)."""
    from jax.sharding import NamedSharding, PartitionSpec

    nd = mesh.devices.size
    n, d = features.shape
    n_pad = n if n_pad is None else n_pad
    d_pad = -(-d // nd) * nd
    sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
    pad = ((0, n_pad - n), (0, d_pad - d))
    if isinstance(features, jax.Array):
        return jax.device_put(
            jnp.pad(features.astype(jnp.float32), pad), sharding)
    host = features if isinstance(features, np.ndarray) else np.asarray(
        features, np.float32)
    return _device_put_cached(
        host,
        lambda: np.pad(np.asarray(host, np.float32), pad),
        sharding=sharding,
        salt=("rowpad", n_pad),
    )


def device_scaled_features(features, shard=None) -> jax.Array:
    """StandardScaler semantics on device; on multi-chip hosts the feature
    axis auto-shards over the chips so cohort×methylome-width matrices that
    exceed one chip's HBM stay scalable (``shard=False`` forces
    single-chip, the same policy knob as the other evaluation kernels).
    Rows are bucket-padded up the executable-sharing ladder
    (ops/backend.bucket_rows) with mask-exact statistics, so near-sized
    cohorts reuse the compiled program; the returned array is sliced back
    to the true row count."""
    from vae_los_angeles_tpu.ops.backend import bucket_rows
    from vae_los_angeles_tpu.ops.knn import _row_padded_put

    n = len(features)
    n_pad = bucket_rows(n)
    mesh = _eval_mesh(shard)
    if mesh is not None:
        x = _col_sharded_features(features, mesh, n_pad)
    else:
        x = _row_padded_put(features, n_pad)
    out = standardize_tpu(x, np.int32(n))
    return out if n_pad == n else out[:n]


@jax.jit
def standardize_tpu(x, n_valid=None) -> jax.Array:
    """sklearn-StandardScaler semantics on device: per-feature zero mean,
    population std (ddof=0); zero-variance features get scale 1. Rows
    at/past ``n_valid`` are bucket padding: excluded from the statistics,
    zeroed in the output (mask-exact — the valid rows match the unpadded
    program bit-for-bit up to reduction order)."""
    x = x.astype(jnp.float32)
    if n_valid is None:
        n_valid = x.shape[0]
    mask = (jnp.arange(x.shape[0]) < n_valid)[:, None].astype(x.dtype)
    cnt = jnp.asarray(n_valid, jnp.float32)
    mean = jnp.sum(x * mask, axis=0, keepdims=True) / cnt
    centered = (x - mean) * mask
    std = jnp.sqrt(jnp.sum(centered * centered, axis=0, keepdims=True) / cnt)
    return centered / jnp.where(std == 0.0, 1.0, std)


@functools.partial(jax.jit, static_argnames=("n_components", "prec"))
def _pca_gram(x, n_valid, n_components: int, prec=None):
    """(scores, explained_variance_ratio) via the n×n Gram eigh. Rows
    at/past ``n_valid`` are bucket padding: masked out of the centering and
    exactly zero in the Gram (zero rows/cols add zero eigenvalues, which
    sort below the real spectrum), so the valid-row scores equal the
    unpadded program's. ``prec`` is the Gram matmul's MXU precision
    (ops/backend.eval_matmul_precision — HIGHEST by default so the
    spectrum matches sklearn's fp32/fp64 host SVD)."""
    x = x.astype(jnp.float32)
    mask = (jnp.arange(x.shape[0]) < n_valid)[:, None].astype(x.dtype)
    cnt = jnp.asarray(n_valid, jnp.float32)
    mean = jnp.sum(x * mask, axis=0, keepdims=True) / cnt
    x_c = (x - mean) * mask
    gram = jnp.dot(x_c, x_c.T, preferred_element_type=jnp.float32,
                   precision=prec)
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


@functools.partial(jax.jit, static_argnames=("n_components", "prec"))
def pca_scores_members(x_members, n_valid, n_components: int, prec=None):
    """`_pca_gram` over a leading MEMBER axis: (M, n_pad, d) → ((M, n_pad,
    k), (M, k)). The clustering capstone's methods share one cohort shape
    after imputation, so their reductions batch into ONE dispatch (the
    batched Gram matmuls ride the MXU together; eigh batches natively).
    Same masked bucket-padding semantics as `_pca_gram`."""
    return jax.vmap(
        lambda xm: _pca_gram(xm, n_valid, n_components, prec)
    )(x_members)


@jax.jit
def standardize_members(x_members, n_valid):
    """`standardize_tpu` over a leading member axis in one dispatch."""
    return jax.vmap(lambda xm: standardize_tpu(xm, n_valid))(x_members)


class PCATPU:
    """sklearn-`PCA` surface for the fit_transform-only way the clustering
    scripts use it; `random_state` accepted for call-site compatibility
    (the Gram path is deterministic). Rows bucket-pad up the
    executable-sharing ladder (mask-exact; see `_pca_gram`)."""

    def __init__(self, n_components: int = 2, random_state=None):
        self.n_components = n_components
        self.random_state = random_state
        self.explained_variance_ratio_ = None

    def fit_transform(self, X) -> np.ndarray:
        from vae_los_angeles_tpu.ops.backend import bucket_rows
        from vae_los_angeles_tpu.ops.knn import _row_padded_put

        n = len(X)
        n_pad = bucket_rows(n)
        if isinstance(X, jax.Array):
            dev = X if n_pad == n else jnp.pad(X, ((0, n_pad - n), (0, 0)))
        else:
            dev = _row_padded_put(
                X if isinstance(X, np.ndarray) else np.asarray(X, np.float32),
                n_pad,
            )
        from vae_los_angeles_tpu.ops.backend import eval_matmul_precision

        k = min(self.n_components, n, dev.shape[1])
        scores, evr = _pca_gram(dev, np.int32(n), k,
                                eval_matmul_precision())
        self.explained_variance_ratio_ = np.asarray(jax.device_get(evr))
        return np.asarray(jax.device_get(scores))[:n]
