"""Evaluation backend switch: ``EVAL_BACKEND`` (alias: ``KNN_BACKEND``).

One env var governs every TPU-routable evaluation component — the kNN
baselines (`ops/knn.py`), silhouette/NH clustering metrics
(`ops/cluster_metrics.py`), the scaler→PCA reduction (`ops/pca.py`) and
the t-SNE embedding (`ops/tsne.py`). The switch started life as
``KNN_BACKEND`` when it only routed the kNN baselines (reference
`src/knn_comparison/run_comparison.py:56-94`); it has since grown to cover
the full clustering-evaluation stack, so the canonical spelling is now
``EVAL_BACKEND``. ``KNN_BACKEND`` remains a permanent alias (consulted when
``EVAL_BACKEND`` is unset) so existing scripts keep working — see
docs/MIGRATION.md.

Values: ``sklearn`` (default; host-side, reference-exact) or ``tpu``
(MXU kernels, sklearn-parity-tested).
"""

from __future__ import annotations

import os

_VALID = ("sklearn", "tpu")


def eval_backend() -> str:
    """Resolve the evaluation backend from the environment.

    ``EVAL_BACKEND`` wins; ``KNN_BACKEND`` is the deprecated-but-permanent
    alias; unset/empty means ``sklearn``. Raises on any other value so typos
    never silently fall back to the host path.
    """
    raw = os.getenv("EVAL_BACKEND")
    name = "EVAL_BACKEND"
    if raw is None:
        raw = os.getenv("KNN_BACKEND")
        name = "KNN_BACKEND"
    backend = (raw or "sklearn").lower()
    if backend == "":
        return "sklearn"
    if backend in _VALID:
        return backend
    raise ValueError(
        f"{name}={backend!r}; valid: sklearn (default), tpu"
    )


def tpu_eval_backend() -> bool:
    """True when the TPU evaluation kernels are selected."""
    return eval_backend() == "tpu"


def eval_bucket_enabled() -> bool:
    """Row-count bucketing for the evaluation kernels (``EVAL_BUCKET``,
    default on; ``EVAL_BUCKET=0`` disables).

    Every evaluation program's executable is keyed on the cohort's row
    count, and on the relay a never-seen program costs minutes of compile
    (RESULTS.md compile ledger) — so two cohorts of 850 and 1000 samples
    would each pay the full cold stack. Bucketing pads rows up to a
    geometric ladder (≤ ~17% waste) with exact masking, so near-sized
    cohorts share every compiled program."""
    return os.getenv("EVAL_BUCKET", "1") != "0"


def eval_matmul_precision():
    """`jax.lax.Precision` for the evaluation kernels' distance/Gram
    matmuls (``EVAL_PRECISION``: ``highest`` by default, ``default`` opts
    out).

    TPU MXUs execute an fp32-input matmul as ONE bf16 pass by default
    (~8 mantissa bits). For the evaluation kernels that is not a rounding
    footnote: neighbor SELECTION (kNN / neighborhood-hit `top_k`) ranks
    near-tied distances, and on concentrated data the bf16 pass permutes
    the ranking vs sklearn's host fp32/fp64 computation — measured on the
    real chip as max |kNN prediction error| 0.74 on N(0,1) data at dim=64
    (wrong neighbors, not roundoff; benchmarks/RESULTS.md round-4
    precision ledger). ``highest`` (6-pass bf16 ≈ true fp32) restores
    sklearn parity and is nearly free in the relay-dispatch-bound regimes
    these kernels run in; ``EVAL_PRECISION=default`` opts into the raw
    single-pass MXU mode for matmul-bound sweeps that tolerate ranking
    drift. Returns a static-hashable value for jit cache keys (the
    Precision enum, or None for the backend default).
    """
    import jax

    raw = os.getenv("EVAL_PRECISION", "highest").lower()
    if raw in ("", "highest"):
        return jax.lax.Precision.HIGHEST
    if raw == "default":
        return None
    raise ValueError(
        f"EVAL_PRECISION={raw!r}; valid: highest (default), default"
    )


# per-octave mantissas: ratio ≤ 1.17 between consecutive buckets
_BUCKET_MANTISSAS = (16, 18, 21, 24, 28)


def bucket_rows(n: int, enabled=None) -> int:
    """Smallest ladder value ≥ n (identity below 32 rows or when
    bucketing is disabled). Ladder: {16,18,21,24,28}·2^e — consecutive
    steps within 17%, so padded waste is bounded and near-sized cohorts
    land in the same bucket."""
    if n <= 32:
        return n
    if not (eval_bucket_enabled() if enabled is None else enabled):
        return n
    octave = 1
    while True:
        for m in _BUCKET_MANTISSAS:
            b = m * octave
            if b >= n:
                return b
        octave *= 2
