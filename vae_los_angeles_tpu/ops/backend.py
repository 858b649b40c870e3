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

Values: ``auto`` (default — per call-site scale, see
`resolve_eval_backend`), ``sklearn`` (host-side, reference-exact) or
``tpu`` (MXU kernels, sklearn-parity-tested).
"""

from __future__ import annotations

import os

_VALID = ("sklearn", "tpu", "auto")

# Measured crossover (RESULTS.md round-4 clustering capstone, single v5e
# behind the relay): at n=128 cohorts sklearn's whole capstone beat the
# warm TPU one 17.6 s vs 42.7 s (per-dispatch relay latency dominates tiny
# problems); at n=1024 the TPU won 36.8 s vs 67.3 s and the gap widens with
# n² work. ~1k rows is the break-even for the O(n²·dim) evaluation kernels.
AUTO_CROSSOVER_ROWS = 1000


def eval_backend() -> str:
    """Resolve the evaluation backend from the environment.

    ``EVAL_BACKEND`` wins; ``KNN_BACKEND`` is the deprecated-but-permanent
    alias; unset/empty means ``auto``. Raises on any other value so typos
    never silently fall back to the host path.
    """
    raw = os.getenv("EVAL_BACKEND")
    name = "EVAL_BACKEND"
    if raw is None:
        raw = os.getenv("KNN_BACKEND")
        name = "KNN_BACKEND"
    backend = (raw or "auto").lower()
    if backend == "":
        return "auto"
    if backend in _VALID:
        return backend
    raise ValueError(
        f"{name}={backend!r}; valid: auto (default), sklearn, tpu"
    )


def resolve_eval_backend(n_rows=None) -> str:
    """Concrete backend ("sklearn" | "tpu") for a call site of known scale.

    ``sklearn``/``tpu`` force that backend regardless of scale. ``auto``
    (the default) picks the MEASURED winner: host sklearn below
    `AUTO_CROSSOVER_ROWS` (the relay's per-dispatch latency swamps tiny
    O(n²) problems — round-4 capstone, n=128: sklearn 17.6 s vs TPU-warm
    42.7 s), the TPU kernels at or above it (n=1024: TPU 36.8 s vs
    67.3 s). Reference-scale cohorts (~890 samples) resolve to sklearn, so
    ``auto`` is reference-exact at reference scale. A call site that
    cannot state its scale (``n_rows=None``) resolves to sklearn — the
    conservative, reference-exact side.
    """
    backend = eval_backend()
    if backend != "auto":
        return backend
    if n_rows is None or n_rows < AUTO_CROSSOVER_ROWS:
        return "sklearn"
    import jax

    # the crossover is a TPU measurement: on hosts without an accelerator
    # the device kernels run on the XLA CPU backend where sklearn wins at
    # every scale — auto must never route there (forced `tpu` still can)
    if jax.default_backend() != "tpu":
        return "sklearn"
    return "tpu"


def tpu_eval_backend(n_rows=None) -> bool:
    """True when the TPU evaluation kernels are selected for this scale."""
    return resolve_eval_backend(n_rows) == "tpu"


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
