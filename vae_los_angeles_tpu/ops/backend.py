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
