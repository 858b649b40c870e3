"""EVAL_BACKEND / KNN_BACKEND resolution (`ops/backend.py`).

`EVAL_BACKEND` is the canonical spelling; `KNN_BACKEND` is the permanent
legacy alias (the switch predates the non-kNN evaluation kernels). Both
spellings must route every resolver, EVAL_BACKEND must win when both are
set, and typos must raise rather than silently fall back to sklearn.
"""

import pytest

from vae_los_angeles_tpu.ops.backend import eval_backend, tpu_eval_backend


def _clear(monkeypatch):
    monkeypatch.delenv("EVAL_BACKEND", raising=False)
    monkeypatch.delenv("KNN_BACKEND", raising=False)


def test_default_is_auto(monkeypatch):
    """auto is the default: reference-exact sklearn below the measured
    crossover (incl. unknown scale), TPU kernels at/above it — but only
    when a TPU is actually the backend (the crossover is a chip
    measurement; a CPU-only host must never auto-route to the device
    kernels)."""
    import jax

    from vae_los_angeles_tpu.ops.backend import (
        AUTO_CROSSOVER_ROWS,
        resolve_eval_backend,
    )

    _clear(monkeypatch)
    assert eval_backend() == "auto"
    # the test suite runs on the CPU backend: auto must resolve sklearn
    # at EVERY scale here
    assert resolve_eval_backend(4096) == "sklearn"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_eval_backend() == "sklearn"          # unknown scale
    assert resolve_eval_backend(128) == "sklearn"       # capstone small
    assert resolve_eval_backend(890) == "sklearn"       # reference scale
    assert resolve_eval_backend(1024) == "tpu"          # capstone large
    assert resolve_eval_backend(AUTO_CROSSOVER_ROWS) == "tpu"
    assert not tpu_eval_backend()
    assert not tpu_eval_backend(128)
    assert tpu_eval_backend(4096)


def test_forced_backends_ignore_scale(monkeypatch):
    from vae_los_angeles_tpu.ops.backend import resolve_eval_backend

    _clear(monkeypatch)
    monkeypatch.setenv("EVAL_BACKEND", "sklearn")
    assert resolve_eval_backend(10_000) == "sklearn"
    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    assert resolve_eval_backend(8) == "tpu"


def test_auto_routes_resolvers_by_scale(monkeypatch):
    """The capstone contract: with NO backend env set, each resolver picks
    the measured winner for its cohort scale (round-4 capstone crossover:
    sklearn wins n=128, TPU wins n=1024). TPU backend simulated — on a
    CPU-only host auto resolves sklearn at every scale."""
    import jax

    _clear(monkeypatch)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    from sklearn.manifold import TSNE
    from sklearn.metrics import silhouette_score
    from sklearn.neighbors import KNeighborsRegressor

    from vae_los_angeles_tpu.ops.cluster_metrics import (
        resolve_silhouette,
        silhouette_score_tpu,
    )
    from vae_los_angeles_tpu.ops.knn import (
        KNNRegressorTPU,
        resolve_knn_regressor,
    )
    from vae_los_angeles_tpu.ops.tsne import TSNETPU, resolve_tsne

    assert resolve_knn_regressor(128) is KNeighborsRegressor
    assert resolve_knn_regressor(1024) is KNNRegressorTPU
    assert resolve_silhouette(128) is silhouette_score
    assert resolve_silhouette(1024) is silhouette_score_tpu
    assert resolve_tsne(128) is TSNE
    assert resolve_tsne(1024) is TSNETPU


@pytest.mark.parametrize("var", ["EVAL_BACKEND", "KNN_BACKEND"])
def test_both_spellings_route(monkeypatch, var):
    _clear(monkeypatch)
    monkeypatch.setenv(var, "tpu")
    assert eval_backend() == "tpu"
    monkeypatch.setenv(var, "sklearn")
    assert eval_backend() == "sklearn"
    monkeypatch.setenv(var, "TPU")  # case-insensitive like the old switch
    assert eval_backend() == "tpu"


def test_eval_backend_wins_over_alias(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("EVAL_BACKEND", "sklearn")
    monkeypatch.setenv("KNN_BACKEND", "tpu")
    assert eval_backend() == "sklearn"
    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    monkeypatch.setenv("KNN_BACKEND", "sklearn")
    assert eval_backend() == "tpu"


def test_empty_means_default(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("EVAL_BACKEND", "")
    assert eval_backend() == "auto"


@pytest.mark.parametrize("var", ["EVAL_BACKEND", "KNN_BACKEND"])
def test_typo_raises(monkeypatch, var):
    _clear(monkeypatch)
    monkeypatch.setenv(var, "bogus")
    with pytest.raises(ValueError, match=var):
        eval_backend()


def test_every_resolver_honors_canonical_spelling(monkeypatch):
    """The canonical env var must reach all five TPU-routable resolvers."""
    _clear(monkeypatch)
    from vae_los_angeles_tpu.ops.cluster_metrics import (
        resolve_silhouette,
        silhouette_score_tpu,
    )
    from vae_los_angeles_tpu.ops.knn import (
        ConditionedKNNRegressorTPU,
        KNNRegressorTPU,
        resolve_conditioned_knn,
        resolve_knn_regressor,
    )
    from vae_los_angeles_tpu.ops.tsne import TSNETPU, resolve_tsne

    monkeypatch.setenv("EVAL_BACKEND", "tpu")
    assert resolve_knn_regressor() is KNNRegressorTPU
    assert resolve_conditioned_knn() is ConditionedKNNRegressorTPU
    assert resolve_silhouette() is silhouette_score_tpu
    assert resolve_tsne() is TSNETPU

    monkeypatch.setenv("EVAL_BACKEND", "sklearn")
    from sklearn.manifold import TSNE
    from sklearn.metrics import silhouette_score
    from sklearn.neighbors import KNeighborsRegressor

    assert resolve_knn_regressor() is KNeighborsRegressor
    assert resolve_silhouette() is silhouette_score
    assert resolve_tsne() is TSNE


def test_eval_matmul_precision(monkeypatch):
    """EVAL_PRECISION: HIGHEST by default (on-chip neighbor-RANKING parity
    — the TPU's 1-pass-bf16 default picks different neighbors than sklearn,
    measured max |kNN error| 0.74 on the real chip; RESULTS.md round-4
    precision ledger), 'default' opts out, typos raise."""
    import jax

    from vae_los_angeles_tpu.ops.backend import eval_matmul_precision

    monkeypatch.delenv("EVAL_PRECISION", raising=False)
    assert eval_matmul_precision() is jax.lax.Precision.HIGHEST
    monkeypatch.setenv("EVAL_PRECISION", "highest")
    assert eval_matmul_precision() is jax.lax.Precision.HIGHEST
    monkeypatch.setenv("EVAL_PRECISION", "default")
    assert eval_matmul_precision() is None
    monkeypatch.setenv("EVAL_PRECISION", "bf16")
    with pytest.raises(ValueError, match="EVAL_PRECISION"):
        eval_matmul_precision()


def test_eval_precision_default_mode_runs(monkeypatch):
    """EVAL_PRECISION=default still computes correct results on CPU (where
    precision is a no-op) — the knob must not break any kernel path."""
    import numpy as np
    from sklearn.neighbors import KNeighborsRegressor

    from vae_los_angeles_tpu.ops.knn import KNNRegressorTPU

    monkeypatch.setenv("EVAL_PRECISION", "default")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 9)).astype(np.float32)
    y = rng.normal(size=(120, 2)).astype(np.float32)
    q = rng.normal(size=(25, 9)).astype(np.float32)
    want = KNeighborsRegressor(4).fit(x, y).predict(q)
    got = KNNRegressorTPU(4, shard=False).fit(x, y).predict(q)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
