"""Vmapped downstream fold population (`fit_classifier_folds`) vs the
sequential per-fold path — the round-4 answer to the last un-parallelized
reference meta-loop (downstream_task.py:164-237: 8 scenarios × 5 sequential
StratifiedKFold MLP fits).

Both paths run the SAME fold core (`_make_fold_fit`), so per-fold val-acc
trajectories must agree to fp32 tolerance (bit-identical on CPU), padded
rows must be provably inert, and the scenario aggregates must match.
"""

import jax
import numpy as np
import pytest
from sklearn.model_selection import StratifiedKFold

from vae_los_angeles_tpu.evaluation.mlp_classifier import (
    _pad_rows,
    fit_classifier,
    fit_classifier_folds,
    predict_classes,
    predict_classes_folds,
)

N_CLASSES = 4
EPOCHS = 8


def _fixture(n=130, dim=20, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CLASSES, dim)).astype(np.float32)
    y = rng.integers(0, N_CLASSES, n)
    x = (centers[y] * 1.5 + rng.normal(size=(n, dim))).astype(np.float32)
    return x, y


def _folds(x, y, n_folds=3):
    splits = list(
        StratifiedKFold(n_folds, shuffle=True, random_state=42).split(x, y)
    )
    cw = np.ones(N_CLASSES, np.float32)
    return splits, [(x[tr], y[tr], x[va], y[va], cw) for tr, va in splits]


def test_vmapped_matches_sequential_per_fold():
    """Uneven StratifiedKFold folds (86/87/87 train rows): the vmapped
    population reproduces each sequential fit's whole val-acc trajectory
    and final predictions."""
    x, y = _fixture()
    splits, folds = _folds(x, y)
    fit = fit_classifier_folds(folds, N_CLASSES, num_epochs=EPOCHS)
    n_val_max = max(len(va) for _, va in splits)
    x_va = np.stack([_pad_rows(x[va], n_val_max) for _, va in splits])
    preds = predict_classes_folds(fit.params, x_va)

    for i, (tr, va) in enumerate(splits):
        seq = fit_classifier(
            x[tr], y[tr], x[va], y[va], N_CLASSES, folds[i][4],
            jax.random.PRNGKey(i), num_epochs=EPOCHS,
        )
        got = np.asarray(fit.val_accs[i])
        want = np.asarray(seq.val_accs)
        np.testing.assert_allclose(got, want, atol=1e-3, equal_nan=True)
        assert float(fit.best_val_acc[i]) == pytest.approx(
            float(seq.best_val_acc), abs=1e-3
        )
        seq_preds = predict_classes(seq.params, x[va])
        np.testing.assert_array_equal(preds[i, : len(va)], seq_preds)


def test_padded_rows_are_inert():
    """Filling the padding rows with garbage (1e30) must not change any
    fold's result — padded train rows are never gathered, padded val rows
    are `where`-masked out of every metric."""
    x, y = _fixture(seed=1)
    splits, folds = _folds(x, y)
    fit_clean = fit_classifier_folds(folds, N_CLASSES, num_epochs=EPOCHS)

    # hand-build the same stacks with poisoned padding via a fold whose
    # arrays are pre-padded with garbage — sizes must still differ, so
    # poison through monkeypatched _pad_rows instead of the public API
    import vae_los_angeles_tpu.evaluation.mlp_classifier as mod

    orig = mod._pad_rows

    def poison_pad(a, n_max):
        a = np.asarray(a)
        if len(a) == n_max:
            return a
        out = orig(a, n_max).copy()
        out[len(a):] = 1e30 if out.dtype.kind == "f" else 3
        return out

    mod._pad_rows = poison_pad
    try:
        fit_poisoned = fit_classifier_folds(folds, N_CLASSES, num_epochs=EPOCHS)
    finally:
        mod._pad_rows = orig

    np.testing.assert_allclose(
        np.asarray(fit_clean.val_accs), np.asarray(fit_poisoned.val_accs),
        atol=1e-6, equal_nan=True,
    )
    np.testing.assert_allclose(
        np.asarray(fit_clean.best_val_acc),
        np.asarray(fit_poisoned.best_val_acc), atol=1e-6,
    )


def test_scenario_aggregates_match():
    """`run_classification_scenario` vmapped vs sequential: identical
    aggregated classification reports (same folds, same seeds, same core)."""
    from sklearn.preprocessing import LabelEncoder

    from vae_los_angeles_tpu.evaluation.downstream import (
        run_classification_scenario,
    )

    x, y = _fixture(n=120, seed=2)
    le = LabelEncoder().fit(np.array(["A", "B", "C", "D"])[y])
    labels = le.transform(np.array(["A", "B", "C", "D"])[y]).astype(np.int64)

    vm = run_classification_scenario(
        x, labels, N_CLASSES, "vm", le, n_folds=3, vmap_folds=True
    )
    seq = run_classification_scenario(
        x, labels, N_CLASSES, "seq", le, n_folds=3, vmap_folds=False
    )
    assert vm["accuracy"] == pytest.approx(seq["accuracy"], abs=1e-6)
    for stat in ("precision", "recall", "f1-score"):
        assert vm["weighted avg"][stat] == pytest.approx(
            seq["weighted avg"][stat], abs=1e-6
        )
    for cls in le.classes_:
        if cls in seq:
            assert vm[cls]["f1-score"] == pytest.approx(
                seq[cls]["f1-score"], abs=1e-6
            )


def test_env_toggle(monkeypatch):
    from vae_los_angeles_tpu.evaluation.downstream import _vmap_folds_default

    monkeypatch.delenv("DOWNSTREAM_VMAP", raising=False)
    assert _vmap_folds_default() is True
    monkeypatch.setenv("DOWNSTREAM_VMAP", "0")
    assert _vmap_folds_default() is False
    monkeypatch.setenv("DOWNSTREAM_VMAP", "1")
    assert _vmap_folds_default() is True


def test_directional_scenarios_vmapped_match_sequential():
    """downstream_directional: width-grouped vmapped scenario populations
    reproduce the sequential per-scenario fits (same split, same seed-42
    key per scenario)."""
    from sklearn.preprocessing import LabelEncoder

    from vae_los_angeles_tpu.evaluation.downstream_directional import (
        run_classification_scenario,
        run_scenarios_vmapped,
    )

    x, y = _fixture(n=120, dim=24, seed=5)
    le = LabelEncoder().fit(np.array(["A", "B", "C", "D"])[y])
    labels = le.transform(np.array(["A", "B", "C", "D"])[y]).astype(np.int64)
    cw = np.ones(N_CLASSES, np.float32)
    scenarios = {
        "narrow": x[:, :10],             # width 10 (group of 1)
        "wide-a": x,                     # width 24 (group of 2)
        "wide-b": x[:, ::-1].copy(),
    }
    vm = run_scenarios_vmapped(scenarios, labels, N_CLASSES, cw, le)
    assert list(vm.keys()) == list(scenarios.keys())  # caller's order kept
    for name, data in scenarios.items():
        seq = run_classification_scenario(
            data, labels, N_CLASSES, cw, name, le
        )
        assert vm[name]["accuracy"] == pytest.approx(
            seq["accuracy"], abs=1e-6), name
        assert vm[name]["weighted avg"]["f1-score"] == pytest.approx(
            seq["weighted avg"]["f1-score"], abs=1e-6), name
