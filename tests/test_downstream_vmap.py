"""Vmapped downstream fold population (`fit_classifier_folds`) vs the
sequential per-fold path — the round-4 answer to the last un-parallelized
reference meta-loop (downstream_task.py:164-237: 8 scenarios × 5 sequential
StratifiedKFold MLP fits).

Both paths run the SAME fold core (`_make_fold_fit`), so per-fold val-acc
trajectories must agree to fp32 tolerance (bit-identical on CPU), padded
rows must be provably inert, and the scenario aggregates must match.
"""

import os

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


# ---------------------------------------------------------------------------
# Feature-width bucketing (round 4): scenario widths pad up to the 128-lane
# boundary the MXU pads to anyway, so near-sized widths (1177/1211) share one
# compiled executable — and can even join one vmapped population. Contract:
# the padded program is BIT-IDENTICAL to the true-width fit (zero input
# columns → zero fc1 grads → zero Adam drift on the pad rows).
# ---------------------------------------------------------------------------


def test_feature_bucket_ladder(monkeypatch):
    from vae_los_angeles_tpu.evaluation.mlp_classifier import feature_bucket

    monkeypatch.delenv("DOWNSTREAM_DIM_BUCKET", raising=False)
    assert feature_bucket(1177) == 1280
    assert feature_bucket(1211) == 1280  # shares 1177's executable
    assert feature_bucket(2388) == 2432
    assert feature_bucket(128) == 128
    monkeypatch.setenv("DOWNSTREAM_DIM_BUCKET", "0")
    assert feature_bucket(1177) == 1177


def test_bucketed_fit_bit_identical_to_unbucketed(monkeypatch):
    """dim=20 (bucket 128) with padding ON vs OFF: identical val-acc
    trajectory, identical predictions, and the pad weight rows stay
    exactly zero through training."""
    x, y = _fixture(n=90, dim=20, seed=7)
    cw = np.ones(N_CLASSES, np.float32)
    args = (x[:70], y[:70], x[70:], y[70:], N_CLASSES, cw,
            jax.random.PRNGKey(3))

    monkeypatch.setenv("DOWNSTREAM_DIM_BUCKET", "0")
    plain = fit_classifier(*args, num_epochs=EPOCHS)
    monkeypatch.delenv("DOWNSTREAM_DIM_BUCKET", raising=False)
    padded = fit_classifier(*args, num_epochs=EPOCHS)

    assert padded.params["fc1"]["w"].shape[0] == 128
    np.testing.assert_array_equal(
        np.asarray(padded.val_accs), np.asarray(plain.val_accs)
    )
    w = np.asarray(padded.params["fc1"]["w"])
    np.testing.assert_array_equal(w[:20], np.asarray(plain.params["fc1"]["w"]))
    assert not w[20:].any()  # pad rows never drift off zero
    np.testing.assert_array_equal(
        predict_classes(padded.params, x[70:]),
        predict_classes(plain.params, x[70:]),
    )


def test_mixed_width_population_matches_standalone():
    """Members of DIFFERENT true widths (20 and 28 → one 128 bucket) train
    as one population; each reproduces its standalone fit bit-for-bit."""
    x, y = _fixture(n=100, dim=28, seed=8)
    cw = np.ones(N_CLASSES, np.float32)
    members = [x[:, :20], x]  # widths 20, 28
    folds = [(m[:80], y[:80], m[80:], y[80:], cw) for m in members]
    fit = fit_classifier_folds(folds, N_CLASSES, num_epochs=EPOCHS)

    preds = predict_classes_folds(fit.params, [m[80:] for m in members])
    for i, m in enumerate(members):
        alone = fit_classifier(
            m[:80], y[:80], m[80:], y[80:], N_CLASSES, cw,
            jax.random.PRNGKey(i), num_epochs=EPOCHS,
        )
        np.testing.assert_array_equal(
            np.asarray(fit.val_accs[i]), np.asarray(alone.val_accs)
        )
        np.testing.assert_array_equal(
            preds[i], predict_classes(alone.params, m[80:])
        )


def test_bucketed_widths_share_one_executable():
    """Two scenario widths in the same bucket (20 and 28, same fold rows)
    must not compile a second program: the jit cache size is unchanged by
    the second width."""
    from vae_los_angeles_tpu.evaluation.mlp_classifier import (
        _build_classifier_fit_folds,
    )

    x, y = _fixture(n=100, dim=28, seed=9)
    cw = np.ones(N_CLASSES, np.float32)

    def run(width):
        m = x[:, :width]
        folds = [
            (m[:80], y[:80], m[80:], y[80:], cw),
            (m[:80], y[:80], m[80:], y[80:], cw),
        ]
        return fit_classifier_folds(folds, N_CLASSES, num_epochs=EPOCHS)

    run(20)
    from vae_los_angeles_tpu.evaluation.mlp_classifier import _bucket_fold_rows

    fit_fn = _build_classifier_fit_folds(
        "deep", EPOCHS, 32, _bucket_fold_rows(80), 20, True
    )
    size_before = fit_fn._cache_size()
    assert size_before > 0  # the builder key must match what run() built
    run(28)  # same 128 bucket → same shapes → zero new executables
    assert fit_fn._cache_size() == size_before


def test_row_bucketing_inert_and_shares_executables(monkeypatch):
    """Row-count bucketing (fold maxima padded up the `bucket_rows` ladder)
    must not change any result — true sizes are dynamic, masks exact — and
    two cohort sizes in one bucket must share the compiled program."""
    from vae_los_angeles_tpu.evaluation.mlp_classifier import (
        _bucket_fold_rows,
        _build_classifier_fit_folds,
    )

    x, y = _fixture(n=120, dim=20, seed=13)
    cw = np.ones(N_CLASSES, np.float32)

    def fit_at(n_train, n_val):
        return fit_classifier_folds(
            [(x[:n_train], y[:n_train], x[n_train:n_train + n_val],
              y[n_train:n_train + n_val], cw)],
            N_CLASSES, num_epochs=EPOCHS,
        )

    monkeypatch.setenv("EVAL_BUCKET", "0")
    plain = fit_at(85, 33)
    monkeypatch.delenv("EVAL_BUCKET", raising=False)
    bucketed = fit_at(85, 33)  # 85→96-row bucket, 33→36
    np.testing.assert_array_equal(
        np.asarray(plain.val_accs), np.asarray(bucketed.val_accs)
    )
    assert float(plain.best_val_acc[0]) == float(bucketed.best_val_acc[0])

    fit_fn = _build_classifier_fit_folds(
        "deep", EPOCHS, 32, _bucket_fold_rows(85), _bucket_fold_rows(33),
        True,
    )
    size_before = fit_fn._cache_size()
    assert size_before > 0
    fit_at(90, 35)  # same 96/36 buckets → zero new executables
    assert fit_fn._cache_size() == size_before


@pytest.mark.parametrize("unify", ["0", "1"])
def test_grouped_scenarios_match_per_scenario(monkeypatch, unify):
    """`run_scenarios_grouped` reproduces `run_classification_scenario`
    exactly for every scenario — same splits, same per-fold class weights,
    same PRNGKey(fold) seeding — in BOTH width policies: the default
    per-bucket populations (128 + 256 here) and the opt-in
    DOWNSTREAM_UNIFY_WIDTHS=1 global-bucket merge (mixed member widths in
    one program; the compile anti-result keeps it opt-in, but its
    numerics must stay bit-exact)."""
    from sklearn.preprocessing import LabelEncoder

    from vae_los_angeles_tpu.evaluation.downstream import (
        run_classification_scenario,
        run_scenarios_grouped,
    )

    monkeypatch.setenv("DOWNSTREAM_UNIFY_WIDTHS", unify)
    x, y = _fixture(n=120, dim=24, seed=11)
    le = LabelEncoder().fit(np.array(["A", "B", "C", "D"])[y])
    labels = le.transform(np.array(["A", "B", "C", "D"])[y]).astype(np.int64)
    scenarios = {
        "narrow": x[:, :10],            # bucket 128 (joins "full")
        "full": x,
        "wide": np.tile(x, (1, 7))[:, :160],   # bucket 256: 2nd width
    }
    grouped = run_scenarios_grouped(
        scenarios, labels, N_CLASSES, le, n_folds=3
    )
    assert list(grouped.keys()) == list(scenarios.keys())
    for name, data in scenarios.items():
        solo = run_classification_scenario(
            data, labels, N_CLASSES, name, le, n_folds=3, vmap_folds=True
        )
        assert grouped[name]["accuracy"] == pytest.approx(
            solo["accuracy"], abs=1e-6), name
        assert grouped[name]["accuracy_std"] == pytest.approx(
            solo["accuracy_std"], abs=1e-6), name
        for stat in ("precision", "recall", "f1-score"):
            assert grouped[name]["weighted avg"][stat] == pytest.approx(
                solo["weighted avg"][stat], abs=1e-6), name
        for cls in le.classes_:
            if cls in solo:
                assert grouped[name][cls]["f1-score"] == pytest.approx(
                    solo[cls]["f1-score"], abs=1e-6), name


def test_group_env_toggle(monkeypatch):
    from vae_los_angeles_tpu.evaluation.downstream import (
        _group_scenarios_default,
    )

    monkeypatch.delenv("DOWNSTREAM_GROUP", raising=False)
    assert _group_scenarios_default() is True
    monkeypatch.setenv("DOWNSTREAM_GROUP", "0")
    assert _group_scenarios_default() is False


def test_grouped_task_compiles_one_program_per_width_bucket(monkeypatch):
    """The round-4 program-count contract: a whole multi-scenario task
    compiles exactly ONE fold-population executable per bucketed feature
    width — scenarios and cohort paddings all reuse them."""
    import functools

    import vae_los_angeles_tpu.evaluation.mlp_classifier as mc
    from sklearn.preprocessing import LabelEncoder

    from vae_los_angeles_tpu.evaluation.downstream import (
        run_scenarios_grouped,
    )

    x, y = _fixture(n=110, dim=30, seed=17)
    le = LabelEncoder().fit(np.array(["A", "B", "C", "D"])[y])
    labels = le.transform(np.array(["A", "B", "C", "D"])[y]).astype(np.int64)
    scenarios = {  # widths 12/30 → bucket 128; 160 → bucket 256
        "narrow": x[:, :12],
        "full": x,
        "wide": np.tile(x, (1, 6))[:, :160],
    }

    def count_execs():
        built = {}
        orig = mc._build_classifier_fit_folds.__wrapped__

        @functools.lru_cache(maxsize=None)
        def tracking(*args):
            fn = orig(*args)
            built[args] = fn
            return fn

        old = mc._build_classifier_fit_folds
        mc._build_classifier_fit_folds = tracking
        try:
            run_scenarios_grouped(scenarios, labels, N_CLASSES, le, n_folds=3)
            return sum(f._cache_size() for f in built.values())
        finally:
            mc._build_classifier_fit_folds = old

    # default: one population per width bucket (merging the buckets into
    # one global-width program is a measured compile anti-result — RESULTS
    # round-5 downstream note — kept as an opt-in knob below)
    assert count_execs() == 2
    monkeypatch.setenv("DOWNSTREAM_UNIFY_WIDTHS", "1")
    assert count_execs() == 1  # numerics pinned in the parity test
