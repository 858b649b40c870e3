"""Downstream site classification from the DIRECTIONAL VAEs (reference
``downstream_task_directional.py``, 366 LoC).

Same task as `downstream.py`, but the estimated modalities come from the two
directional models — est-DNA from RNA2DNAVAE(rna, site) (reference :115-130),
est-RNA from DNA2RNAVAE(dna, site) (:133-148) — and the classifier is the
shallow 128-unit MLP trained for a fixed 20 epochs on a single stratified
80/20 split (:165-212). Four scenarios (:329-334); by default scenarios of
equal feature width train as one vmapped population (2 dispatches instead
of 4 sequential fits — `run_scenarios_vmapped`; ``DOWNSTREAM_VMAP=0``
restores the per-scenario loop).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.evaluation.downstream import (
    _vmap_folds_default,
    plot_comparison,
    plot_per_tissue_comparison,
    prepare_filtered_val_data,
)
from vae_los_angeles_tpu.evaluation.loading import load_dna2rna, load_rna2dna
from vae_los_angeles_tpu.evaluation.mlp_classifier import (
    feature_bucket,
    fit_classifier,
    fit_classifier_folds,
    predict_classes,
    predict_classes_folds,
)


def generate_estimated_dna(rna2dna_model, rna_data, labels):
    print("Generating estimated DNA methylation data...")
    est_dna, _, _ = rna2dna_model(rna=rna_data, site=labels)
    return est_dna


def generate_estimated_rna(dna2rna_model, dna_data, labels):
    print("Generating estimated RNA data...")
    est_rna, _, _ = dna2rna_model(dna=dna_data, site=labels)
    return est_rna


def run_classification_scenario(features, labels, n_classes, class_weights,
                                scenario_name, le_new, seed=42):
    """Single stratified 80/20 split, 20 fixed epochs (reference :165-212)."""
    from sklearn.metrics import classification_report
    from sklearn.model_selection import train_test_split

    print("\n" + "=" * 50)
    print(f"Scenario: {scenario_name}")
    print("=" * 50)

    X_train, X_test, y_train, y_test = train_test_split(
        features, labels, test_size=0.2, random_state=seed, stratify=labels
    )
    fit = fit_classifier(
        X_train, y_train, X_test, y_test, n_classes, class_weights,
        jax.random.PRNGKey(seed), arch="shallow", num_epochs=20,
        batch_size=32, lr=1e-3, weight_decay=0.0, early_stop=False,
    )
    y_pred = predict_classes(fit.params, X_test, arch="shallow")
    print("\nClassification Report:")
    print(
        classification_report(
            y_test, y_pred, target_names=le_new.classes_,
            labels=np.arange(len(le_new.classes_)), zero_division=0,
        )
    )
    return classification_report(
        y_test, y_pred, target_names=le_new.classes_,
        labels=np.arange(len(le_new.classes_)), output_dict=True, zero_division=0,
    )


def run_scenarios_vmapped(scenarios, labels, n_classes, class_weights,
                          le_new, seed=42):
    """Scenarios of equal feature width train as ONE vmapped population
    (each scenario is a "fold" of `fit_classifier_folds` — the split is
    identical across scenarios, only the feature matrix differs). The 4
    reference scenarios (widths 1177/2388/2388/2388,
    downstream_task_directional.py:329-334) become 2 dispatches. Per-fold
    key = PRNGKey(seed) for every scenario, exactly the sequential path's
    seeding, so results match it (bit-identical on CPU, tested)."""
    from sklearn.metrics import classification_report
    from sklearn.model_selection import train_test_split

    names = list(scenarios.keys())
    by_width = {}
    for name in names:
        # group by BUCKETED width: near-sized scenario widths (within one
        # 128-lane boundary) merge into one population — the mixed-width
        # member padding in `fit_classifier_folds` keeps each member's fit
        # bit-identical to its standalone run
        by_width.setdefault(
            feature_bucket(scenarios[name].shape[1]), []
        ).append(name)

    metrics_dict = {}
    for width, group in by_width.items():
        print("\n" + "=" * 50)
        print(f"Scenarios (vmapped population, width {width}): "
              + ", ".join(group))
        print("=" * 50)
        folds, tests = [], []
        for name in group:
            X_train, X_test, y_train, y_test = train_test_split(
                scenarios[name], labels, test_size=0.2, random_state=seed,
                stratify=labels,
            )
            folds.append((X_train, y_train, X_test, y_test, class_weights))
            tests.append((X_test, y_test))
        fit = fit_classifier_folds(
            folds, n_classes, arch="shallow", num_epochs=20, batch_size=32,
            lr=1e-3, weight_decay=0.0, early_stop=False,
            seeds=[seed] * len(group),
        )
        # pass the per-member list: widths inside a bucketed group may
        # differ, predict_classes_folds column-pads each member
        preds = predict_classes_folds(
            fit.params, [t[0] for t in tests], arch="shallow"
        )
        for i, name in enumerate(group):
            y_test = tests[i][1]
            report = classification_report(
                y_test, preds[i], target_names=le_new.classes_,
                labels=np.arange(len(le_new.classes_)), output_dict=True,
                zero_division=0,
            )
            print(f"\n{name}: accuracy {report['accuracy']:.4f}")
            metrics_dict[name] = report
    # report in the caller's scenario order
    return {name: metrics_dict[name] for name in names}


def main(cfg: Optional[Config] = None):
    from sklearn.utils.class_weight import compute_class_weight

    cfg = cfg or Config.from_env()
    rna2dna_model = load_rna2dna(cfg=cfg)
    dna2rna_model = load_dna2rna(cfg=cfg)
    if rna2dna_model is None or dna2rna_model is None:
        print("Error: both directional models must be trained first.")
        return None

    # orig_codes condition the VAEs (what they were trained on); `labels`
    # (re-encoded, contiguous) are the classification targets only
    rna_data, dna_data, labels, le_new, orig_codes = prepare_filtered_val_data(
        cfg, return_orig_codes=True
    )
    n_classes = len(le_new.classes_)
    cw = compute_class_weight("balanced", classes=np.unique(labels), y=labels)
    cw_full = np.ones(n_classes, np.float32)
    cw_full[np.unique(labels)] = cw

    print("\n" + "=" * 80)
    print("GENERATING ESTIMATED DATA")
    print("=" * 80)
    est_dna_data = generate_estimated_dna(rna2dna_model, rna_data, orig_codes)
    est_rna_data = generate_estimated_rna(dna2rna_model, dna_data, orig_codes)
    print(f"✓ Estimated DNA shape: {est_dna_data.shape}")
    print(f"✓ Estimated RNA shape: {est_rna_data.shape}")

    scenarios = {
        "Orig. RNA": rna_data,
        "Orig. RNA + Est. DNA": np.concatenate([rna_data, est_dna_data], axis=1),
        "Orig. DNA + Est. RNA": np.concatenate([dna_data, est_rna_data], axis=1),
        "Orig. RNA + Orig. DNA": np.concatenate([rna_data, dna_data], axis=1),
    }

    if _vmap_folds_default():
        metrics_dict = run_scenarios_vmapped(
            scenarios, labels, n_classes, cw_full, le_new
        )
    else:
        metrics_dict = {}
        for name, data in scenarios.items():
            metrics_dict[name] = run_classification_scenario(
                data, labels, n_classes, cw_full, name, le_new
            )

    run_tag = f"{rna2dna_model.run_id}_{dna2rna_model.run_id}"
    plot_comparison(
        metrics_dict, run_tag, out_subdir="downstream_task_directional",
        plots_dir=cfg.plots_dir,
    )
    plot_per_tissue_comparison(
        metrics_dict, le_new, run_tag, out_subdir="downstream_task_directional",
        plots_dir=cfg.plots_dir,
    )

    print("\nPerformance Summary:")
    for scenario_name, report in metrics_dict.items():
        print(f"\n{scenario_name}:")
        print(f"  Accuracy: {report['accuracy']:.4f}")
        print(f"  Weighted F1: {report['weighted avg']['f1-score']:.4f}")
    print("\nDownstream task complete!")
    return metrics_dict


if __name__ == "__main__":
    main()
