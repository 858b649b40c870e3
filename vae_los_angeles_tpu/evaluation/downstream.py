"""Downstream task: primary-site classification from original vs estimated
modalities (reference ``downstream_task.py``, 456 LoC).

Pipeline (reference :399-456): take the shared validation split, drop classes
with <2 samples and re-encode labels; generate estimated DNA via
``MultiModalVAE(a=tpm)`` and estimated RNA via ``(b=beta)``; run 8 feature
scenarios (orig/est × RNA/DNA combos, :436-445) through a 5-fold
StratifiedKFold deep-MLP classifier with per-fold balanced class weights and
early stopping on val accuracy; aggregate sklearn classification_reports
across folds; emit grouped-bar comparison and per-tissue-F1 plots.

The MLP classifier is the fused-scan JAX trainer in `mlp_classifier`. By
default ALL scenarios of one bucketed feature width train as ONE vmapped
(scenario × fold) population (`run_scenarios_grouped`): the reference's
8×5 = 40 sequential MLP fits become 2 dispatches / 2 compiled executables
(widths pad to the 128-lane boundary, so 1177 and 1211 share one — see
`mlp_classifier.feature_bucket`), and the member axis auto-shards over
multi-chip meshes. Step-back knobs: ``DOWNSTREAM_GROUP=0`` → one vmapped
population per scenario (8 dispatches), ``DOWNSTREAM_VMAP=0`` → the
reference-shaped sequential per-fold loop, ``DOWNSTREAM_DIM_BUCKET=0`` /
``DOWNSTREAM_SHARD=0`` disable width padding / population sharding.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.evaluation import evaluate as evaluate_mod
from vae_los_angeles_tpu.evaluation.mlp_classifier import (
    _pad_rows,
    fit_classifier,
    fit_classifier_folds,
    predict_classes,
    predict_classes_folds,
)


def generate_estimated_dna(vae_model, rna_data):
    """Estimated DNA from RNA alone (reference :22-36, slot-2 output)."""
    print("Generating estimated DNA methylation data...")
    _, est_dna, _, _, _ = vae_model(a=rna_data)
    return est_dna


def generate_estimated_rna(vae_model, dna_data):
    """Estimated RNA from DNA alone (reference :39-51, slot-1 output)."""
    print("Generating estimated RNA data...")
    est_rna, _, _, _, _ = vae_model(b=dna_data)
    return est_rna


def train_and_evaluate_fold(X_train, X_val, y_train, y_val, n_classes,
                            class_weights, le_new, seed=0):
    """One fold: fused-MLP training + sklearn classification_report
    (reference :75-161)."""
    from sklearn.metrics import classification_report

    fit = fit_classifier(
        X_train, y_train, X_val, y_val, n_classes, class_weights,
        jax.random.PRNGKey(seed), arch="deep", num_epochs=100,
        batch_size=32, lr=1e-3, weight_decay=1e-4, early_stop=True,
    )
    y_pred = predict_classes(fit.params, X_val, arch="deep")
    return classification_report(
        y_val, y_pred, target_names=le_new.classes_,
        labels=np.arange(len(le_new.classes_)), output_dict=True, zero_division=0,
    )


def _vmap_folds_default() -> bool:
    """The vmapped fold population is the default; ``DOWNSTREAM_VMAP=0``
    falls back to the reference-shaped sequential fold loop."""
    return os.getenv("DOWNSTREAM_VMAP", "1") != "0"


def _group_scenarios_default() -> bool:
    """Cross-scenario population grouping (scenarios of one bucketed feature
    width train as ONE vmapped population) is the default on the vmapped
    path; ``DOWNSTREAM_GROUP=0`` keeps one dispatch per scenario."""
    return os.getenv("DOWNSTREAM_GROUP", "1") != "0"


def _aggregate_fold_reports(fold_reports, le_new):
    """Mean ± std of per-fold sklearn classification_reports
    (reference :190-228)."""
    aggregated = {}
    accuracies = [r["accuracy"] for r in fold_reports]
    aggregated["accuracy"] = float(np.mean(accuracies))
    aggregated["accuracy_std"] = float(np.std(accuracies))
    for stat in ("precision", "recall", "f1-score"):
        vals = [r["weighted avg"][stat] for r in fold_reports]
        aggregated.setdefault("weighted avg", {})[stat] = float(np.mean(vals))
        aggregated["weighted avg"][f"{stat}_std"] = float(np.std(vals))
    for class_name in le_new.classes_:
        vals = [r[class_name] for r in fold_reports if class_name in r]
        if vals:
            aggregated[class_name] = {
                stat: float(np.mean([v[stat] for v in vals]))
                for stat in ("precision", "recall", "f1-score")
            }
            for stat in ("precision", "recall", "f1-score"):
                aggregated[class_name][f"{stat}_std"] = float(
                    np.std([v[stat] for v in vals])
                )
    return aggregated


def run_classification_scenario(features, labels, n_classes,
                                scenario_name, le_new, n_folds=5, seed=42,
                                vmap_folds=None):
    """StratifiedKFold scenario evaluation (reference :164-237). Class
    weights are balanced PER FOLD from that fold's training labels
    (reference :182), so no global weights are taken.

    By default the whole fold population trains as ONE vmapped program
    (`fit_classifier_folds`) — the reference's sequential 5-fold MLP loop
    (and its per-fold-shape recompiles) collapses to a single dispatch, and
    scenarios of equal feature width reuse the compiled executable.
    ``vmap_folds=False`` (or ``DOWNSTREAM_VMAP=0``) keeps the sequential
    path; both produce per-fold sklearn classification_reports aggregated
    identically (equivalence-tested in tests/test_downstream_vmap.py)."""
    from sklearn.metrics import classification_report
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler
    from sklearn.utils.class_weight import compute_class_weight

    if vmap_folds is None:
        vmap_folds = _vmap_folds_default()

    print("\n" + "=" * 50)
    print(f"Scenario: {scenario_name}")
    print("=" * 50)

    features_normalized = StandardScaler().fit_transform(features)
    skf = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=seed)

    splits = list(skf.split(features_normalized, labels))
    fold_cws = []
    for train_idx, _ in splits:
        y_train = labels[train_idx]
        fold_cw = compute_class_weight(
            "balanced", classes=np.unique(y_train), y=y_train
        )
        cw_full = np.ones(n_classes, np.float32)
        cw_full[np.unique(y_train)] = fold_cw
        fold_cws.append(cw_full)

    fold_reports = []
    if vmap_folds:
        print(f"Training all {n_folds} folds as one vmapped population")
        folds = [
            (features_normalized[tr], labels[tr],
             features_normalized[va], labels[va], cw)
            for (tr, va), cw in zip(splits, fold_cws)
        ]
        fit = fit_classifier_folds(
            folds, n_classes, arch="deep", num_epochs=100, batch_size=32,
            lr=1e-3, weight_decay=1e-4, early_stop=True,
        )
        n_val_max = max(len(va) for _, va in splits)
        x_va = np.stack(
            [_pad_rows(features_normalized[va], n_val_max) for _, va in splits]
        )
        preds = predict_classes_folds(fit.params, x_va, arch="deep")
        for i, (_, va) in enumerate(splits):
            fold_reports.append(classification_report(
                labels[va], preds[i, :len(va)], target_names=le_new.classes_,
                labels=np.arange(len(le_new.classes_)), output_dict=True,
                zero_division=0,
            ))
    else:
        for fold_idx, (train_idx, val_idx) in enumerate(splits):
            print(f"\nFold {fold_idx + 1}/{n_folds}")
            report = train_and_evaluate_fold(
                features_normalized[train_idx], features_normalized[val_idx],
                labels[train_idx], labels[val_idx], n_classes,
                fold_cws[fold_idx], le_new, seed=fold_idx,
            )
            fold_reports.append(report)

    aggregated = _aggregate_fold_reports(fold_reports, le_new)

    print(f"\nCross-Validation Results ({n_folds} folds):")
    print(f"Accuracy: {aggregated['accuracy']:.4f} ± {aggregated['accuracy_std']:.4f}")
    print(
        f"Weighted F1-score: {aggregated['weighted avg']['f1-score']:.4f} "
        f"± {aggregated['weighted avg']['f1-score_std']:.4f}"
    )
    return aggregated


def run_scenarios_grouped(scenarios, labels, n_classes, le_new,
                          n_folds=5, seed=42):
    """ALL scenarios of one bucketed feature width train as ONE vmapped
    population of (scenario × fold) members.

    The StratifiedKFold splits depend only on the labels (identical across
    scenarios, reference :173), so members stack cleanly; member
    ``(scenario, fold)`` uses ``PRNGKey(fold)`` and that fold's balanced
    class weights — exactly the per-scenario paths' seeding — so every
    member reproduces its `run_classification_scenario` result bit-for-bit
    (tested). The reference's 8 scenarios (40 sequential MLP fits,
    downstream_task.py:164-237) become TWO dispatches: one 20-member
    population per bucketed width (1280: RNA/DNA-width scenarios, 2432:
    the concatenated ones)."""
    from sklearn.metrics import classification_report
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler
    from sklearn.utils.class_weight import compute_class_weight

    from vae_los_angeles_tpu.evaluation.mlp_classifier import feature_bucket

    names = list(scenarios.keys())
    any_features = scenarios[names[0]]
    skf = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=seed)
    splits = list(skf.split(any_features, labels))
    fold_cws = []
    for train_idx, _ in splits:
        y_train = labels[train_idx]
        fold_cw = compute_class_weight(
            "balanced", classes=np.unique(y_train), y=y_train
        )
        cw_full = np.ones(n_classes, np.float32)
        cw_full[np.unique(y_train)] = fold_cw
        fold_cws.append(cw_full)
    n_val_max = max(len(va) for _, va in splits)

    if os.getenv("DOWNSTREAM_UNIFY_WIDTHS", "0") == "1":
        # Measured ANTI-RESULT (round 5, kept as an opt-in knob): padding
        # every scenario to the global width bucket merges the two width
        # populations into ONE program — bit-exact by the
        # fit_classifier_folds mixed-width contract — but the single
        # 40-member × 2432-wide program compiled SLOWER than the two
        # thinner ones it replaces (same-session on the chip: 622.0 s vs
        # 460.9 s cold) and warm walls were identical (5.8 vs 5.9 s: two
        # dispatches were never the binding cost here). Program COUNT
        # only wins when the merged program isn't proportionally bigger —
        # see benchmarks/RESULTS.md round-5 downstream note. Default OFF.
        global_bucket = feature_bucket(
            max(s.shape[1] for s in scenarios.values()))
        by_width = {global_bucket: list(names)}
    else:
        by_width = {}
        for name in names:
            by_width.setdefault(
                feature_bucket(scenarios[name].shape[1]), []
            ).append(name)

    metrics_dict = {}
    for width, group in by_width.items():
        print("\n" + "=" * 50)
        print(f"Scenario group (vmapped population, width bucket {width}): "
              + ", ".join(group))
        print("=" * 50)
        members, member_val = [], []
        for name in group:
            fn = StandardScaler().fit_transform(scenarios[name])
            for (tr, va), cw in zip(splits, fold_cws):
                members.append((fn[tr], labels[tr], fn[va], labels[va], cw))
                member_val.append(_pad_rows(fn[va], n_val_max))
        seeds = [f for _ in group for f in range(n_folds)]
        fit = fit_classifier_folds(
            members, n_classes, arch="deep", num_epochs=100, batch_size=32,
            lr=1e-3, weight_decay=1e-4, early_stop=True, seeds=seeds,
        )
        preds = predict_classes_folds(fit.params, member_val, arch="deep")
        for s, name in enumerate(group):
            fold_reports = []
            for f, (_, va) in enumerate(splits):
                m = s * n_folds + f
                fold_reports.append(classification_report(
                    labels[va], preds[m, : len(va)],
                    target_names=le_new.classes_,
                    labels=np.arange(len(le_new.classes_)),
                    output_dict=True, zero_division=0,
                ))
            agg = _aggregate_fold_reports(fold_reports, le_new)
            metrics_dict[name] = agg
            print(f"{name}: accuracy {agg['accuracy']:.4f} ± "
                  f"{agg['accuracy_std']:.4f}, weighted F1 "
                  f"{agg['weighted avg']['f1-score']:.4f}")
    # report in the caller's scenario order
    return {name: metrics_dict[name] for name in names}


def plot_comparison(metrics_dict, run_id=None, out_subdir="downstream_task",
                    plots_dir="plots"):
    """Grouped-bar comparison across scenarios (reference :240-310)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(metrics_dict.keys())
    stats = ["accuracy", "precision", "recall", "f1-score"]
    values = {
        "accuracy": [metrics_dict[n]["accuracy"] for n in names],
        "precision": [metrics_dict[n]["weighted avg"]["precision"] for n in names],
        "recall": [metrics_dict[n]["weighted avg"]["recall"] for n in names],
        "f1-score": [metrics_dict[n]["weighted avg"]["f1-score"] for n in names],
    }
    x = np.arange(len(names))
    width = 0.2
    fig, ax = plt.subplots(figsize=(max(10, 2 * len(names)), 6))
    for i, stat in enumerate(stats):
        ax.bar(x + (i - 1.5) * width, values[stat], width, label=stat)
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=30, ha="right")
    ax.set_ylim(0, 1.05)
    ax.legend()
    ax.set_title("Downstream classification: scenario comparison")
    ax.grid(True, axis="y", alpha=0.3)
    out_dir = os.path.join(plots_dir, out_subdir)
    os.makedirs(out_dir, exist_ok=True)
    suffix = f"_{run_id}" if run_id else ""
    path = os.path.join(out_dir, f"scenario_comparison{suffix}.png")
    fig.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    print(f"Comparison plot saved to {path}")


def plot_per_tissue_comparison(metrics_dict, le_new, run_id=None,
                               out_subdir="downstream_task", plots_dir="plots"):
    """Two-panel per-tissue F1 plot (reference :313-395)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    classes = list(le_new.classes_)
    names = list(metrics_dict.keys())
    f1 = np.zeros((len(names), len(classes)))
    for i, n in enumerate(names):
        for j, c in enumerate(classes):
            f1[i, j] = metrics_dict[n].get(c, {}).get("f1-score", 0.0)

    half = len(classes) // 2
    fig, axes = plt.subplots(2, 1, figsize=(16, 12))
    for panel, cols in enumerate((range(half), range(half, len(classes)))):
        cols = list(cols)
        x = np.arange(len(cols))
        width = 0.8 / max(len(names), 1)
        for i, n in enumerate(names):
            axes[panel].bar(
                x + (i - len(names) / 2) * width, f1[i, cols], width, label=n
            )
        axes[panel].set_xticks(x)
        axes[panel].set_xticklabels(
            [classes[c] for c in cols], rotation=45, ha="right"
        )
        axes[panel].set_ylabel("F1-score")
        axes[panel].grid(True, axis="y", alpha=0.3)
    axes[0].legend(loc="upper right", fontsize=8)
    fig.suptitle("Per-tissue F1 comparison")
    fig.tight_layout()
    out_dir = os.path.join(plots_dir, out_subdir)
    os.makedirs(out_dir, exist_ok=True)
    suffix = f"_{run_id}" if run_id else ""
    path = os.path.join(out_dir, f"per_tissue_f1_comparison{suffix}.png")
    fig.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    print(f"Per-tissue F1 comparison plot saved to {path}")


def prepare_filtered_val_data(cfg: Config, return_orig_codes: bool = False):
    """Validation split with rare classes dropped + labels re-encoded
    (reference :406-424).

    With ``return_orig_codes`` the ORIGINAL label-encoder codes of the kept
    samples are returned too. The directional VAEs were trained on those
    codes, so site conditioning must use them — the reference feeds the
    RE-ENCODED codes to the models (downstream_task_directional.py:303,322),
    silently conditioning on wrong site embeddings whenever a class is
    dropped; that is a documented upstream bug this framework fixes.
    """
    from sklearn.preprocessing import LabelEncoder

    dataset, label_encoder, tr_idx, va_idx = evaluate_mod.load_val_split(cfg)
    val_sites = dataset.primary_site[va_idx]
    # drop classes with <2 validation samples
    unique, counts = np.unique(val_sites, return_counts=True)
    keep_codes = unique[counts >= 2]
    keep_mask = np.isin(val_sites, keep_codes)
    kept_idx = va_idx[keep_mask]

    orig_codes = dataset.primary_site[kept_idx].astype(np.int64)
    site_names = label_encoder.inverse_transform(orig_codes)
    le_new = LabelEncoder()
    labels = le_new.fit_transform(site_names)
    out = (
        dataset.tpm_data[kept_idx],
        dataset.beta_data[kept_idx],
        labels.astype(np.int64),
        le_new,
    )
    if return_orig_codes:
        return out + (orig_codes,)
    return out


def main(cfg: Optional[Config] = None, n_folds: int = 5):
    cfg = cfg or Config.from_env()
    run_id = evaluate_mod.get_run_id()
    # load the model directly (load_model_and_data would deserialize the
    # full processed_data.pkl a second time just to discard it)
    from vae_los_angeles_tpu.evaluation.loading import load_multimodal

    vae_model = load_multimodal(cfg=cfg)
    if vae_model is None:
        raise FileNotFoundError(
            "no trained MultiModalVAE checkpoint; run `python train.py` first"
        )
    if vae_model.run_id:
        run_id = vae_model.run_id

    rna_data, dna_data, labels, le_new = prepare_filtered_val_data(cfg)
    n_classes = len(le_new.classes_)

    est_dna_data = generate_estimated_dna(vae_model, rna_data)
    est_rna_data = generate_estimated_rna(vae_model, dna_data)

    scenarios = {
        "Orig. RNA": rna_data,
        "Orig. DNA": dna_data,
        "Orig. RNA + Est. DNA": np.concatenate([rna_data, est_dna_data], axis=1),
        "Orig. DNA + Est. RNA": np.concatenate([dna_data, est_rna_data], axis=1),
        "Orig. RNA + Orig. DNA": np.concatenate([rna_data, dna_data], axis=1),
        "Est. DNA": est_dna_data,
        "Est. RNA": est_rna_data,
        "Est. RNA + Est. DNA": np.concatenate([est_rna_data, est_dna_data], axis=1),
    }

    if _vmap_folds_default() and _group_scenarios_default():
        metrics_dict = run_scenarios_grouped(
            scenarios, labels, n_classes, le_new, n_folds=n_folds
        )
    else:
        metrics_dict = {}
        for name, data in scenarios.items():
            metrics_dict[name] = run_classification_scenario(
                data, labels, n_classes, name, le_new, n_folds=n_folds
            )

    plot_comparison(metrics_dict, run_id, plots_dir=cfg.plots_dir)
    plot_per_tissue_comparison(metrics_dict, le_new, run_id, plots_dir=cfg.plots_dir)
    print("\n" + "=" * 50)
    print("Downstream task complete.")
    print("=" * 50)
    return metrics_dict


if __name__ == "__main__":
    main()
