"""Clustering evaluation of mean / kNN / conditioned-kNN imputation of the
unmatched cohorts (reference
``src/clustering_evaluation/cluster_imputation_methods.py``, 600 LoC).

Imputers are fitted on the matched training table; each method imputes the
missing modality of the RNA-only and DNA-only cohorts (reference :259-417,
with log1p applied to imputed RNA), then the same PCA/t-SNE + silhouette/NH
analysis and plots as `cluster_reconstructed` run per (method, cohort).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import load_label_encoder
from vae_los_angeles_tpu.evaluation.clustering.common import (
    cluster_scores,
    perform_dimensionality_reduction,
    plot_clusters_2d,
    prepare_features,
)
from vae_los_angeles_tpu.training import checkpoint


def _conditioned_knn_cls(n_rows=None):
    """Site-conditioned kNN backend per the EVAL_BACKEND policy (auto
    default: sklearn loop below the ~1k-row crossover, the masked-distance
    MXU kernel above it; ops/knn.py)."""
    from vae_los_angeles_tpu.ops.knn import resolve_conditioned_knn

    return resolve_conditioned_knn(n_rows)


def _train_arrays(train_df):
    train_rna = np.array(train_df["tpm_unstranded"].tolist()).astype(np.float32)
    train_dna = np.array(train_df["beta_value"].tolist()).astype(np.float32)
    return train_rna, train_dna


def apply_mean_imputation(train_df, rna_only_df, dna_only_df):
    """Column-mean imputation fitted on the training table (reference :259-294).

    DOCUMENTED DEVIATION from the reference (same for the two kNN variants
    below): the reference queries its log1p-trained imputers with RAW
    unmatched TPM (:311-316 — the unmatched pickles are saved before the
    log1p step) and then re-applies np.log1p to imputed RNA that is already
    in log1p space (:290, :333, :408). Here the unmatched TPM is log1p'd
    before querying (exactly like reconstruct_unmatched.py:33 handles the
    same cohort) and imputed RNA is left in the log1p space it was predicted
    in, so all RNA representations in the comparison share one scale."""
    print("\nAPPLYING MEAN IMPUTATION")
    train_rna, train_dna = _train_arrays(train_df)
    rna_mean = train_rna.mean(axis=0)
    dna_mean = train_dna.mean(axis=0)

    rna_only_imputed = rna_only_df.copy() if rna_only_df is not None else None
    if rna_only_imputed is not None:
        rna_only_imputed["imputed_beta_value"] = [dna_mean] * len(rna_only_imputed)
    dna_only_imputed = dna_only_df.copy() if dna_only_df is not None else None
    if dna_only_imputed is not None:
        # rna_mean is a mean of log1p'd training vectors — already log space
        dna_only_imputed["imputed_tpm_unstranded"] = [rna_mean] * len(
            dna_only_imputed
        )
    return rna_only_imputed, dna_only_imputed


def apply_knn_imputation(train_df, rna_only_df, dna_only_df, n_neighbors=5):
    """Cross-modal kNN imputation (reference :297-337)."""
    from vae_los_angeles_tpu.ops.knn import resolve_knn_regressor

    KNeighborsRegressor = resolve_knn_regressor(
        len(train_df))  # EVAL_BACKEND policy (auto: per cohort scale)
    print(f"\nAPPLYING KNN IMPUTATION (k={n_neighbors})")
    train_rna, train_dna = _train_arrays(train_df)

    rna_only_imputed = rna_only_df.copy() if rna_only_df is not None else None
    if rna_only_imputed is not None:
        # unmatched cohorts ship raw TPM; bring queries into the imputer's
        # log1p training space (reconstruct_unmatched.py:33 does the same)
        rna_val = np.log1p(
            np.array(rna_only_imputed["tpm_unstranded"].tolist()).astype(
                np.float32
            )
        )
        knn_dna = KNeighborsRegressor(n_neighbors=n_neighbors, n_jobs=-1)
        knn_dna.fit(train_rna, train_dna)
        rna_only_imputed["imputed_beta_value"] = list(knn_dna.predict(rna_val))

    dna_only_imputed = dna_only_df.copy() if dna_only_df is not None else None
    if dna_only_imputed is not None:
        dna_val = np.array(dna_only_imputed["beta_value"].tolist()).astype(np.float32)
        knn_rna = KNeighborsRegressor(n_neighbors=n_neighbors, n_jobs=-1)
        knn_rna.fit(train_dna, train_rna)
        # predictions are in the log1p space the imputer was trained in
        dna_only_imputed["imputed_tpm_unstranded"] = list(knn_rna.predict(dna_val))
    return rna_only_imputed, dna_only_imputed


def apply_conditioned_knn_imputation(train_df, rna_only_df, dna_only_df,
                                     label_encoder, n_neighbors=5):
    """Site-conditioned kNN imputation (reference :340-417); sites appended
    as the last feature column; cohorts filtered to known sites."""
    print(f"\nAPPLYING CONDITIONED KNN IMPUTATION (k={n_neighbors})")
    train_rna, train_dna = _train_arrays(train_df)
    train_sites = train_df["primary_site_encoded"].values[:, np.newaxis]
    train_rna_cond = np.hstack((train_rna, train_sites))
    train_dna_cond = np.hstack((train_dna, train_sites))

    def _encode_sites(df):
        if "primary_site_encoded" in df.columns:
            return df["primary_site_encoded"].values
        return label_encoder.transform(df["primary_site"])

    rna_only_imputed = None
    if rna_only_df is not None and "primary_site" in rna_only_df.columns:
        valid = rna_only_df[
            rna_only_df["primary_site"].isin(label_encoder.classes_)
        ].copy()
        if len(valid) > 0:
            sites = _encode_sites(valid)
            rna_val = np.log1p(
                np.array(valid["tpm_unstranded"].tolist()).astype(np.float32)
            )
            rna_val_cond = np.hstack((rna_val, sites[:, np.newaxis]))
            knn = _conditioned_knn_cls(
                len(train_rna_cond))(n_neighbors=n_neighbors)
            knn.fit(train_rna_cond, train_dna)
            valid["imputed_beta_value"] = list(knn.predict(rna_val_cond))
            rna_only_imputed = valid

    dna_only_imputed = None
    if dna_only_df is not None and "primary_site" in dna_only_df.columns:
        valid = dna_only_df[
            dna_only_df["primary_site"].isin(label_encoder.classes_)
        ].copy()
        if len(valid) > 0:
            sites = _encode_sites(valid)
            dna_val = np.array(valid["beta_value"].tolist()).astype(np.float32)
            dna_val_cond = np.hstack((dna_val, sites[:, np.newaxis]))
            knn = _conditioned_knn_cls(
                len(train_dna_cond))(n_neighbors=n_neighbors)
            knn.fit(train_dna_cond, train_rna)
            valid["imputed_tpm_unstranded"] = list(knn.predict(dna_val_cond))
            dna_only_imputed = valid
    return rna_only_imputed, dna_only_imputed


def _analysis_inputs(df, label_encoder, sample_type):
    """(features, labels) for one (method, cohort) table, or None —
    the filter + feature-assembly half of `analyze_samples`."""
    if "primary_site" in df.columns:
        df = df[df["primary_site"].isin(label_encoder.classes_)].copy()
    if len(df) == 0:
        print("⚠ No samples with valid primary_site found")
        return None
    if sample_type == "RNA-only":
        features = prepare_features(df, ["tpm_unstranded", "imputed_beta_value"])
    else:
        features = prepare_features(df, ["beta_value", "imputed_tpm_unstranded"])
    if features is None:
        print("⚠ Could not prepare features")
        return None
    if "primary_site_encoded" in df.columns:
        labels = df["primary_site_encoded"].values
    else:
        labels = label_encoder.transform(df["primary_site"])
    return features, labels


def _report_and_plot(scores, pca_features, tsne_features, labels,
                     label_encoder, run_timestamp, method_name, sample_type,
                     plots_dir):
    """The print + plot + result-dict half of `analyze_samples`."""
    if scores is None:
        print("⚠ Not enough distinct labels; skipping plots")
        return None
    print(
        f"  Original - Silh: {scores['orig_silhouette']:.3f} NH: {scores['orig_nh']:.3f} | "
        f"PCA - Silh: {scores['pca_silhouette']:.3f} NH: {scores['pca_nh']:.3f} | "
        f"t-SNE - Silh: {scores['tsne_silhouette']:.3f} NH: {scores['tsne_nh']:.3f}"
    )

    out_dir = os.path.join(plots_dir, "clustering")
    tag = sample_type.lower().replace("-", "_")
    mtag = method_name.lower().replace(" ", "_")
    plot_clusters_2d(
        pca_features, labels,
        f"PCA: {sample_type} samples ({method_name} imputation)\n"
        f"PCA Silh: {scores['pca_silhouette']:.3f} | NH: {scores['pca_nh']:.3f}",
        os.path.join(out_dir, f"{tag}_pca_{mtag}_{run_timestamp}.png"),
        label_encoder=label_encoder,
    )
    plot_clusters_2d(
        tsne_features, labels,
        f"t-SNE: {sample_type} samples ({method_name} imputation)\n"
        f"t-SNE Silh: {scores['tsne_silhouette']:.3f} | NH: {scores['tsne_nh']:.3f}",
        os.path.join(out_dir, f"{tag}_tsne_{mtag}_{run_timestamp}.png"),
        label_encoder=label_encoder,
    )
    return {"method": method_name, "cohort": sample_type, **scores}


def analyze_samples(df, label_encoder, run_timestamp, method_name, sample_type,
                    plots_dir="plots"):
    """Per-(method, cohort) PCA/t-SNE + silhouette/NH analysis (reference
    :420-527) — the sequential path; `main` batches all methods of a
    cohort as one vmapped population when the TPU backend resolves
    (`analyze_cohort_grouped`)."""
    print(f"\nANALYZING {sample_type.upper()} SAMPLES ({method_name})")
    inputs = _analysis_inputs(df, label_encoder, sample_type)
    if inputs is None:
        return None
    features, labels = inputs
    print(f"Feature matrix shape: {features.shape}")
    pca_features, tsne_features = perform_dimensionality_reduction(features)
    scores = cluster_scores(features, labels, pca_features, tsne_features)
    return _report_and_plot(
        scores, pca_features, tsne_features, labels, label_encoder,
        run_timestamp, method_name, sample_type, plots_dir,
    )


def analyze_cohort_grouped(entries, label_encoder, run_timestamp, sample_type,
                           plots_dir="plots"):
    """All imputation methods of ONE cohort as a member-batched population
    (round-4 verdict item #4): the methods share the cohort's rows/labels
    and feature shape, so scaler→PCA→t-SNE→fused-metrics run as vmapped
    populations — one dispatch per stage for the whole method axis instead
    of a sequential per-method loop
    (`evaluation/clustering/common.analyze_cohort_population`).

    ``entries``: [(method_name, df), ...]. Falls back to the sequential
    `analyze_samples` when shapes/labels diverge across methods (a method
    that filtered different rows), when fewer than 2 methods are eligible,
    or when the backend resolves to sklearn for this cohort scale
    (``CLUSTER_VMAP=0`` forces the sequential path)."""
    from vae_los_angeles_tpu.ops.backend import resolve_eval_backend
    from vae_los_angeles_tpu.parallel.vmap_meta import population_mesh

    prepared = []
    for method_name, df in entries:
        print(f"\nANALYZING {sample_type.upper()} SAMPLES ({method_name})")
        inputs = _analysis_inputs(df, label_encoder, sample_type)
        if inputs is None:
            prepared.append((method_name, None))
        else:
            print(f"Feature matrix shape: {inputs[0].shape}")
            prepared.append((method_name, inputs))
    live = [(m, f, l) for m, x in prepared if x is not None for f, l in [x]]
    same_shape = len({f.shape for _, f, _ in live}) == 1 if live else False
    same_labels = same_shape and all(
        np.array_equal(l, live[0][2]) for _, _, l in live
    )
    use_pop = (
        os.getenv("CLUSTER_VMAP", "1") != "0"
        and len(live) >= 2
        and same_labels
        and resolve_eval_backend(len(live[0][2])) == "tpu"
        # the member kernels are single-device programs; multi-chip hosts
        # keep the sequential path, whose kernels ROW-SHARD the O(n²·dim)
        # metric passes and the t-SNE state over the mesh — concentrating
        # M members' n² state on one chip would undo that
        and population_mesh() is None
    )
    results = []
    if use_pop:
        from vae_los_angeles_tpu.evaluation.clustering.common import (
            analyze_cohort_population,
        )

        print(f"\n[{sample_type}] batching {len(live)} methods as one "
              "vmapped population (CLUSTER_VMAP=0 for the sequential path)")
        pop = analyze_cohort_population([f for _, f, _ in live], live[0][2])
        for (method_name, _, labels), (pca2, tsne2, scores) in zip(live, pop):
            results.append(_report_and_plot(
                scores, pca2, tsne2, labels, label_encoder, run_timestamp,
                method_name, sample_type, plots_dir,
            ))
        return results
    for method_name, inputs in prepared:
        if inputs is None:
            results.append(None)
            continue
        features, labels = inputs
        pca_features, tsne_features = perform_dimensionality_reduction(features)
        scores = cluster_scores(features, labels, pca_features, tsne_features)
        results.append(_report_and_plot(
            scores, pca_features, tsne_features, labels, label_encoder,
            run_timestamp, method_name, sample_type, plots_dir,
        ))
    return results


def main(cfg: Optional[Config] = None):
    import pandas as pd

    cfg = cfg or Config.from_env()
    run_timestamp = checkpoint.new_run_id()
    print("=" * 80)
    print("DIMENSIONALITY REDUCTION VISUALIZATION FOR IMPUTATION METHODS")
    print("=" * 80)

    train_df = pd.read_pickle(os.path.join(cfg.data_dir, "processed_data.pkl"))
    label_encoder = load_label_encoder(os.path.join(cfg.data_dir, "label_encoder.pkl"))
    rna_only_path = os.path.join(cfg.data_dir, "rna_only_unmatched.pkl")
    dna_only_path = os.path.join(cfg.data_dir, "dna_only_unmatched.pkl")
    rna_only_df = pd.read_pickle(rna_only_path) if os.path.exists(rna_only_path) else None
    dna_only_df = pd.read_pickle(dna_only_path) if os.path.exists(dna_only_path) else None
    if rna_only_df is None and dna_only_df is None:
        print("\n⚠ No unmatched samples found! Run scripts/prepare_data.py first.")
        return None

    results = []
    methods = [
        ("Mean", apply_mean_imputation(train_df, rna_only_df, dna_only_df)),
        ("KNN", apply_knn_imputation(train_df, rna_only_df, dna_only_df)),
        (
            "Conditioned KNN",
            apply_conditioned_knn_imputation(
                train_df, rna_only_df, dna_only_df, label_encoder
            ),
        ),
    ]
    # one grouped call per cohort: the methods batch into vmapped
    # populations when the TPU backend resolves (analyze_cohort_grouped
    # falls back to the sequential per-method path otherwise)
    rna_entries = [
        (name, rna_imp) for name, (rna_imp, _) in methods
        if rna_imp is not None and len(rna_imp) > 0
    ]
    dna_entries = [
        (name, dna_imp) for name, (_, dna_imp) in methods
        if dna_imp is not None and len(dna_imp) > 0
        and "primary_site" in dna_imp.columns
    ]
    if rna_entries:
        results.extend(analyze_cohort_grouped(
            rna_entries, label_encoder, run_timestamp, "RNA-only",
            cfg.plots_dir,
        ))
    if dna_entries:
        results.extend(analyze_cohort_grouped(
            dna_entries, label_encoder, run_timestamp, "DNA-only",
            cfg.plots_dir,
        ))
    print("\nVisualization analysis complete!")
    return [r for r in results if r is not None]


if __name__ == "__main__":
    main()
