"""Clustering evaluation of VAE-reconstructed unmatched cohorts (reference
``src/clustering_evaluation/cluster_reconstructed.py``, 466 LoC).

Finds the latest reconstruction pickles by ctime (reference :59-67), builds
orig+reconstructed feature matrices (:100-137), runs PCA/t-SNE (:140-187),
scores silhouette + neighborhood-hit on original/PCA/t-SNE spaces
(:296-318), saves scatter plots colored by site and a text summary report
(:375-420).
"""

from __future__ import annotations

import glob
import os
from typing import Optional


from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import load_label_encoder
from vae_los_angeles_tpu.evaluation.clustering.common import (
    cluster_scores,
    perform_dimensionality_reduction,
    plot_clusters_2d,
    prepare_features,
)
from vae_los_angeles_tpu.training import checkpoint


def find_latest_reconstruction_files(data_dir="data"):
    rna_files = glob.glob(os.path.join(data_dir, "rna_with_reconstructed_dna_*.pkl"))
    dna_files = glob.glob(os.path.join(data_dir, "dna_with_reconstructed_rna_*.pkl"))
    rna_file = max(rna_files, key=os.path.getctime) if rna_files else None
    dna_file = max(dna_files, key=os.path.getctime) if dna_files else None
    return rna_file, dna_file


def analyze_cohort(df, label_encoder, cohort_name, feature_columns, run_timestamp,
                   plots_dir="plots"):
    print("\n" + "=" * 80)
    print(f"ANALYZING {cohort_name.upper()} SAMPLES")
    print("=" * 80)
    if "primary_site" in df.columns:
        n0 = len(df)
        df = df[df["primary_site"].isin(label_encoder.classes_)].copy()
        if len(df) < n0:
            print(f"  Filtered out {n0 - len(df)} unknown-site samples")
    if len(df) == 0:
        print("⚠ No samples to analyze")
        return None

    features = prepare_features(df, feature_columns)
    if features is None:
        print("⚠ Could not prepare features")
        return None
    print(f"Feature matrix shape: {features.shape}")

    if "primary_site_encoded" in df.columns:
        labels = df["primary_site_encoded"].values
    elif "primary_site" in df.columns:
        labels = label_encoder.transform(df["primary_site"])
    else:
        print("⚠ No primary site labels found; skipping")
        return None

    pca_features, tsne_features = perform_dimensionality_reduction(features)
    scores = cluster_scores(features, labels, pca_features, tsne_features)
    if scores is None:
        print("⚠ Only one site label; skipping score/plots")
        return None
    print(
        f"  Original  - Silhouette: {scores['orig_silhouette']:.3f}, "
        f"NH: {scores['orig_nh']:.3f}"
    )
    print(
        f"  PCA       - Silhouette: {scores['pca_silhouette']:.3f}, "
        f"NH: {scores['pca_nh']:.3f}"
    )
    print(
        f"  t-SNE     - Silhouette: {scores['tsne_silhouette']:.3f}, "
        f"NH: {scores['tsne_nh']:.3f}"
    )

    out_dir = os.path.join(plots_dir, "clustering")
    tag = cohort_name.lower().replace("-", "_")
    plot_clusters_2d(
        pca_features, labels,
        f"PCA: {cohort_name} (reconstructed)\nSilh: {scores['pca_silhouette']:.3f} "
        f"| NH: {scores['pca_nh']:.3f}",
        os.path.join(out_dir, f"{tag}_pca_reconstructed_{run_timestamp}.png"),
        label_encoder=label_encoder,
    )
    plot_clusters_2d(
        tsne_features, labels,
        f"t-SNE: {cohort_name} (reconstructed)\nSilh: {scores['tsne_silhouette']:.3f} "
        f"| NH: {scores['tsne_nh']:.3f}",
        os.path.join(out_dir, f"{tag}_tsne_reconstructed_{run_timestamp}.png"),
        label_encoder=label_encoder,
    )
    return {"cohort": cohort_name, "n_samples": len(df), **scores}


def write_summary_report(results, run_timestamp, plots_dir="plots"):
    """Text summary report (reference :375-420)."""
    out_dir = os.path.join(plots_dir, "clustering")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"clustering_summary_{run_timestamp}.txt")
    with open(path, "w") as f:
        f.write("CLUSTERING EVALUATION OF RECONSTRUCTED DATA\n")
        f.write("=" * 60 + "\n\n")
        for rec in results:
            if rec is None:
                continue
            f.write(f"Cohort: {rec['cohort']} ({rec['n_samples']} samples)\n")
            for space in ("orig", "pca", "tsne"):
                f.write(
                    f"  {space:>5s}: silhouette={rec[f'{space}_silhouette']:.4f} "
                    f"NH={rec[f'{space}_nh']:.4f}\n"
                )
            f.write("\n")
    print(f"✓ Summary report saved to: {path}")
    return path


def main(cfg: Optional[Config] = None):
    import pandas as pd

    cfg = cfg or Config.from_env()
    run_timestamp = checkpoint.new_run_id()
    print("=" * 80)
    print("CLUSTERING EVALUATION OF RECONSTRUCTED DATA")
    print("=" * 80)

    label_encoder = load_label_encoder(os.path.join(cfg.data_dir, "label_encoder.pkl"))
    rna_file, dna_file = find_latest_reconstruction_files(cfg.data_dir)

    results = []
    if rna_file:
        print(f"\nLoading RNA with reconstructed DNA from: {rna_file}")
        df = pd.read_pickle(rna_file)
        results.append(
            analyze_cohort(
                df, label_encoder, "RNA-only",
                ["tpm_unstranded", "reconstructed_beta_value"],
                run_timestamp, cfg.plots_dir,
            )
        )
    else:
        print("\n⚠ No RNA reconstruction files found")
    if dna_file:
        print(f"\nLoading DNA with reconstructed RNA from: {dna_file}")
        df = pd.read_pickle(dna_file)
        results.append(
            analyze_cohort(
                df, label_encoder, "DNA-only",
                ["beta_value", "reconstructed_tpm_unstranded"],
                run_timestamp, cfg.plots_dir,
            )
        )
    else:
        print("\n⚠ No DNA reconstruction files found")

    if any(r is not None for r in results):
        write_summary_report(results, run_timestamp, cfg.plots_dir)
    print("\nClustering evaluation complete!")
    return results


if __name__ == "__main__":
    main()
