"""EDA boxplots of top/bottom-variance genes and CpG probes (reference
``create_boxplots.py``, 143 LoC).

Requires ``data/feature_names.pkl`` — which the reference expects
(create_boxplots.py:17) but never produces; this framework's data-prep
stage emits it (`data.prepare_data.save_artifacts`).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from vae_los_angeles_tpu.config import Config


def _variance_boxplot(matrix, names, idx, title, ylabel, xlabel, filename):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(15, 8))
    data = [matrix[:, i] for i in idx]
    plt.boxplot(data, tick_labels=[names[i] for i in idx], patch_artist=True)
    plt.title(title)
    plt.ylabel(ylabel)
    plt.xlabel(xlabel)
    plt.xticks(rotation=45, ha="right")
    plt.tight_layout()
    plt.savefig(filename)
    plt.close()


def _lowest_nonzero_variance_idx(variances, n=10):
    nonzero = np.where(variances > 0)[0]
    if len(nonzero) >= n:
        order = nonzero[np.argsort(variances[nonzero])]
        return order[:n]
    return np.argsort(variances)[:n]


def main(cfg: Optional[Config] = None):
    import pandas as pd

    cfg = cfg or Config.from_env()
    os.makedirs(cfg.plots_dir, exist_ok=True)
    df = pd.read_pickle(os.path.join(cfg.data_dir, "processed_data.pkl"))
    with open(os.path.join(cfg.data_dir, "feature_names.pkl"), "rb") as f:
        feature_names = pickle.load(f)
    gene_names = feature_names["gene_names"]
    probe_ids = feature_names["probe_ids"]

    rna_matrix = np.vstack(df["tpm_unstranded"].values)
    gene_variances = np.var(rna_matrix, axis=0)
    _variance_boxplot(
        rna_matrix, gene_names, np.argsort(gene_variances)[-10:],
        "RNA Transcription Across Samples (Top 10 Genes with Highest Variance)",
        "log1p(TPM)", "Gene",
        os.path.join(cfg.plots_dir, "rna_genes_distribution_highest_variance.png"),
    )
    _variance_boxplot(
        rna_matrix, gene_names, _lowest_nonzero_variance_idx(gene_variances),
        "RNA Transcription Across Samples (Top 10 Genes with Lowest Variance)",
        "log1p(TPM)", "Gene",
        os.path.join(cfg.plots_dir, "rna_genes_distribution_lowest_variance.png"),
    )

    dna_matrix = np.vstack([np.array(x) for x in df["beta_value"].values])
    probe_variances = np.var(dna_matrix, axis=0)
    _variance_boxplot(
        dna_matrix, probe_ids, np.argsort(probe_variances)[-10:],
        "DNA Methylation Across Samples (Top 10 CpG Islands with Highest Variance)",
        "Beta Value", "CpG Island",
        os.path.join(cfg.plots_dir, "dna_cpg_distribution_highest_variance.png"),
    )
    _variance_boxplot(
        dna_matrix, probe_ids, _lowest_nonzero_variance_idx(probe_variances),
        "DNA Methylation Across Samples (Top 10 CpG Islands with Lowest Variance)",
        "Beta Value", "CpG Island",
        os.path.join(cfg.plots_dir, "dna_cpg_distribution_lowest_variance.png"),
    )
    print(
        "Boxplots for highest and lowest variance genes/CpGs created and saved "
        f"in the '{cfg.plots_dir}' directory."
    )


if __name__ == "__main__":
    main()
