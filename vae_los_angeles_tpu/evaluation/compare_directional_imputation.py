"""Directional-VAE imputation comparison vs mean/kNN baselines.

TPU-native counterpart of the reference's top-level
``compare_directional_imputation.py`` (615 LoC, SURVEY §2.2): loads both
directional checkpoints via the run-id files, computes VAE predictions on the
shared validation split plus two host-side baselines (mean vector fitted on
the validation table, reference :213-232; kNN k=5 fitted on the training
table, reference :235-254), evaluates MAE/MSE/RMSE/R²/cosine/per-sample
Pearson for each, writes ``comparison_results.csv`` + ``.json`` and the
comparison/correlation/interactive plots into
``plots/directional_comparison_{run_id}/``.

Metric computation runs as one fused jnp reduction per (pred, truth) pair
(`ops.metrics`) instead of the reference's per-row scipy loop.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.evaluation.evaluate import load_val_split
from vae_los_angeles_tpu.evaluation.loading import load_dna2rna, load_rna2dna
from vae_los_angeles_tpu.ops.metrics import compute_imputation_metrics, pearson_per_sample
from vae_los_angeles_tpu.training import checkpoint


def get_run_ids():
    return checkpoint.get_run_id("rna2dna"), checkpoint.get_run_id("dna2rna")


def get_mean_imputation_predictions(val_tpm, val_beta):
    """Mean vectors fitted on the validation table (reference :213-232)."""
    rna_mean_pred = np.tile(val_tpm.mean(axis=0), (len(val_tpm), 1))
    dna_mean_pred = np.tile(val_beta.mean(axis=0), (len(val_beta), 1))
    return rna_mean_pred.astype(np.float32), dna_mean_pred.astype(np.float32)


def get_knn_predictions(train_tpm, train_beta, val_tpm, val_beta, n_neighbors=5):
    """Cross-modal kNN baselines (reference :235-254; host-side sklearn)."""
    from vae_los_angeles_tpu.ops.knn import resolve_knn_regressor

    KNeighborsRegressor = resolve_knn_regressor(
        len(train_tpm))  # EVAL_BACKEND policy (auto: per cohort scale)
    knn_rna = KNeighborsRegressor(n_neighbors=n_neighbors, n_jobs=-1)
    knn_rna.fit(train_beta, train_tpm)
    rna_knn_pred = knn_rna.predict(val_beta)

    knn_dna = KNeighborsRegressor(n_neighbors=n_neighbors, n_jobs=-1)
    knn_dna.fit(train_tpm, train_beta)
    dna_knn_pred = knn_dna.predict(val_tpm)
    return rna_knn_pred, dna_knn_pred


def compute_metrics(y_true, y_pred, modality_name, model_name):
    """Reference-format record incl. per-sample Pearson list for plotting."""
    rec = compute_imputation_metrics(y_true, y_pred, modality_name, model_name)
    r, valid = pearson_per_sample(np.asarray(y_true), np.asarray(y_pred))
    rec["_pearson_all"] = list(np.asarray(r)[np.asarray(valid)])
    return rec


# ---------------------------------------------------------------------------
# Plotting (host-side matplotlib/plotly, mirroring the reference artifacts)
# ---------------------------------------------------------------------------


def plot_comparison(rna_true, dna_true, dna_vae, rna_vae, dna_mean, rna_mean,
                    dna_knn, rna_knn, output_dir, n_samples=3, seed=42):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(rna_true), size=min(n_samples, len(rna_true)), replace=False)
    for rank, i in enumerate(idx):
        fig, axes = plt.subplots(2, 2, figsize=(14, 8))
        panels = [
            ("DNA: VAE vs true", dna_true[i], dna_vae[i]),
            ("DNA: kNN vs true", dna_true[i], dna_knn[i]),
            ("RNA: VAE vs true", rna_true[i], rna_vae[i]),
            ("RNA: kNN vs true", rna_true[i], rna_knn[i]),
        ]
        for ax, (title, truth, pred) in zip(axes.ravel(), panels):
            ax.scatter(truth, pred, s=2, alpha=0.4)
            lo, hi = float(min(truth.min(), pred.min())), float(
                max(truth.max(), pred.max())
            )
            ax.plot([lo, hi], [lo, hi], "r--", linewidth=1)
            ax.set_title(title)
            ax.set_xlabel("true")
            ax.set_ylabel("predicted")
        fig.suptitle(f"Sample {i}")
        fig.tight_layout()
        fig.savefig(
            os.path.join(output_dir, f"comparison_sample_{rank}.png"),
            dpi=150,
            bbox_inches="tight",
        )
        plt.close(fig)


def plot_correlation_distributions(dna_metrics, rna_metrics, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, rec, name in (
        (axes[0], dna_metrics, "RNA→DNA"),
        (axes[1], rna_metrics, "DNA→RNA"),
    ):
        ax.hist(rec["_pearson_all"], bins=30, alpha=0.8)
        ax.axvline(rec["PearsonMean"], color="r", linestyle="--",
                   label=f"mean={rec['PearsonMean']:.3f}")
        ax.set_title(f"{name}: per-sample Pearson r")
        ax.legend()
    fig.tight_layout()
    fig.savefig(
        os.path.join(output_dir, "pearson_distributions.png"),
        dpi=150,
        bbox_inches="tight",
    )
    plt.close(fig)


def create_interactive_plot(results, output_dir):
    try:
        import plotly.graph_objects as go
        from plotly.subplots import make_subplots
    except ImportError:
        print("plotly unavailable; skipping interactive plot")
        return
    metrics = ["MAE", "MSE", "RMSE", "R2", "CosineSimilarity", "PearsonMean"]
    fig = make_subplots(rows=2, cols=3, subplot_titles=metrics)
    for k, metric in enumerate(metrics):
        row, col = k // 3 + 1, k % 3 + 1
        fig.add_trace(
            go.Bar(
                x=[f"{r['Modality'][:3]}:{r['Model']}" for r in results],
                y=[r[metric] for r in results],
                showlegend=False,
            ),
            row=row,
            col=col,
        )
    fig.update_layout(title="Directional imputation comparison", height=700)
    filename = os.path.join(output_dir, "interactive_comparison.html")
    fig.write_html(filename)
    print(f"Interactive plot saved to {filename}")


def save_results(results, output_dir):
    import pandas as pd

    results_clean = [
        {k: v for k, v in rec.items() if not k.startswith("_")} for rec in results
    ]
    df = pd.DataFrame(results_clean)
    csv_filename = os.path.join(output_dir, "comparison_results.csv")
    df.to_csv(csv_filename, index=False)
    print(f"Results saved to {csv_filename}")
    json_filename = os.path.join(output_dir, "comparison_results.json")
    with open(json_filename, "w") as f:
        json.dump(results_clean, f, indent=2)
    print(f"Results also saved to {json_filename}")
    return df


def main(cfg: Optional[Config] = None):
    cfg = cfg or Config.from_env()
    run_id = checkpoint.new_run_id()
    output_dir = os.path.join(cfg.plots_dir, f"directional_comparison_{run_id}")
    os.makedirs(output_dir, exist_ok=True)

    dataset, label_encoder, tr_idx, va_idx = load_val_split(cfg)
    train_tpm, train_beta = dataset.tpm_data[tr_idx], dataset.beta_data[tr_idx]
    rna_true, dna_true = dataset.tpm_data[va_idx], dataset.beta_data[va_idx]
    val_site = dataset.primary_site[va_idx]

    rna2dna_model = load_rna2dna(cfg=cfg)
    dna2rna_model = load_dna2rna(cfg=cfg)
    if rna2dna_model is None and dna2rna_model is None:
        print("Error: No models loaded. Please train both models first.")
        return None

    print("\nComputing baseline imputation predictions...")
    rna_mean_pred, dna_mean_pred = get_mean_imputation_predictions(rna_true, dna_true)
    rna_knn_pred, dna_knn_pred = get_knn_predictions(
        train_tpm, train_beta, rna_true, dna_true
    )

    results = []
    dna_vae_pred = rna_vae_pred = None
    dna_metrics_vae = rna_metrics_vae = None
    if rna2dna_model is not None:
        dna_vae_pred, _, _ = rna2dna_model(rna=rna_true, site=val_site)
        dna_metrics_vae = compute_metrics(
            dna_true, dna_vae_pred, "DNA methylation", "RNA2DNAVAE"
        )
        results.append(dna_metrics_vae)
        results.append(
            compute_metrics(dna_true, dna_mean_pred, "DNA methylation", "Mean Imputation")
        )
        results.append(
            compute_metrics(dna_true, dna_knn_pred, "DNA methylation", "k-NN Imputation")
        )
    if dna2rna_model is not None:
        rna_vae_pred, _, _ = dna2rna_model(dna=dna_true, site=val_site)
        rna_metrics_vae = compute_metrics(
            rna_true, rna_vae_pred, "RNA expression", "DNA2RNAVAE"
        )
        results.append(rna_metrics_vae)
        results.append(
            compute_metrics(rna_true, rna_mean_pred, "RNA expression", "Mean Imputation")
        )
        results.append(
            compute_metrics(rna_true, rna_knn_pred, "RNA expression", "k-NN Imputation")
        )

    print("\n" + "=" * 80)
    print("DIRECTIONAL VAE IMPUTATION COMPARISON RESULTS")
    print("=" * 80)
    for rec in results:
        print(
            f"{rec['Modality']:>16s} | {rec['Model']:>16s} | MAE={rec['MAE']:.4f} "
            f"MSE={rec['MSE']:.4f} R2={rec['R2']:.4f} Pearson={rec['PearsonMean']:.4f}"
        )

    if dna_vae_pred is not None and rna_vae_pred is not None:
        plot_comparison(
            rna_true, dna_true, dna_vae_pred, rna_vae_pred,
            dna_mean_pred, rna_mean_pred, dna_knn_pred, rna_knn_pred, output_dir,
        )
        plot_correlation_distributions(dna_metrics_vae, rna_metrics_vae, output_dir)
        create_interactive_plot(results, output_dir)

    save_results(results, output_dir)
    print(f"\nComparison complete! All results saved to {output_dir}/")
    return results


if __name__ == "__main__":
    main()
