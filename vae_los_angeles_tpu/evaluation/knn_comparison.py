"""kNN vs conditioned-kNN vs directional-VAE comparison (reference
``src/knn_comparison/run_comparison.py``, 351 LoC).

For both directions: manual grid search over kNN params
{k ∈ 5/10/20/50, weights ∈ uniform/distance, metric ∈ euclidean/manhattan}
on the shared validation split (reference :56-94), the same grid for the
site-`ConditionedKNeighborsRegressor` (site index appended as the last
feature column, :272-284), and the loaded directional VAE — compared on
per-sample MSE with matplotlib+plotly boxplots and t-SNE scatter plots of
the predictions colored by site (:138-232). The kNN grids (MXU distance
kernels + blocked-L1 manhattan, ops/knn.py — all 16 reference combos as
two fused passes) and the t-SNE (exact-method device program, ops/tsne.py,
SURVEY hard-part #7) route per the ``EVAL_BACKEND`` policy (alias ``KNN_BACKEND``):
``auto`` by default — host sklearn below the measured ~1k-row crossover
(reference scale stays reference-exact) and on non-TPU hosts, the device
kernels above it on the chip; ``sklearn``/``tpu`` force a side
(ops/backend.resolve_eval_backend).
The per-sample MSE and VAE predictions always run on device.
"""

from __future__ import annotations

import itertools
import os
from typing import Optional

import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalDataset, load_label_encoder
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.evaluation.loading import load_dna2rna, load_rna2dna

KNN_GRID = {
    "n_neighbors": [5, 10, 20, 50],
    "weights": ["uniform", "distance"],
    "metric": ["euclidean", "manhattan"],
}


def optimize_knn(X_train, y_train, X_val, y_val, name="KNN", model_class=None):
    """Manual grid search on the val split (reference :56-94)."""
    from sklearn.metrics import mean_squared_error

    from vae_los_angeles_tpu.ops.knn import (
        ConditionedKNNRegressorTPU,
        KNNRegressorTPU,
        resolve_knn_regressor,
    )

    model_class = model_class or resolve_knn_regressor(len(X_train))
    print(f"\nOptimizing {name}...")
    best_mse, best_model, best_params = float("inf"), None, {}
    grid = dict(KNN_GRID)
    keys, values = zip(*grid.items())
    fused_mses = None
    if model_class in (KNNRegressorTPU, ConditionedKNNRegressorTPU):
        # fused grid: ONE distance pass per METRIC serves that metric's
        # whole (k, weights) sub-grid — the reference's 16 combos cost two
        # passes (euclidean on the MXU, manhattan on the VPU, ops/knn.py);
        # on multi-chip hosts the training matrix row-shards over the mesh
        # with the exact all-gather top-k merge
        # (parallel/sharded_eval.build_knn_grid_chunk)
        from vae_los_angeles_tpu.ops.knn import knn_grid_mse_tpu

        fused_mses = {
            metric: knn_grid_mse_tpu(
                X_train, y_train, X_val, y_val,
                ks=grid["n_neighbors"], modes=grid["weights"],
                conditioned=model_class is ConditionedKNNRegressorTPU,
                metric=metric,
            )
            for metric in grid.get("metric", ["euclidean"])
        }
    for combo in itertools.product(*values):
        p = dict(zip(keys, combo))
        # clamp k to the training size like the reference's conditioned model
        # (sklearn raises 'Expected n_neighbors <= n_samples' otherwise)
        if "n_neighbors" in p:
            p["n_neighbors"] = min(p["n_neighbors"], len(X_train))
        if fused_mses is not None:
            # the fused kernels already computed every combo's validation
            # MSE — no per-combo fit/predict dispatch
            mse = fused_mses[p.get("metric", "euclidean")][
                (p["n_neighbors"], p["weights"])]
            model = None
        else:
            model = model_class(**p)
            model.fit(X_train, y_train)
            preds = model.predict(X_val)
            mse = mean_squared_error(y_val, preds)
        if mse < best_mse:
            best_mse, best_model, best_params = mse, model, p
    if fused_mses is not None:
        # materialize only the winner (its fit reuses the device-put cache)
        best_model = model_class(**best_params).fit(X_train, y_train)
    print(f"Best {name} params: {best_params} | MSE: {best_mse:.4f}")
    return best_model


def create_boxplots(results, direction, plots_dir="plots"):
    """Per-sample-MSE boxplots, matplotlib + plotly (reference :138-177)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = os.path.join(plots_dir, "comparison")
    os.makedirs(out_dir, exist_ok=True)

    plot_data = list(results.values())
    labels = [f"{name}\n(Mean: {np.mean(m):.4f})" for name, m in results.items()]
    plt.figure(figsize=(10, 6))
    plt.boxplot(plot_data, tick_labels=labels, patch_artist=True)
    plt.title(f"Reconstruction Error Distribution ({direction})")
    plt.ylabel("Mean Squared Error (per sample)")
    plt.grid(True, axis="y", alpha=0.3)
    plt.xticks(rotation=15)
    plt_path = os.path.join(out_dir, f"boxplot_{direction}.png")
    plt.savefig(plt_path, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved matplotlib plot to {plt_path}")

    try:
        import plotly.graph_objects as go

        fig = go.Figure()
        for name, mses in results.items():
            fig.add_trace(go.Box(y=np.asarray(mses), name=name, boxpoints="outliers"))
        fig.update_layout(
            title=f"Reconstruction Error Distribution ({direction})",
            yaxis_title="Mean Squared Error",
            xaxis_title="Model",
            template="plotly_white",
        )
        plotly_path = os.path.join(out_dir, f"boxplot_{direction}.html")
        fig.write_html(plotly_path)
        print(f"Saved plotly plot to {plotly_path}")
    except ImportError:
        pass


def compute_and_plot_tsne(data, site_labels, title, filename_prefix,
                          plots_dir="plots"):
    """t-SNE of predictions colored by site (reference :180-232)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    from vae_los_angeles_tpu.ops.tsne import resolve_tsne

    TSNE = resolve_tsne(len(data))
    print(f"Computing t-SNE for {title}...")
    tsne = TSNE(n_components=2, random_state=42, perplexity=min(30, len(data) - 1))
    tsne_results = tsne.fit_transform(np.asarray(data))
    plot_df = pd.DataFrame(
        {
            "tsne_1": tsne_results[:, 0],
            "tsne_2": tsne_results[:, 1],
            "Primary Site": site_labels,
        }
    )
    out_dir = os.path.join(plots_dir, "comparison")
    os.makedirs(out_dir, exist_ok=True)
    plt.figure(figsize=(12, 8))
    try:
        import seaborn as sns

        sns.scatterplot(
            data=plot_df, x="tsne_1", y="tsne_2", hue="Primary Site",
            palette="tab10", s=100, alpha=0.7,
        )
    except ImportError:
        for site in plot_df["Primary Site"].unique():
            sub = plot_df[plot_df["Primary Site"] == site]
            plt.scatter(sub["tsne_1"], sub["tsne_2"], label=site, alpha=0.7)
    plt.title(f"t-SNE: {title}")
    plt.grid(True, alpha=0.3)
    plt.legend(bbox_to_anchor=(1.05, 1), loc="upper left")
    plt_path = os.path.join(out_dir, f"tsne_{filename_prefix}.png")
    plt.savefig(plt_path, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved t-SNE plot to {plt_path}")

    try:
        import plotly.express as px

        fig = px.scatter(
            plot_df, x="tsne_1", y="tsne_2", color="Primary Site",
            title=f"t-SNE: {title}", template="plotly_white",
        )
        fig.update_traces(marker=dict(size=10, opacity=0.8))
        fig.write_html(os.path.join(out_dir, f"tsne_{filename_prefix}.html"))
    except ImportError:
        pass


def _run_direction(direction, X_train, y_train, X_val, y_val, site_train,
                   site_val, site_val_labels, vae_model, vae_input_kw,
                   plots_dir, make_tsne=True):
    print("\n" + "=" * 50)
    print(f"COMPARISON: {direction.replace('_to_', ' -> ')}")
    print("=" * 50)
    results = {}
    prefix = "rna2dna" if direction == "RNA_to_DNA" else "dna2rna"

    knn = optimize_knn(X_train, y_train, X_val, y_val, name="KNN (Base)")
    preds = knn.predict(X_val)
    results["KNN (Base)"] = np.mean((preds - y_val) ** 2, axis=1)
    if make_tsne:
        compute_and_plot_tsne(
            preds, site_val_labels, f"KNN (Base) {direction}", f"{prefix}_knn_base",
            plots_dir,
        )

    from vae_los_angeles_tpu.ops.knn import resolve_conditioned_knn

    X_train_cond = np.column_stack([X_train, site_train])
    X_val_cond = np.column_stack([X_val, site_val])
    knn_cond = optimize_knn(
        X_train_cond, y_train, X_val_cond, y_val,
        name="KNN (Conditioned)",
        model_class=resolve_conditioned_knn(len(X_train_cond)),
    )
    preds = knn_cond.predict(X_val_cond)
    results["KNN (Cond)"] = np.mean((preds - y_val) ** 2, axis=1)
    if make_tsne:
        compute_and_plot_tsne(
            preds, site_val_labels, f"KNN (Cond) {direction}", f"{prefix}_knn_cond",
            plots_dir,
        )

    if vae_model is not None:
        vae_preds, _, _ = vae_model(site=site_val, **{vae_input_kw: X_val})
        results["VAE (Cond)"] = np.mean((vae_preds - y_val) ** 2, axis=1)
        if make_tsne:
            compute_and_plot_tsne(
                vae_preds, site_val_labels, f"VAE (Cond) {direction}",
                f"{prefix}_vae_cond", plots_dir,
            )

    create_boxplots(results, direction, plots_dir)
    return results


def main(cfg: Optional[Config] = None, make_tsne: bool = True):
    cfg = cfg or Config.from_env()
    dataset = MultiModalDataset.from_pickle(
        os.path.join(cfg.data_dir, "processed_data.pkl")
    )
    label_encoder = load_label_encoder(os.path.join(cfg.data_dir, "label_encoder.pkl"))

    tr_idx, va_idx = train_val_indices(len(dataset), cfg.train_test_split, cfg.random_seed)
    X_rna_train, X_rna_val = dataset.tpm_data[tr_idx], dataset.tpm_data[va_idx]
    X_dna_train, X_dna_val = dataset.beta_data[tr_idx], dataset.beta_data[va_idx]
    site_train, site_val = dataset.primary_site[tr_idx], dataset.primary_site[va_idx]
    site_val_labels = label_encoder.inverse_transform(site_val)

    rna2dna_model = load_rna2dna(cfg=cfg)
    dna2rna_model = load_dna2rna(cfg=cfg)

    results_rna2dna = _run_direction(
        "RNA_to_DNA", X_rna_train, X_dna_train, X_rna_val, X_dna_val,
        site_train, site_val, site_val_labels, rna2dna_model, "rna",
        cfg.plots_dir, make_tsne,
    )
    results_dna2rna = _run_direction(
        "DNA_to_RNA", X_dna_train, X_rna_train, X_dna_val, X_rna_val,
        site_train, site_val, site_val_labels, dna2rna_model, "dna",
        cfg.plots_dir, make_tsne,
    )
    print("\nComparison complete!")
    return results_rna2dna, results_dna2rna


if __name__ == "__main__":
    main()
