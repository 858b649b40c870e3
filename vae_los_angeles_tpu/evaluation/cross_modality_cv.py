"""k-fold cross-modal imputation benchmark (reference
``vae_cross_modality_cv.py``, 589 LoC — SURVEY §3.4, its wall-clock hot spot).

Benchmarks four model families in both directions on shared KFold indices:
mean baseline, kNN (grid over k), directional VAE, directional AE — with
per-fold metrics (Mean R², Global R², MSE, MAE, Cosine, per-sample Pearson),
paired t-tests between the best models, a summary table and plotly boxplots
per metric (``plots/plotly/cv_results_{metric}.html``).

TPU-native difference: the reference trains ``folds × directions`` full VAEs
sequentially; here every fold of a (direction, family) trains simultaneously
via `parallel.vmap_meta.fit_folds` — one compiled program per fold-shape
group (at most two). Each fold still gets the reference's exact inner
90/10 early-stopping split (train_test_split seed 42,
vae_cross_modality_cv.py:113-115) and plateau/early-stop schedule.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays, MultiModalDataset
from vae_los_angeles_tpu.data.splits import kfold_indices
from vae_los_angeles_tpu.ops.metrics import compute_cv_metrics
from vae_los_angeles_tpu.parallel import vmap_meta
from vae_los_angeles_tpu.training import engine

METRIC_NAMES = ["Mean R2", "Global R2", "MSE", "MAE", "Cosine Sim", "Pearson"]


class MeanRegressor:
    """Predicts the training-target column means (reference :58-69)."""

    def __init__(self):
        self.mean_vector = None

    def fit(self, X, y):
        self.mean_vector = np.mean(y, axis=0)

    def predict(self, X):
        return np.tile(self.mean_vector, (X.shape[0], 1))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Cross-modality CV benchmark")
    p.add_argument("--folds", type=int, default=10)
    p.add_argument("--subset", type=float, default=1.0,
                   help="fraction of the dataset to use")
    p.add_argument("--neighbors", type=int, nargs="+", default=[5, 10])
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--data_path", type=str, default="data/processed_data.pkl")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_data(data_path, subset=1.0):
    import pandas as pd

    df = pd.read_pickle(data_path)
    if subset < 1.0:
        df = df.sample(frac=subset, random_state=42)
    dataset = MultiModalDataset(df)
    return dataset.tpm_data, dataset.beta_data, dataset.primary_site


def _fold_arrays(rna, dna, site, idx):
    import jax.numpy as jnp

    return MultiModalArrays(
        tpm=jnp.asarray(rna[idx]), beta=jnp.asarray(dna[idx]), site=jnp.asarray(site[idx])
    )


def run_cross_validation(
    X, y, site, k_values, fold_indices, direction_name, model_type="knn",
    epochs=10, batch_size=32, seed=0,
):
    """One (direction, family) sweep over all folds; reference :285-414."""
    print(f"\nRunning Cross-Validation for {direction_name} ({model_type})...")
    results = []

    if model_type == "knn":
        params_to_test, param_name = k_values, "k"
    elif model_type in ("vae", "ae"):
        params_to_test, param_name = [epochs], "epochs"
    elif model_type == "mean":
        # "dummy" is the reference's own label for the baseline's param
        # column (vae_cross_modality_cv.py:302,576 → "mean | dummy=0")
        params_to_test, param_name = [0], "dummy"
    else:
        # a typo'd model_type would otherwise fall into the VAE branch and
        # report an untrained model's metrics under the bogus name
        raise ValueError(f"unknown model_type {model_type!r}")

    if direction_name not in ("RNA -> DNA", "DNA -> RNA"):
        raise ValueError(f"unknown direction {direction_name!r}")
    is_rna2dna = direction_name != "DNA -> RNA"
    # canonical array layout: tpm=RNA, beta=DNA regardless of direction
    rna_all = X if is_rna2dna else y
    dna_all = y if is_rna2dna else X
    task_name = ("rna2dna" if is_rna2dna else "dna2rna") + (
        "_ae" if model_type == "ae" else ""
    )

    for param in params_to_test:
        label = f"{param_name}={param}" if model_type != "mean" else "Mean Baseline"
        print(f"  Testing {label}...")
        fold_metrics = {k: [] for k in METRIC_NAMES}
        start_time = time.time()

        if model_type in ("mean", "knn"):
            from sklearn.neighbors import KNeighborsRegressor

            for train_index, val_index in fold_indices:
                if model_type == "knn":
                    model = KNeighborsRegressor(n_neighbors=param, n_jobs=-1)
                else:
                    model = MeanRegressor()
                model.fit(X[train_index], y[train_index])
                y_pred = model.predict(X[val_index])
                m = compute_cv_metrics(y[val_index], y_pred)
                for k in METRIC_NAMES:
                    fold_metrics[k].append(m[k])
        else:
            from sklearn.model_selection import train_test_split

            cfg = Config.from_env().replace(
                input_dim_a=rna_all.shape[1],
                input_dim_b=dna_all.shape[1],
                batch_size=batch_size,
            )
            n_sites = int(site.max() + 1)
            # per-fold inner 90/10 early-stopping split (reference :113-115)
            inner_train, inner_val, outer_val = [], [], []
            for train_index, val_index in fold_indices:
                tr_in, va_in = train_test_split(
                    train_index, test_size=0.1, random_state=42
                )
                inner_train.append(_fold_arrays(rna_all, dna_all, site, tr_in))
                inner_val.append(_fold_arrays(rna_all, dna_all, site, va_in))
                outer_val.append(_fold_arrays(rna_all, dna_all, site, val_index))

            fits = vmap_meta.fit_folds(
                task_name, cfg, inner_train, inner_val,
                jax.random.PRNGKey(seed), n_sites,
                num_epochs=param, drop_last=False,
                # multi-chip: folds shard over all visible devices
                mesh=vmap_meta.population_mesh(),
            )
            for fold_idx, fit_res in enumerate(fits):
                pred = np.asarray(
                    engine.predict(
                        task_name, fit_res.params, fit_res.state, outer_val[fold_idx]
                    )
                )
                truth = np.asarray(
                    outer_val[fold_idx].beta if is_rna2dna else outer_val[fold_idx].tpm
                )
                m = compute_cv_metrics(truth, pred)
                for k in METRIC_NAMES:
                    fold_metrics[k].append(m[k])

        elapsed = time.time() - start_time
        aggregated = {
            "direction": direction_name,
            "model": model_type,
            "param_name": param_name,
            "param_value": param,
            "time": elapsed,
            "fold_metrics": fold_metrics,
        }
        for name in fold_metrics:
            aggregated[f"mean_{name}"] = float(np.mean(fold_metrics[name]))
            aggregated[f"std_{name}"] = float(np.std(fold_metrics[name]))
        print(
            f"    Mean R2 = {aggregated['mean_Mean R2']:.4f} "
            f"(+/- {aggregated['std_Mean R2']:.4f})"
        )
        print(
            f"    MSE     = {aggregated['mean_MSE']:.4f} "
            f"(+/- {aggregated['std_MSE']:.4f})"
        )
        results.append(aggregated)
    return results


def perform_statistical_comparison(results, metric="Mean R2"):
    """Paired t-tests between best models per direction (reference :453-530)."""
    from scipy import stats

    print("\n" + "=" * 80)
    print(f"STATISTICAL COMPARISON (Paired t-test) on {metric}")
    print("=" * 80)
    for direction in sorted({r["direction"] for r in results}):
        print(f"\nDirection: {direction}")
        dir_results = [r for r in results if r["direction"] == direction]
        knn_results = [r for r in dir_results if r["model"] == "knn"]
        vae_results = [r for r in dir_results if r["model"] == "vae"]
        ae_results = [r for r in dir_results if r["model"] == "ae"]
        mean_results = [r for r in dir_results if r["model"] == "mean"]
        if not knn_results or not vae_results:
            continue
        # the reference deliberately selects the "best" configuration by
        # Mean R2 for EVERY compared metric ("Let's stick to using Mean R2
        # to select the best configuration, then compare them on the
        # specific metric", vae_cross_modality_cv.py:466-468) — so an MSE
        # t-test may pair configs that are not MSE-best; kept for parity
        best_knn = max(knn_results, key=lambda x: x["mean_Mean R2"])
        best_vae = max(vae_results, key=lambda x: x["mean_Mean R2"])
        knn_scores = best_knn["fold_metrics"][metric]
        vae_scores = best_vae["fold_metrics"][metric]
        t_stat, p_val = stats.ttest_rel(knn_scores, vae_scores)
        print(f"  Best kNN: k={best_knn['param_value']} ({metric}={np.mean(knn_scores):.4f})")
        print(f"  Best VAE: epochs={best_vae['param_value']} ({metric}={np.mean(vae_scores):.4f})")
        if ae_results:
            best_ae = max(ae_results, key=lambda x: x["mean_Mean R2"])
            ae_scores = best_ae["fold_metrics"][metric]
            print(f"  Best AE: epochs={best_ae['param_value']} ({metric}={np.mean(ae_scores):.4f})")
            t_av, p_av = stats.ttest_rel(ae_scores, vae_scores)
            print(f"  AE vs VAE: t={t_av:.4f}, p={p_av:.4e}")
            t_ak, p_ak = stats.ttest_rel(ae_scores, knn_scores)
            print(f"  AE vs kNN: t={t_ak:.4f}, p={p_ak:.4e}")
        if mean_results:
            mean_scores = mean_results[0]["fold_metrics"][metric]
            print(f"  Mean Baseline: ({metric}={np.mean(mean_scores):.4f})")
            t_m, p_m = stats.ttest_rel(vae_scores, mean_scores)
            print(f"  VAE vs Mean: t={t_m:.4f}, p={p_m:.4e}")
        print(f"  VAE vs kNN: t={t_stat:.4f}, p={p_val:.4e}")
        if p_val < 0.05:
            higher_better = any(x in metric for x in ["R2", "Cosine", "Pearson"])
            mk, mv = np.mean(knn_scores), np.mean(vae_scores)
            winner = (
                ("kNN" if mk > mv else "VAE")
                if higher_better
                else ("kNN" if mk < mv else "VAE")
            )
            print(f"  -> Significant difference! {winner} performs better.")
        else:
            print("  -> No significant difference detected (p >= 0.05).")


def create_plotly_plots(results, output_dir="plots/plotly"):
    try:
        import pandas as pd
        import plotly.express as px
    except ImportError:
        print("plotly unavailable; skipping CV plots")
        return
    print(f"Creating Plotly plots in {output_dir}...")
    os.makedirs(output_dir, exist_ok=True)
    for metric in METRIC_NAMES:
        plot_data = []
        for res in results:
            label = res["model"]
            if res["model"] == "knn":
                label += f" (k={res['param_value']})"
            elif res["model"] in ("vae", "ae"):
                label += f" (ep={res['param_value']})"
            for score in res["fold_metrics"][metric]:
                plot_data.append(
                    {"Direction": res["direction"], "Model": label, "Score": score}
                )
        df = pd.DataFrame(plot_data)
        fig = px.box(
            df, x="Model", y="Score", color="Direction",
            title=f"Cross-Validation {metric}", points="all",
        )
        fig.update_layout(template="plotly_white")
        safe = metric.lower().replace(" ", "_")
        fig.write_html(f"{output_dir}/cv_results_{safe}.html")
    print("Plotly plots saved.")


def main(argv=None):
    args = parse_args(argv)
    rna_data, dna_data, site_data = load_data(args.data_path, args.subset)

    print(f"\nGenerating {args.folds} folds to be used across all models...")
    fold_indices = kfold_indices(len(rna_data), args.folds, seed=42)

    all_results = []
    for direction, X, y in (
        ("DNA -> RNA", dna_data, rna_data),
        ("RNA -> DNA", rna_data, dna_data),
    ):
        print(f"\n--- Processing {direction} ---")
        common = dict(epochs=args.epochs, batch_size=args.batch_size, seed=args.seed)
        all_results.extend(
            run_cross_validation(X, y, site_data, [], fold_indices, direction, "mean")
        )
        all_results.extend(
            run_cross_validation(
                X, y, site_data, args.neighbors, fold_indices, direction, "knn"
            )
        )
        all_results.extend(
            run_cross_validation(
                X, y, site_data, [], fold_indices, direction, "vae", **common
            )
        )
        all_results.extend(
            run_cross_validation(
                X, y, site_data, [], fold_indices, direction, "ae", **common
            )
        )

    print("\n" + "=" * 120)
    print("FINAL RESULTS SUMMARY (Mean R2 & MSE)")
    print("(VAE/AE times include the one-time XLA compilation of their "
          "vmapped fold populations; kNN/mean rows are sklearn host time)")
    print("=" * 120)
    print(
        f"{'Direction':<12} | {'Model':<5} | {'Param':<10} | {'Mean R2':<10} | "
        f"{'Std':<8} | {'MSE':<10} | {'Std':<8} | {'Time (s)':<8}"
    )
    print("-" * 120)
    for res in all_results:
        print(
            f"{res['direction']:<12} | {res['model']:<5} | "
            f"{res['param_name']}={res['param_value']:<6} | "
            f"{res['mean_Mean R2']:<10.4f} | {res['std_Mean R2']:<8.4f} | "
            f"{res['mean_MSE']:<10.4f} | {res['std_MSE']:<8.4f} | {res['time']:<8.2f}"
        )
    print("=" * 120)

    perform_statistical_comparison(all_results, metric="Mean R2")
    perform_statistical_comparison(all_results, metric="MSE")
    perform_statistical_comparison(all_results, metric="Pearson")
    create_plotly_plots(all_results)
    return all_results


if __name__ == "__main__":
    main()
