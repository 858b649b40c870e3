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
    p.add_argument(
        "--unified-families", action="store_true", default=None,
        help="train each direction's VAE and AE fold populations as ONE "
        "compiled program (2 XLA programs instead of 4 — the harness is "
        "compile-dominated). The VAE half is bit-identical to the separate "
        "program; the AE half is the same math as the standalone AE task "
        "(see training/tasks.py _unified_init) with a different param "
        "naming/key layout, so its per-fold numbers are statistically "
        "equivalent, not bit-equal, to --no-unified runs. Default: "
        "CV_UNIFIED_FAMILIES env (1/0/auto; auto = ON where compile cost "
        "is local, i.e. the CPU backend, OFF on relay-compiled TPU)",
    )
    p.add_argument(
        "--no-unified-families", dest="unified_families",
        action="store_false", help="force the 4-program separate-family CV",
    )
    args = p.parse_args(argv)
    args.unified_families = resolve_unified_families(args.unified_families)
    return args


def resolve_unified_families(explicit=None) -> bool:
    """CV_UNIFIED_FAMILIES policy: '1'/'0' force, 'auto' (default) keys on
    the compile regime. On the CPU backend (tests, CI, local dev) family
    unification is a measured 1.71× program-cost cut → ON. On the relay
    the round-3 measurement said the win was swamped by compile variance
    — but that was against the EXACT-shape 8-program stack; under the
    masked fold populations (POP_MASK_SIZES, round 5) the whole CV demo
    is 2 programs unified vs 4 separate, measured SAME-session at
    round-5 HEAD: 158.6 s (unified, first-ever compiles) vs 218.8 s
    (separate, relay-warm programs — a handicap AGAINST unified) → ON.
    Only the exact-shape mode on an accelerator keeps the round-3
    conclusion. An explicit CLI flag always wins."""
    if explicit is not None:
        return bool(explicit)
    env = os.getenv("CV_UNIFIED_FAMILIES", "auto").strip().lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    if env != "auto":
        raise ValueError(
            f"CV_UNIFIED_FAMILIES={env!r}; valid: 1, 0, auto (default)"
        )
    import jax

    from vae_los_angeles_tpu.parallel.vmap_meta import mask_sizes_enabled

    return jax.default_backend() == "cpu" or mask_sizes_enabled()


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

    if model_type == "knn":
        from vae_los_angeles_tpu.ops.knn import (
            KNNRegressorTPU,
            resolve_knn_regressor,
        )

        if resolve_knn_regressor(len(X)) is KNNRegressorTPU:
            # EVAL_BACKEND=tpu: ONE distance pass per fold serves every
            # swept k (sorted-top-k prefix reductions,
            # ops/knn.predict_multi_k; row-sharded over the mesh with an
            # exact top-k merge on multi-chip hosts) instead of re-running
            # the O(m·n·dim) matmul per k. Per-fold numbers are identical
            # to the per-k path; the swept params share one wall-clock
            # (the same combined-`time` convention as the unified
            # families).
            print("  Testing "
                  + ", ".join(f"k={p}" for p in params_to_test)
                  + " (one fused pass per fold)...")
            start_time = time.time()
            per_param = {p: {k: [] for k in METRIC_NAMES}
                         for p in params_to_test}
            for train_index, val_index in fold_indices:
                model = KNNRegressorTPU().fit(X[train_index], y[train_index])
                preds = model.predict_multi_k(X[val_index], params_to_test)
                for param in params_to_test:
                    m = compute_cv_metrics(
                        y[val_index], preds[min(param, len(train_index))]
                    )
                    for k in METRIC_NAMES:
                        per_param[param][k].append(m[k])
            elapsed = time.time() - start_time
            return [
                _aggregate_sweep(direction_name, model_type, param_name,
                                 param, elapsed, per_param[param])
                for param in params_to_test
            ]

    for param in params_to_test:
        label = f"{param_name}={param}" if model_type != "mean" else "Mean Baseline"
        print(f"  Testing {label}...")
        fold_metrics = {k: [] for k in METRIC_NAMES}
        start_time = time.time()

        if model_type in ("mean", "knn"):
            from vae_los_angeles_tpu.ops.knn import resolve_knn_regressor

            knn_cls = resolve_knn_regressor(len(X))  # EVAL_BACKEND policy
            for train_index, val_index in fold_indices:
                if model_type == "knn":
                    model = knn_cls(n_neighbors=param, n_jobs=-1)
                else:
                    model = MeanRegressor()
                model.fit(X[train_index], y[train_index])
                y_pred = model.predict(X[val_index])
                m = compute_cv_metrics(y[val_index], y_pred)
                for k in METRIC_NAMES:
                    fold_metrics[k].append(m[k])
        else:
            cfg, inner_train, inner_val, outer_val = _prep_nn_folds(
                rna_all, dna_all, site, fold_indices, batch_size
            )
            n_sites = int(site.max() + 1)
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
                        task_name, fit_res.params, fit_res.state,
                        outer_val[fold_idx],
                        # score with the dtype the folds trained with, so the
                        # CV numbers describe the configuration as served
                        compute_dtype=cfg.compute_dtype,
                    )
                )
                truth = np.asarray(
                    outer_val[fold_idx].beta if is_rna2dna else outer_val[fold_idx].tpm
                )
                m = compute_cv_metrics(truth, pred)
                for k in METRIC_NAMES:
                    fold_metrics[k].append(m[k])

        elapsed = time.time() - start_time
        results.append(
            _aggregate_sweep(
                direction_name, model_type, param_name, param, elapsed,
                fold_metrics,
            )
        )
    return results


def _prep_nn_folds(rna_all, dna_all, site, fold_indices, batch_size):
    """Shared fold prep for the NN sweeps: per-fold inner 90/10 early-stop
    split (reference :113-115) + canonical Config."""
    from sklearn.model_selection import train_test_split

    cfg = Config.from_env().replace(
        input_dim_a=rna_all.shape[1],
        input_dim_b=dna_all.shape[1],
        batch_size=batch_size,
    )
    inner_train, inner_val, outer_val = [], [], []
    for train_index, val_index in fold_indices:
        tr_in, va_in = train_test_split(train_index, test_size=0.1,
                                        random_state=42)
        inner_train.append(_fold_arrays(rna_all, dna_all, site, tr_in))
        inner_val.append(_fold_arrays(rna_all, dna_all, site, va_in))
        outer_val.append(_fold_arrays(rna_all, dna_all, site, val_index))
    return cfg, inner_train, inner_val, outer_val


def _aggregate_sweep(direction_name, model, param_name, param_value,
                     elapsed, fold_metrics, quiet=False):
    """One sweep's aggregated result record (the schema tidy_results /
    pairwise_tests / the summary table consume) — shared by the standalone
    and unified runners so the rows cannot drift apart."""
    aggregated = {
        "direction": direction_name,
        "model": model,
        "param_name": param_name,
        "param_value": param_value,
        "time": elapsed,
        "fold_metrics": fold_metrics,
    }
    for name in fold_metrics:
        aggregated[f"mean_{name}"] = float(np.mean(fold_metrics[name]))
        aggregated[f"std_{name}"] = float(np.std(fold_metrics[name]))
    if not quiet:
        print(
            f"    Mean R2 = {aggregated['mean_Mean R2']:.4f} "
            f"(+/- {aggregated['std_Mean R2']:.4f})"
        )
        print(
            f"    MSE     = {aggregated['mean_MSE']:.4f} "
            f"(+/- {aggregated['std_MSE']:.4f})"
        )
    return aggregated


def run_unified_direction(X, y, site, fold_indices, direction_name,
                          epochs=10, batch_size=32, seed=0):
    """One direction's VAE **and** AE fold populations through ONE compiled
    program (task ``*_unified``; VERDICT r2 #5 — the CV harness is
    compile-dominated, and the AE loss/arch is the VAE's with β=0 and
    z = mu, so the pair shares an executable selected per member by the
    ``kl_on`` state scalar).

    The shared executable is driven TWICE (kl_on=1 folds, then kl_on=0
    folds) rather than as one doubled population: the vmapped-fit/init
    caches key on shapes and task, so the second call reuses the first
    call's compiled program, and the fold data stays resident ONCE instead
    of being physically duplicated into a 2F-member stack — at real-data
    width the fold tables dominate HBM. The VAE call reuses the standalone
    sweep's per-fold key rows and trains bit-identically to
    ``run_cross_validation(model_type="vae")``. Returns the same two
    aggregated result dicts the separate sweeps produce; their ``time``
    fields each carry the COMBINED wall (one compile served both).
    """
    print(f"\nRunning unified VAE+AE Cross-Validation for {direction_name}...")
    if direction_name not in ("RNA -> DNA", "DNA -> RNA"):
        raise ValueError(f"unknown direction {direction_name!r}")
    is_rna2dna = direction_name != "DNA -> RNA"
    rna_all = X if is_rna2dna else y
    dna_all = y if is_rna2dna else X
    task_name = ("rna2dna" if is_rna2dna else "dna2rna") + "_unified"

    cfg, inner_train, inner_val, outer_val = _prep_nn_folds(
        rna_all, dna_all, site, fold_indices, batch_size
    )
    n_sites = int(site.max() + 1)
    n_folds = len(fold_indices)
    start_time = time.time()

    fold_keys = jax.random.split(jax.random.PRNGKey(seed), n_folds)
    family_metrics = {}
    for family, kl_on in (("vae", 1.0), ("ae", 0.0)):
        fits = vmap_meta.fit_folds(
            task_name, cfg, inner_train, inner_val,
            jax.random.PRNGKey(seed), n_sites,
            num_epochs=epochs, drop_last=False,
            mesh=vmap_meta.population_mesh(),
            keys=fold_keys,
            state_overrides={
                "kl_on": np.full(n_folds, kl_on, np.float32)
            },
        )
        fold_metrics = {k: [] for k in METRIC_NAMES}
        for fold_idx, fit_res in enumerate(fits):
            pred = np.asarray(
                engine.predict(
                    task_name, fit_res.params, fit_res.state,
                    outer_val[fold_idx], compute_dtype=cfg.compute_dtype,
                )
            )
            truth = np.asarray(
                outer_val[fold_idx].beta if is_rna2dna
                else outer_val[fold_idx].tpm
            )
            m = compute_cv_metrics(truth, pred)
            for k in METRIC_NAMES:
                fold_metrics[k].append(m[k])
        family_metrics[family] = fold_metrics

    elapsed = time.time() - start_time
    results = []
    for family in ("vae", "ae"):
        aggregated = _aggregate_sweep(
            direction_name, family, "epochs", epochs, elapsed,
            family_metrics[family], quiet=True,
        )
        print(
            f"  [{family}] Mean R2 = {aggregated['mean_Mean R2']:.4f} "
            f"(+/- {aggregated['std_Mean R2']:.4f}), "
            f"MSE = {aggregated['mean_MSE']:.4f}"
        )
        results.append(aggregated)
    return results


def _config_label(res) -> str:
    """Display label for a swept configuration, e.g. "knn (k=5)"."""
    if res["model"] == "knn":
        return f"knn (k={res['param_value']})"
    if res["model"] in ("vae", "ae"):
        return f"{res['model']} (ep={res['param_value']})"
    return res["model"]


def tidy_results(results):
    """Long-form scores frame: one row per (direction, model, config, fold,
    metric). The framework's canonical CV-results structure — the renderers
    below (t-test table, plotly boxplots) are all views over it."""
    import pandas as pd

    rows = []
    for res in results:
        label = _config_label(res)
        for metric, scores in res["fold_metrics"].items():
            for fold, score in enumerate(scores):
                rows.append(
                    {
                        "Direction": res["direction"],
                        "Model": res["model"],
                        "Config": label,
                        "Fold": fold,
                        "Metric": metric,
                        "Score": score,
                    }
                )
    return pd.DataFrame(rows)


# The pairings the reference reports (vae_cross_modality_cv.py:485-513):
# each tuple is (A, B) for a paired t-test on A's vs B's per-fold scores.
_TEST_PAIRS = (("ae", "vae"), ("ae", "knn"), ("vae", "mean"), ("vae", "knn"))
_HIGHER_BETTER_TOKENS = ("R2", "Cosine", "Pearson")


def pairwise_tests(results, metric="Mean R2"):
    """Paired t-tests between the per-direction best configurations.

    Returns a tidy frame (Direction, A, B, A_config, B_config, A_mean,
    B_mean, t, p, winner); winner is the significantly better side at
    p<0.05, else None. Selection quirk preserved from the reference: the
    "best" configuration of each family is chosen by Mean R2 for EVERY
    compared metric ("Let's stick to using Mean R2 to select the best
    configuration, then compare them on the specific metric",
    vae_cross_modality_cv.py:466-468) — so an MSE t-test may pair configs
    that are not MSE-best.
    """
    import pandas as pd
    from scipy import stats

    higher_better = any(tok in metric for tok in _HIGHER_BETTER_TOKENS)
    rows = []
    for direction in sorted({r["direction"] for r in results}):
        best = {}
        for r in results:
            if r["direction"] != direction:
                continue
            cur = best.get(r["model"])
            if cur is None or r["mean_Mean R2"] > cur["mean_Mean R2"]:
                best[r["model"]] = r
        if "knn" not in best or "vae" not in best:
            continue  # reference :476-477 skips directions missing either
        for a, b in _TEST_PAIRS:
            if a not in best or b not in best:
                continue
            sa = best[a]["fold_metrics"][metric]
            sb = best[b]["fold_metrics"][metric]
            t, p = stats.ttest_rel(sa, sb)
            ma, mb = float(np.mean(sa)), float(np.mean(sb))
            winner = None
            if p < 0.05:
                winner = (a if ma > mb else b) if higher_better else (
                    a if ma < mb else b
                )
            rows.append(
                {
                    "Direction": direction,
                    "A": a,
                    "B": b,
                    "A_config": _config_label(best[a]),
                    "B_config": _config_label(best[b]),
                    "A_mean": ma,
                    "B_mean": mb,
                    "t": float(t),
                    "p": float(p),
                    "winner": winner,
                }
            )
    return pd.DataFrame(rows)


def perform_statistical_comparison(results, metric="Mean R2"):
    """Compute and print the paired-t-test table for one metric.

    Same information as the reference's console report (:453-530) rendered
    from the `pairwise_tests` frame. Returns the frame so callers can
    persist or post-process it."""
    tests = pairwise_tests(results, metric)
    print("\n" + "=" * 80)
    print(f"STATISTICAL COMPARISON (Paired t-test) on {metric}")
    print("=" * 80)
    if tests.empty:
        print("(needs at least one knn and one vae result per direction)")
        return tests
    for direction, sub in tests.groupby("Direction", sort=True):
        print(f"\nDirection: {direction}")
        for _, row in sub.iterrows():
            print(
                f"  {row['A_config']} vs {row['B_config']} on {metric}: "
                f"{row['A_mean']:.4f} vs {row['B_mean']:.4f} | "
                f"t={row['t']:.4f}, p={row['p']:.4e}"
                + (
                    # isinstance, not truthiness: pandas stores the None
                    # winner as float NaN, which is truthy and would print
                    # "nan significantly better" for non-significant pairs
                    f"  -> {row['winner']} significantly better"
                    if isinstance(row["winner"], str)
                    else "  -> no significant difference (p >= 0.05)"
                )
            )
    return tests


def create_plotly_plots(results, output_dir="plots/plotly"):
    """Per-metric boxplots over the tidy frame
    (reference artifact names preserved: cv_results_{metric}.html)."""
    try:
        import plotly.express as px
    except ImportError:
        print("plotly unavailable; skipping CV plots")
        return
    print(f"Creating Plotly plots in {output_dir}...")
    os.makedirs(output_dir, exist_ok=True)
    frame = tidy_results(results)
    for metric, sub in frame.groupby("Metric", sort=False):
        fig = px.box(
            sub, x="Config", y="Score", color="Direction",
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

    # The harness compiles one vmapped fold-population program per
    # (direction, family) — four distinct XLA programs that dominate the
    # wall (round-1: 518 s end-to-end vs ~80 s of training at n=4000).
    # Overlapping those compiles from threads was measured and REJECTED on
    # both backends (benchmarks/RESULTS.md "sweep-concurrency anti-result"):
    # the axon relay's remote compile service serializes compiles per
    # client, so threaded sweeps all block on one queue (518 s → 1422 s,
    # 2.7× SLOWER, with even the sklearn sweeps stuck behind the jitted-
    # metrics compile), and on CPU the local XLA compiler is itself
    # multi-threaded so overlap oversubscribes cores (~1.3× slower on the
    # CI mesh). Sweeps therefore run sequentially; CV_PARALLEL_SWEEPS=<n>
    # opts into a thread pool on platforms whose compiler genuinely
    # parallelizes across programs.
    from concurrent.futures import ThreadPoolExecutor

    common = dict(epochs=args.epochs, batch_size=args.batch_size, seed=args.seed)
    sweeps = []  # (callable, args, kwargs)
    for direction, X, y in (
        ("DNA -> RNA", dna_data, rna_data),
        ("RNA -> DNA", rna_data, dna_data),
    ):
        sweeps += [
            (run_cross_validation,
             (X, y, site_data, [], fold_indices, direction, "mean"), {}),
            (run_cross_validation,
             (X, y, site_data, args.neighbors, fold_indices, direction,
              "knn"), {}),
        ]
        if args.unified_families:
            # one compiled program per direction for BOTH NN families
            sweeps.append(
                (run_unified_direction,
                 (X, y, site_data, fold_indices, direction), common)
            )
        else:
            sweeps += [
                (run_cross_validation,
                 (X, y, site_data, [], fold_indices, direction, fam), common)
                for fam in ("vae", "ae")
            ]
    n_workers = int(os.getenv("CV_PARALLEL_SWEEPS", "1"))
    all_results = []
    with ThreadPoolExecutor(max_workers=max(1, n_workers)) as pool:
        futures = [pool.submit(fn, *a, **kw) for fn, a, kw in sweeps]
        for f in futures:  # input order preserved → deterministic report
            all_results.extend(f.result())

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
