"""End-to-end pipeline test: prepare → train×3 → every evaluation surface.

Exercises the full reference-equivalent workflow (SURVEY §1 L1-L7) on small
synthetic data, on CPU. Module-scoped fixtures share one workspace so each
surface is tested against real checkpoints and the real artifact protocol.
"""

import json
import os

import numpy as np
import pytest

from vae_los_angeles_tpu.config import Config

DIM_A, DIM_B, N_SITES = 25, 31, 6
CFG = Config(
    input_dim_a=DIM_A,
    input_dim_b=DIM_B,
    latent_dim=6,
    batch_size=32,
    num_epochs=6,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Synthetic data + all three trained checkpoints in one directory."""
    ws = tmp_path_factory.mktemp("pipeline")
    old_cwd = os.getcwd()
    os.chdir(ws)
    try:
        from vae_los_angeles_tpu.data.synthetic import write_synthetic_artifacts

        write_synthetic_artifacts(
            "data", n_samples=400, dim_a=DIM_A, dim_b=DIM_B, n_sites=N_SITES,
            n_unmatched=48,
        )
        # config env would normally carry dims; here pass cfg explicitly
        from vae_los_angeles_tpu.training.cli import run_training

        run_training("rna2dna", "rna2dna", cfg=CFG, argv=["--epochs", "6"])
        run_training("dna2rna", "dna2rna", cfg=CFG, argv=["--epochs", "6"])
        run_training(
            "multimodal", "multivae", cfg=CFG, use_class_weights=True,
            argv=["--epochs", "6"],
        )
        yield ws
    finally:
        os.chdir(old_cwd)


def test_prepared_artifacts(workspace):
    for name in (
        "processed_data.pkl",
        "label_encoder.pkl",
        "rna_only_unmatched.pkl",
        "dna_only_unmatched.pkl",
        "feature_names.pkl",
    ):
        assert (workspace / "data" / name).exists(), name


def test_evaluate_contract(workspace):
    """The reconstructed missing-evaluate.py contract end to end."""
    from vae_los_angeles_tpu.evaluation.evaluate import get_run_id, main

    assert get_run_id("multivae") is not None
    results = main(cfg=CFG)
    out = workspace / "plots" / "evaluation_results.json"
    assert out.exists()
    assert any(workspace.glob("plots/reconstruction_example_*.png"))
    assert (workspace / "plots" / "pearson_distributions.png").exists()
    saved = json.loads(out.read_text())
    assert {r["Modality"] for r in saved["results"]} == {
        "DNA methylation",
        "RNA expression",
    }
    for r in results:
        for k in ("MSE", "MAE", "CosineSimilarity", "PearsonMean"):
            assert np.isfinite(r[k])


def test_compare_directional_imputation(workspace):
    from vae_los_angeles_tpu.evaluation.compare_directional_imputation import main

    results = main(cfg=CFG)
    models = {(r["Modality"], r["Model"]) for r in results}
    assert ("DNA methylation", "RNA2DNAVAE") in models
    assert ("RNA expression", "Mean Imputation") in models
    assert ("RNA expression", "k-NN Imputation") in models
    out_dirs = list((workspace / "plots").glob("directional_comparison_*"))
    assert out_dirs
    assert (out_dirs[0] / "comparison_results.csv").exists()
    assert (out_dirs[0] / "comparison_results.json").exists()


def test_reconstruct_unmatched_and_clustering(workspace):
    from vae_los_angeles_tpu.evaluation.reconstruct_unmatched import main as recon_main

    rna_df, dna_df = recon_main(cfg=CFG)
    assert rna_df is not None and "reconstructed_beta_value" in rna_df.columns
    assert dna_df is not None and "reconstructed_tpm_unstranded" in dna_df.columns
    # reconstructed beta values are valid probabilities
    betas = np.stack(rna_df["reconstructed_beta_value"].values)
    assert betas.min() >= 0 and betas.max() <= 1

    from vae_los_angeles_tpu.evaluation.clustering.cluster_reconstructed import (
        main as cluster_main,
    )

    results = cluster_main(cfg=CFG)
    assert any(r is not None for r in results)
    summaries = list((workspace / "plots" / "clustering").glob("clustering_summary_*"))
    assert summaries


def test_cluster_imputation_methods(workspace):
    from vae_los_angeles_tpu.evaluation.clustering.cluster_imputation_methods import (
        main as cim_main,
    )

    results = cim_main(cfg=CFG)
    assert results
    methods = {r["method"] for r in results}
    assert "Mean" in methods and "KNN" in methods


def test_knn_comparison(workspace):
    from vae_los_angeles_tpu.evaluation.knn_comparison import main as knn_main

    r1, r2 = knn_main(cfg=CFG, make_tsne=False)
    assert "KNN (Base)" in r1 and "KNN (Cond)" in r1 and "VAE (Cond)" in r1
    assert (workspace / "plots" / "comparison" / "boxplot_RNA_to_DNA.png").exists()


def test_downstream_directional(workspace):
    from vae_los_angeles_tpu.evaluation.downstream_directional import main as dd_main

    metrics = dd_main(cfg=CFG)
    assert set(metrics.keys()) == {
        "Orig. RNA",
        "Orig. RNA + Est. DNA",
        "Orig. DNA + Est. RNA",
        "Orig. RNA + Orig. DNA",
    }
    for report in metrics.values():
        assert 0.0 <= report["accuracy"] <= 1.0


def test_create_boxplots(workspace):
    from vae_los_angeles_tpu.evaluation.create_boxplots import main as boxplot_main

    boxplot_main(cfg=CFG)
    for name in (
        "rna_genes_distribution_highest_variance.png",
        "dna_cpg_distribution_lowest_variance.png",
    ):
        assert (workspace / "plots" / name).exists()


def test_cross_modality_cv(workspace):
    from vae_los_angeles_tpu.evaluation.cross_modality_cv import main as cv_main

    results = cv_main(
        [
            "--folds", "3", "--epochs", "3", "--neighbors", "3",
            "--data_path", "data/processed_data.pkl",
        ]
    )
    kinds = {(r["direction"], r["model"]) for r in results}
    for direction in ("DNA -> RNA", "RNA -> DNA"):
        for model in ("mean", "knn", "vae", "ae"):
            assert (direction, model) in kinds
    # every result carries 3 folds of all 6 metrics
    for r in results:
        for metric, scores in r["fold_metrics"].items():
            assert len(scores) == 3
    # the VAE should beat the mean baseline on MSE in at least one direction
    mse = {
        (r["direction"], r["model"]): r["mean_MSE"]
        for r in results
        if r["model"] in ("mean", "vae")
    }
    assert any(
        mse[(d, "vae")] < mse[(d, "mean")] for d in ("DNA -> RNA", "RNA -> DNA")
    )
    try:
        import plotly  # noqa: F401

        assert (workspace / "plots" / "plotly" / "cv_results_mse.html").exists()
    except ImportError:
        pass  # plotly optional; CV gracefully skips the html plots


def test_cross_modality_cv_unified_families(workspace):
    """--unified-families: VAE+AE of a direction train as ONE program; the
    report still carries all four families per direction, and the VAE rows
    are bit-identical to the separate-program run (same fold keys).
    CV_UNIFIED_FAMILIES=auto resolves to unified on the CPU backend, so the
    separate run must be forced with --no-unified-families."""
    from vae_los_angeles_tpu.evaluation.cross_modality_cv import (
        main as cv_main,
        resolve_unified_families,
    )

    # auto policy: compile cost is local on CPU → unified is the default
    assert resolve_unified_families(None) is True
    assert resolve_unified_families(False) is False
    # round-5 rule: on an accelerator, auto keys on the masked-population
    # mode (unified halves the 4-program masked stack; measured 158.6 s vs
    # 218.8 s same-session — RESULTS.md), keeping round-3's OFF only for
    # the exact-shape mode
    import jax

    import vae_los_angeles_tpu.evaluation.cross_modality_cv as cvmod

    orig_backend = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        assert resolve_unified_families(None) is True  # masked default
        os.environ["POP_MASK_SIZES"] = "0"
        try:
            assert resolve_unified_families(None) is False  # exact shapes
        finally:
            os.environ.pop("POP_MASK_SIZES", None)
    finally:
        jax.default_backend = orig_backend

    argv = ["--folds", "2", "--epochs", "2", "--neighbors", "3",
            "--data_path", "data/processed_data.pkl"]
    unified = cv_main(argv + ["--unified-families"])
    kinds = {(r["direction"], r["model"]) for r in unified}
    for direction in ("DNA -> RNA", "RNA -> DNA"):
        for model in ("mean", "knn", "vae", "ae"):
            assert (direction, model) in kinds
    separate = cv_main(argv + ["--no-unified-families"])
    for r_u in unified:
        if r_u["model"] != "vae":
            continue
        r_s = next(
            r for r in separate
            if r["model"] == "vae" and r["direction"] == r_u["direction"]
        )
        for metric in r_u["fold_metrics"]:
            np.testing.assert_array_equal(
                np.asarray(r_u["fold_metrics"][metric]),
                np.asarray(r_s["fold_metrics"][metric]),
                err_msg=f"{r_u['direction']} vae {metric} must be identical",
            )


def test_cross_modality_cv_parallel_sweeps(workspace, monkeypatch):
    """Sweeps run sequentially by default (threaded compile overlap measured
    2.7× slower on the relay — RESULTS.md); CV_PARALLEL_SWEEPS opts into the
    thread pool, forced on here so the concurrency path stays CI-covered."""
    monkeypatch.setenv("CV_PARALLEL_SWEEPS", "8")
    from vae_los_angeles_tpu.evaluation.cross_modality_cv import main as cv_main

    results = cv_main(
        ["--folds", "2", "--epochs", "2", "--neighbors", "3",
         "--data_path", "data/processed_data.pkl"]
    )
    kinds = {(r["direction"], r["model"]) for r in results}
    assert len(kinds) == 8  # 4 families × 2 directions, all completed
    for r in results:
        assert np.isfinite(r["mean_MSE"])


def test_hpo_vmapped(workspace):
    from vae_los_angeles_tpu.evaluation.hpo import main as hpo_main

    best_params, best_value = hpo_main(["--trials", "3", "--epochs", "3"], cfg=CFG)
    assert np.isfinite(best_value)
    assert (workspace / "best_hyperparameters.json").exists()
    assert (workspace / "checkpoints" / "best_multivae_optimized.npz").exists()


def test_hpo_vmapped_pruning(workspace, capsys):
    """Rung-based median pruning: with 2 rungs and one shape bucket, the
    worse half of the population is pruned at the rung boundary, pruned
    trials are excluded from best-trial selection, and the winner retrains."""
    from vae_los_angeles_tpu.evaluation.hpo import main as hpo_main

    best_params, best_value = hpo_main(
        ["--trials", "4", "--epochs", "4", "--prune-rungs", "2",
         "--bucket-size", "4", "--seed", "3"],
        cfg=CFG,
    )
    out = capsys.readouterr().out
    assert np.isfinite(best_value)
    assert "pruned" in out  # at least one trial pruned at the rung boundary
    assert "PRUNED@2" in out  # 4 epochs / 2 rungs → boundary after epoch 2
    # the reported best is a completed trial's value
    assert f"val_loss={best_value:.2f} [complete]" in out


def test_downstream_trimodal(workspace):
    """Tri-modal downstream task: 8 scenarios × StratifiedKFold deep-MLP."""
    from vae_los_angeles_tpu.evaluation.downstream import main as ds_main

    metrics = ds_main(cfg=CFG, n_folds=2)
    assert len(metrics) == 8
    assert "Orig. RNA + Orig. DNA" in metrics
    for name, report in metrics.items():
        assert 0.0 <= report["accuracy"] <= 1.0, name
        assert "accuracy_std" in report
    assert any(
        (workspace / "plots" / "downstream_task").glob("scenario_comparison_*.png")
    )
    assert any(
        (workspace / "plots" / "downstream_task").glob("per_tissue_f1_comparison_*.png")
    )


def test_hpo_synthetic_bootstrap(tmp_path, monkeypatch):
    """--synthetic bootstraps the full artifact set (same flag as the
    training CLIs) so HPO runs standalone in offline environments."""
    from vae_los_angeles_tpu.evaluation.hpo import main as hpo_main

    monkeypatch.chdir(tmp_path)
    best_params, best_value = hpo_main(
        ["--trials", "2", "--epochs", "2", "--synthetic"], cfg=CFG
    )
    assert np.isfinite(best_value)
    assert (tmp_path / "data" / "processed_data.pkl").exists()
    assert (tmp_path / "data" / "label_encoder.pkl").exists()
    assert (tmp_path / "best_hyperparameters.json").exists()
