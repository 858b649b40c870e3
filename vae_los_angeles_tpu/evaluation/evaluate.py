"""Evaluation entry point — recreates the reference's MISSING ``evaluate.py``.

The reference README (:36-38), run_pipeline.sh (:24,34) and
``downstream_task.py:18`` (`from evaluate import get_run_id,
load_model_and_data`) all depend on an evaluate.py that was never committed
(SURVEY integrity notes). Its contract, reconstructed from those call sites:

  * ``get_run_id()`` → latest tri-modal run id;
  * ``load_model_and_data()`` → (vae_model, val_data, run_id) with the model
    callable as ``model(a=..., b=..., site=...)``;
  * ``main()`` → cross-modal reconstruction on the shared validation split,
    metrics (MSE, MAE, cosine similarity, Pearson r) per direction, written
    to ``plots/evaluation_results.json`` (run_pipeline.sh:34).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalDataset, load_label_encoder
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.evaluation.loading import LoadedMultiModalVAE, load_multimodal
from vae_los_angeles_tpu.ops.metrics import compute_imputation_metrics
from vae_los_angeles_tpu.training import checkpoint


def get_run_id(model_name: str = "multivae") -> Optional[str]:
    """Latest run id via the run-id indirection file."""
    return checkpoint.get_run_id(model_name)


def load_val_split(cfg: Optional[Config] = None):
    """The canonical 80/20 validation split every consumer re-derives."""
    cfg = cfg or Config.from_env()
    dataset = MultiModalDataset.from_pickle(
        os.path.join(cfg.data_dir, "processed_data.pkl")
    )
    label_encoder = load_label_encoder(
        os.path.join(cfg.data_dir, "label_encoder.pkl")
    )
    tr_idx, va_idx = train_val_indices(
        len(dataset), cfg.train_test_split, cfg.random_seed
    )
    return dataset, label_encoder, tr_idx, va_idx


def load_model_and_data(cfg: Optional[Config] = None):
    """(model, val_data, run_id) — the contract downstream_task.py imports."""
    cfg = cfg or Config.from_env()
    dataset, label_encoder, tr_idx, va_idx = load_val_split(cfg)
    model = load_multimodal(cfg=cfg)
    if model is None:
        raise FileNotFoundError(
            "no trained MultiModalVAE checkpoint; run `python train.py` first"
        )
    val_data = (
        dataset.tpm_data[va_idx],
        dataset.beta_data[va_idx],
        dataset.primary_site[va_idx],
    )
    return model, val_data, model.run_id


def evaluate_model(
    model: LoadedMultiModalVAE, tpm: np.ndarray, beta: np.ndarray
) -> list:
    """Cross-modal reconstruction metrics in the reference's record format
    (MSE/MAE/cosine/Pearson, per README §Results)."""
    # estimated DNA from RNA alone (downstream_task.py:32 slot-2 convention)
    _, est_dna, _, _, _ = model(a=tpm)
    # estimated RNA from DNA alone (downstream_task.py:48 slot-1 convention)
    est_rna, _, _, _, _ = model(b=beta)
    records = [
        compute_imputation_metrics(beta, est_dna, "DNA methylation", "MultiModalVAE"),
        compute_imputation_metrics(tpm, est_rna, "RNA expression", "MultiModalVAE"),
    ]
    return records, est_dna, est_rna


def plot_reconstruction_examples(tpm, beta, est_rna, est_dna,
                                 plots_dir="plots", n_samples=3, seed=42):
    """Scatter plots of true-vs-reconstructed values for a few validation
    samples → ``plots/reconstruction_example_{i}.png`` (the artifact
    run_pipeline.sh:35 promises from the missing evaluate.py). Takes the
    reconstructions evaluate_model already computed (no repeat forward)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(tpm), size=min(n_samples, len(tpm)), replace=False)
    os.makedirs(plots_dir, exist_ok=True)
    for rank, i in enumerate(idx):
        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        for ax, truth, pred, name in (
            (axes[0], tpm[i], est_rna[i], "RNA (log1p TPM)"),
            (axes[1], beta[i], est_dna[i], "DNA (β-value)"),
        ):
            ax.scatter(truth, pred, s=3, alpha=0.4)
            lo, hi = float(min(truth.min(), pred.min())), float(
                max(truth.max(), pred.max())
            )
            ax.plot([lo, hi], [lo, hi], "r--", linewidth=1)
            ax.set_title(f"{name}: cross-modal reconstruction")
            ax.set_xlabel("true")
            ax.set_ylabel("reconstructed")
        fig.suptitle(f"Validation sample {i}")
        fig.tight_layout()
        path = os.path.join(plots_dir, f"reconstruction_example_{rank}.png")
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        print(f"Reconstruction example saved to {path}")


def plot_correlation_distributions(tpm, beta, est_rna, est_dna,
                                   plots_dir="plots"):
    """Per-sample Pearson-correlation histograms for both directions →
    ``plots/pearson_distributions.png`` (README §Results item 3:
    "Correlation distributions: Pearson correlation histograms")."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vae_los_angeles_tpu.ops.metrics import pearson_per_sample

    os.makedirs(plots_dir, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    for ax, truth, pred, name in (
        (axes[0], beta, est_dna, "DNA methylation (from RNA)"),
        (axes[1], tpm, est_rna, "RNA expression (from DNA)"),
    ):
        r, valid = pearson_per_sample(truth, pred)
        r = np.asarray(r)[np.asarray(valid)]
        ax.hist(r, bins=40, alpha=0.8, edgecolor="black", linewidth=0.3)
        if len(r):  # all-constant predictions → no valid correlations
            ax.axvline(float(r.mean()), color="red", linestyle="--",
                       label=f"mean {r.mean():.3f}")
            ax.legend()
        ax.set_title(f"Per-sample Pearson r: {name}")
        ax.set_xlabel("Pearson r")
        ax.set_ylabel("samples")
    fig.tight_layout()
    path = os.path.join(plots_dir, "pearson_distributions.png")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"Correlation distributions saved to {path}")


def main(cfg: Optional[Config] = None, output_path: Optional[str] = None):
    cfg = cfg or Config.from_env()
    model, (tpm, beta, site), run_id = load_model_and_data(cfg)
    print(f"Evaluating MultiModalVAE run {run_id} on {len(tpm)} validation samples")

    results, est_dna, est_rna = evaluate_model(model, tpm, beta)
    plot_reconstruction_examples(tpm, beta, est_rna, est_dna, cfg.plots_dir)
    plot_correlation_distributions(tpm, beta, est_rna, est_dna, cfg.plots_dir)
    for rec in results:
        print(
            f"  {rec['Modality']:>16s}: MSE={rec['MSE']:.4f} MAE={rec['MAE']:.4f} "
            f"Cosine={rec['CosineSimilarity']:.4f} Pearson r={rec['PearsonMean']:.4f}"
        )

    output_path = output_path or os.path.join(cfg.plots_dir, "evaluation_results.json")
    os.makedirs(os.path.dirname(output_path), exist_ok=True)
    with open(output_path, "w") as f:
        json.dump({"run_id": run_id, "results": results}, f, indent=2)
    print(f"Evaluation results saved to {output_path}")
    return results


if __name__ == "__main__":
    main()
