"""Synthetic multi-omics data with the exact processed-data schema.

Used by tests, the benchmark and any environment without Kaggle access
(this image has zero egress). Samples are generated from a shared per-site
latent factor so that cross-modal structure is real: a VAE that learns the
mapping genuinely beats the mean/kNN baselines, reproducing the reference's
"baselines as oracles" quality-control strategy (SURVEY §4).

Schema matches reference scripts/prepare_data.py:121-131:
  * tpm_unstranded — log1p'd non-negative RNA expression (list[float])
  * beta_value — methylation β in (0,1) (list[float])
  * primary_site / primary_site_encoded — top-24-style site labels
"""

from __future__ import annotations

import os
import pickle

import numpy as np

SITE_NAMES = [
    "Breast", "Lung", "Kidney", "Brain", "Colon", "Prostate", "Thyroid",
    "Stomach", "Liver", "Ovary", "Pancreas", "Skin", "Bladder", "Uterus",
    "Esophagus", "Cervix", "Testis", "Adrenal gland", "Bone", "Eye",
    "Larynx", "Pleura", "Thymus", "Bile duct",
]


def generate_synthetic_arrays(
    n_samples: int = 1024,
    dim_a: int = 1177,
    dim_b: int = 1211,
    n_sites: int = 24,
    latent_dim: int = 12,
    noise: float = 0.3,
    seed: int = 0,
):
    """Returns (tpm, beta, site) dense arrays with learnable cross-modal maps."""
    rng = np.random.default_rng(seed)
    site = rng.integers(0, n_sites, size=n_samples)
    # shared latent factor: site centroid + per-sample variation
    site_centroids = rng.normal(scale=2.0, size=(n_sites, latent_dim))
    z = site_centroids[site] + rng.normal(scale=1.0, size=(n_samples, latent_dim))
    # modality-specific linear maps
    w_a = rng.normal(scale=1.0 / np.sqrt(latent_dim), size=(latent_dim, dim_a))
    w_b = rng.normal(scale=1.0 / np.sqrt(latent_dim), size=(latent_dim, dim_b))
    # RNA: log1p of non-negative expression → softplus-ish positive values
    raw_a = z @ w_a + noise * rng.normal(size=(n_samples, dim_a))
    tpm = np.log1p(np.exp(np.clip(raw_a, -10, 10)) * 5.0).astype(np.float32)
    # DNA: β-values in (0,1)
    raw_b = z @ w_b + noise * rng.normal(size=(n_samples, dim_b))
    beta = (1.0 / (1.0 + np.exp(-raw_b))).astype(np.float32)
    beta = np.clip(beta, 1e-6, 1.0 - 1e-6)
    return tpm, beta, site.astype(np.int64)


def make_dataframe(tpm, beta, site, n_sites=None):
    import pandas as pd

    n_sites = n_sites or int(site.max()) + 1
    # sorted like LabelEncoder so primary_site and primary_site_encoded are
    # mutually consistent with make_label_encoder()
    names = sorted((SITE_NAMES * ((n_sites // len(SITE_NAMES)) + 1))[:n_sites])
    return pd.DataFrame(
        {
            "case_barcode": [f"SYN-{i:05d}" for i in range(len(site))],
            "tpm_unstranded": list(tpm.astype(np.float32)),
            "beta_value": list(beta.astype(np.float32)),
            "primary_site": [names[s] for s in site],
            "primary_site_encoded": site.astype(np.int64),
        }
    )


def make_label_encoder(n_sites: int = 24):
    from sklearn.preprocessing import LabelEncoder

    names = (SITE_NAMES * ((n_sites // len(SITE_NAMES)) + 1))[:n_sites]
    le = LabelEncoder()
    le.fit(sorted(names))
    return le


def write_synthetic_artifacts(
    data_dir: str = "data",
    n_samples: int = 1024,
    dim_a: int = 1177,
    dim_b: int = 1211,
    n_sites: int = 24,
    seed: int = 0,
    n_unmatched: int = 128,
):
    """Produce the full artifact set of scripts/prepare_data.py synthetically:
    processed_data.pkl, label_encoder.pkl, rna_only_unmatched.pkl,
    dna_only_unmatched.pkl, feature_names.pkl."""
    os.makedirs(data_dir, exist_ok=True)
    tpm, beta, site = generate_synthetic_arrays(
        n_samples + 2 * n_unmatched, dim_a, dim_b, n_sites, seed=seed
    )
    df_all = make_dataframe(tpm, beta, site, n_sites)

    matched = df_all.iloc[:n_samples].reset_index(drop=True)
    rna_only = (
        df_all.iloc[n_samples : n_samples + n_unmatched]
        .drop(columns=["beta_value"])
        .reset_index(drop=True)
    )
    dna_only = (
        df_all.iloc[n_samples + n_unmatched :]
        .drop(columns=["tpm_unstranded"])
        .reset_index(drop=True)
    )
    # unmatched RNA cohort ships raw (pre-log1p) TPM: the reconstruction path
    # applies log1p at inference (reference reconstruct_unmatched.py:119-122)
    rna_only["tpm_unstranded"] = [np.expm1(x) for x in rna_only["tpm_unstranded"]]

    matched.to_pickle(os.path.join(data_dir, "processed_data.pkl"))
    rna_only.to_pickle(os.path.join(data_dir, "rna_only_unmatched.pkl"))
    dna_only.to_pickle(os.path.join(data_dir, "dna_only_unmatched.pkl"))

    le = make_label_encoder(n_sites)
    with open(os.path.join(data_dir, "label_encoder.pkl"), "wb") as f:
        pickle.dump(le, f)

    # feature_names.pkl: expected by create_boxplots (reference
    # create_boxplots.py:17) but never produced by the reference — we emit it.
    feature_names = {
        "gene_names": [f"GENE_{i:04d}" for i in range(dim_a)],
        "probe_ids": [f"cg{i:08d}" for i in range(dim_b)],
    }
    with open(os.path.join(data_dir, "feature_names.pkl"), "wb") as f:
        pickle.dump(feature_names, f)

    return matched, le


def ensure_synthetic_artifacts(
    data_dir: str,
    target_pkl: str = None,
    dim_a: int = 1177,
    dim_b: int = 1211,
):
    """Bootstrap the prepare_data artifact set for offline runs — the
    `--synthetic` flag shared by the training and HPO CLIs.

    No-ops when ``target_pkl`` (default ``data_dir/processed_data.pkl``)
    already exists. Otherwise generates into a scratch dir and moves files
    WITHOUT overwriting: generating directly into ``data_dir`` would clobber
    real processed_data.pkl / label_encoder.pkl / unmatched pickles when only
    a custom ``target_pkl`` basename is missing. Returns True when artifacts
    were generated."""
    import shutil
    import tempfile

    target_pkl = target_pkl or os.path.join(data_dir, "processed_data.pkl")
    if os.path.exists(target_pkl):
        return False
    print("Generating synthetic data artifacts...")
    os.makedirs(data_dir, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=".synthetic_", dir=data_dir)
    try:
        write_synthetic_artifacts(staging, dim_a=dim_a, dim_b=dim_b)
        # the requested pickle is known-missing (checked above)
        os.replace(os.path.join(staging, "processed_data.pkl"), target_pkl)
        for name in sorted(os.listdir(staging)):
            dest = os.path.join(data_dir, name)
            if not os.path.exists(dest):
                os.replace(os.path.join(staging, name), dest)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return True
