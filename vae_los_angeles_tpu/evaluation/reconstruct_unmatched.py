"""Imputation of missing modalities for the unmatched cohorts.

TPU-native counterpart of the reference's ``reconstruct_unmatched.py``
(333 LoC, SURVEY §3.5): RNA-only samples → DNA via RNA2DNAVAE (log1p applied
at inference, sites label-encoded, reference :119-125), DNA-only samples →
RNA via DNA2RNAVAE with ``site=None`` (reference :188-194). Writes
``data/{rna_with_reconstructed_dna,dna_with_reconstructed_rna}_{ts}.pkl``
plus a stats pickle, preserving the artifact contract consumed by
``clustering_evaluation/cluster_reconstructed.py``.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import load_label_encoder
from vae_los_angeles_tpu.evaluation.loading import load_dna2rna, load_rna2dna
from vae_los_angeles_tpu.training import checkpoint


def reconstruct_dna_from_rna(rna2dna_model, rna_df, label_encoder):
    print("\n" + "=" * 80)
    print("RECONSTRUCTING DNA FROM RNA-ONLY SAMPLES")
    print("=" * 80)
    print(f"Number of RNA-only samples: {len(rna_df)}")

    rna_data = np.array(rna_df["tpm_unstranded"].tolist()).astype(np.float32)
    rna_data = np.log1p(rna_data)  # normalize as in training (reference :122)
    site_labels = label_encoder.transform(rna_df["primary_site"])

    recon_dna, _, _ = rna2dna_model(rna=rna_data, site=site_labels)
    print(f"✓ Reconstructed DNA shape: {recon_dna.shape}")

    result_df = rna_df.copy()
    result_df["reconstructed_beta_value"] = list(recon_dna)
    result_df["primary_site_encoded"] = site_labels
    return result_df


def reconstruct_rna_from_dna(dna2rna_model, dna_df, label_encoder):
    print("\n" + "=" * 80)
    print("RECONSTRUCTING RNA FROM DNA-ONLY SAMPLES")
    print("=" * 80)
    print(f"Number of DNA-only samples: {len(dna_df)}")
    print("Note: DNA-only samples have no primary_site; using site=None...")

    dna_data = np.array(dna_df["beta_value"].tolist()).astype(np.float32)
    recon_rna, _, _ = dna2rna_model(dna=dna_data, site=None)
    print(f"✓ Reconstructed RNA shape: {recon_rna.shape}")

    result_df = dna_df.copy()
    result_df["reconstructed_tpm_unstranded"] = list(recon_rna)
    return result_df


def save_reconstruction_stats(rna_df, dna_df, run_timestamp, data_dir="data"):
    stats = {
        "timestamp": run_timestamp,
        "rna_only_samples": 0 if rna_df is None else len(rna_df),
        "dna_only_samples": 0 if dna_df is None else len(dna_df),
    }
    if rna_df is not None:
        stats["rna_only_primary_sites"] = rna_df["primary_site"].value_counts().to_dict()
    path = os.path.join(data_dir, f"reconstruction_stats_{run_timestamp}.pkl")
    with open(path, "wb") as f:
        pickle.dump(stats, f)
    print(f"\n✓ Reconstruction statistics saved to: {path}")


def main(cfg: Optional[Config] = None):
    import pandas as pd

    cfg = cfg or Config.from_env()
    run_timestamp = checkpoint.new_run_id()
    print("=" * 80)
    print("UNMATCHED DATA RECONSTRUCTION")
    print("=" * 80)

    label_encoder = load_label_encoder(os.path.join(cfg.data_dir, "label_encoder.pkl"))
    print(f"✓ Label encoder loaded ({len(label_encoder.classes_)} classes)")

    rna2dna_model = load_rna2dna(cfg=cfg)
    dna2rna_model = load_dna2rna(cfg=cfg)

    rna_only_path = os.path.join(cfg.data_dir, "rna_only_unmatched.pkl")
    dna_only_path = os.path.join(cfg.data_dir, "dna_only_unmatched.pkl")
    rna_reconstructed_df = dna_reconstructed_df = None

    if os.path.exists(rna_only_path) and rna2dna_model is not None:
        rna_only_df = pd.read_pickle(rna_only_path)
        # keep only sites known to the encoder (reference :256)
        n0 = len(rna_only_df)
        rna_only_df = rna_only_df[
            rna_only_df["primary_site"].isin(label_encoder.classes_)
        ]
        if len(rna_only_df) < n0:
            print(f"  Filtered out {n0 - len(rna_only_df)} unknown-site samples")
        if len(rna_only_df) > 0:
            rna_reconstructed_df = reconstruct_dna_from_rna(
                rna2dna_model, rna_only_df, label_encoder
            )
            out = os.path.join(
                cfg.data_dir, f"rna_with_reconstructed_dna_{run_timestamp}.pkl"
            )
            rna_reconstructed_df.to_pickle(out)
            print(f"✓ Saved reconstructed data to: {out}")
    elif not os.path.exists(rna_only_path):
        print(f"\n⚠ RNA-only data file not found: {rna_only_path}")

    if os.path.exists(dna_only_path) and dna2rna_model is not None:
        dna_only_df = pd.read_pickle(dna_only_path)
        if len(dna_only_df) > 0:
            dna_reconstructed_df = reconstruct_rna_from_dna(
                dna2rna_model, dna_only_df, label_encoder
            )
            out = os.path.join(
                cfg.data_dir, f"dna_with_reconstructed_rna_{run_timestamp}.pkl"
            )
            dna_reconstructed_df.to_pickle(out)
            print(f"✓ Saved reconstructed data to: {out}")
    elif not os.path.exists(dna_only_path):
        print(f"\n⚠ DNA-only data file not found: {dna_only_path}")

    if rna_reconstructed_df is not None or dna_reconstructed_df is not None:
        save_reconstruction_stats(
            rna_reconstructed_df, dna_reconstructed_df, run_timestamp, cfg.data_dir
        )
    print("\nReconstruction complete!")
    return rna_reconstructed_df, dna_reconstructed_df


if __name__ == "__main__":
    main()
