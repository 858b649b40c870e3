"""Standalone DNA-methylation pre-preparation (reference
``scripts/prepare_dna.py``, 70 LoC).

Concatenates the parquet shards of a third Kaggle dataset, dedups on
(case_barcode, probe_id), builds the complete patient×probe matrix,
per-patient mean-imputes missing β-values and writes
``data/dna_methylation_imputed.parquet``. The transformation is a pure
function (`build_imputed_matrix`) so it is testable offline.
"""

from __future__ import annotations

import argparse
import os

DNA_PREP_DATASET = "martininf1n1ty/dna-metylation-onkodb"


def load_parquet_shards(dataset_path: str):
    import pandas as pd

    frames = []
    for root, _dirs, files in os.walk(dataset_path):
        for file in files:
            if file == "filtered_data.parquet" or not file.endswith(".parquet"):
                continue
            try:
                frames.append(pd.read_parquet(os.path.join(root, file)))
                print(f"Loaded {file} successfully.")
            except Exception as e:
                print(f"Error loading {file}: {e}")
    import pandas as pd

    return pd.concat(frames, ignore_index=True)


def build_imputed_matrix(combined_df):
    """Dedup → complete patient×probe grid → per-patient mean imputation
    (reference :33-65)."""
    from itertools import product

    import pandas as pd

    combined_df = combined_df.drop_duplicates(
        subset=["case_barcode", "probe_id"], keep="first"
    )
    unique_patients = combined_df["case_barcode"].unique()
    unique_probes = combined_df["probe_id"].unique()
    complete_index = pd.DataFrame(
        list(product(unique_patients, unique_probes)),
        columns=["case_barcode", "probe_id"],
    )
    combined_df = complete_index.merge(
        combined_df, on=["case_barcode", "probe_id"], how="left"
    )
    combined_df["beta_value"] = combined_df.groupby("case_barcode")[
        "beta_value"
    ].transform(lambda x: x.fillna(x.mean()))
    return combined_df


def main(argv=None):
    parser = argparse.ArgumentParser(description="Prepare DNA methylation matrix")
    parser.add_argument("--output", default="data/dna_methylation_imputed.parquet")
    args = parser.parse_args(argv)
    try:
        import kagglehub

        dna_path = kagglehub.dataset_download(DNA_PREP_DATASET)
    except Exception as e:
        raise SystemExit(
            f"Kaggle download failed ({e}); this step requires network access."
        )
    combined_df = load_parquet_shards(dna_path)
    print(f"Shape before processing: {combined_df.shape}")
    combined_df = build_imputed_matrix(combined_df)
    print(f"Final shape: {combined_df.shape}")
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    combined_df.to_parquet(args.output)
    print(f"Saved to {args.output}")


if __name__ == "__main__":
    main()
