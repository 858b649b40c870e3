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

    if not frames:
        # a typo'd --input-dir walks nothing (os.walk on a missing path is
        # silent) and pd.concat([]) raises an opaque ValueError
        raise SystemExit(f"no parquet shards found under {dataset_path!r}")
    return pd.concat(frames, ignore_index=True)


def build_imputed_matrix(combined_df, engine: str = "auto"):
    """Dedup → complete patient×probe grid → per-patient mean imputation
    (reference :33-65).

    ``engine``: "pandas" is a faithful transcription of the reference's
    formulation; "native" runs the same transform through the C++ kernel in
    ``data/_native/pivot_impute.cpp`` — one pass over factorized arrays
    instead of an O(patients·probes) cross-product of Python tuples, which
    is what makes whole-methylome-scale (~450k probes) prep tractable.
    "auto" uses native when the input is the pure (case_barcode, probe_id,
    beta_value) schema and a toolchain is available, else pandas. Both paths
    are equivalence-tested (tests/test_prepare_data.py)."""
    if engine not in ("auto", "native", "pandas"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine != "pandas":
        out = _build_imputed_matrix_native(combined_df)
        if out is not None:
            return out
        if engine == "native":
            raise RuntimeError(
                "native pivot_impute unavailable (no C++ toolchain, or the "
                "input carries extra columns the native path does not "
                "reproduce) — use engine='pandas'"
            )
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


def _build_imputed_matrix_native(combined_df):
    """C++ path of `build_imputed_matrix`: same dedup/grid/imputation
    semantics, same row order (patients × probes in first-occurrence order,
    exactly like the pandas path's `product(unique(...), unique(...))`).
    Returns None when inapplicable so callers fall back."""
    import numpy as np
    import pandas as pd

    if list(combined_df.columns) != ["case_barcode", "probe_id", "beta_value"]:
        # extra columns ride through the pandas merge; the dense-matrix path
        # would silently drop them — let the reference formulation handle it
        return None
    from vae_los_angeles_tpu.utils.native import load_pivot_impute

    fn = load_pivot_impute()
    if fn is None:
        return None

    import ctypes

    pat_codes, patients = pd.factorize(combined_df["case_barcode"])
    probe_codes, probes = pd.factorize(combined_df["probe_id"])
    if (pat_codes < 0).any() or (probe_codes < 0).any():
        # factorize maps null keys to code -1; the pandas path groups NaN
        # keys fine, so fall back rather than reject
        return None
    beta_dtype = combined_df["beta_value"].to_numpy().dtype
    beta = np.ascontiguousarray(
        combined_df["beta_value"].to_numpy(), dtype=np.float64
    )
    pat_codes = np.ascontiguousarray(pat_codes, dtype=np.int32)
    probe_codes = np.ascontiguousarray(probe_codes, dtype=np.int32)
    P, K = len(patients), len(probes)
    out = np.empty((P, K), dtype=np.float64)
    rc = fn(
        pat_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        probe_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        beta.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(beta),
        P,
        K,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"pivot_impute failed with code {rc}")
    # pre-typed Series skip pandas' per-element object inference, which
    # costs ~30 s alone on a 27M-row grid (measured); with dtype pinned the
    # frame assembles in O(1). All three columns preserve the INPUT dtypes
    # (incl. parquet-sourced StringDtype keys) so the written parquet schema
    # does not depend on whether a C++ toolchain was present.
    return pd.DataFrame(
        {
            "case_barcode": pd.Series(
                np.repeat(np.asarray(patients, dtype=object), K),
                dtype=object, copy=False,
            ).astype(combined_df["case_barcode"].dtype, copy=False),
            "probe_id": pd.Series(
                np.tile(np.asarray(probes, dtype=object), P),
                dtype=object, copy=False,
            ).astype(combined_df["probe_id"].dtype, copy=False),
            "beta_value": pd.Series(out.ravel().astype(beta_dtype, copy=False)),
        },
        copy=False,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description="Prepare DNA methylation matrix")
    parser.add_argument("--output", default="data/dna_methylation_imputed.parquet")
    parser.add_argument(
        "--input-dir", default=None,
        help="local directory of parquet shards (skips the Kaggle download)",
    )
    parser.add_argument(
        "--verify-ingest", nargs="?", const="builtin", default=None,
        metavar="MANIFEST.json",
        help="validate the concatenated shards against the recorded ingest "
        "manifest (data/ingest_manifest.py) and exit — no processing",
    )
    args = parser.parse_args(argv)
    if args.input_dir:
        dna_path = args.input_dir
    else:
        try:
            import kagglehub

            dna_path = kagglehub.dataset_download(DNA_PREP_DATASET)
        except Exception as e:
            raise SystemExit(
                f"Kaggle download failed ({e}); this step requires network "
                "access (or a local mirror via --input-dir)."
            )
    combined_df = load_parquet_shards(dna_path)
    print(f"Shape before processing: {combined_df.shape}")

    from vae_los_angeles_tpu.data import ingest_manifest

    manifest = (
        ingest_manifest.load_manifest(args.verify_ingest)
        if args.verify_ingest and args.verify_ingest != "builtin"
        else None
    )
    ok = ingest_manifest.report({"dna_prep_shards": combined_df}, manifest)
    if args.verify_ingest:
        raise SystemExit(0 if ok else 2)
    if not ok:
        raise SystemExit(
            "shard schema does not match the recorded ingest manifest "
            "(issues above)"
        )
    combined_df = build_imputed_matrix(combined_df)
    print(f"Final shape: {combined_df.shape}")
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    combined_df.to_parquet(args.output)
    print(f"Saved to {args.output}")


if __name__ == "__main__":
    main()
